package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming event-time aggregations — the Structured Streaming face of
  * graft.operators.EventWindows. The batch operators and these share window
  * semantics; only the source (readStream) and the watermark differ.
  *
  * Watermarks bound the aggregation state: with `withWatermark(ts, W)` the
  * engine drops per-window state once the event-time high-water mark passes
  * window_end + W, so state size tracks the number of OPEN windows (hours ×
  * event types, users with live sessions) rather than the stream length —
  * the property that keeps this runnable forever on an unbounded stream.
  */
object EventStream {

  private def decSum(c: Column): Column =
    graft.DecimalEdge.dbl(sum(c.cast(DecimalType(18, 6))), 6)

  /** Tumbling window × event_type counts with late-data tolerance
    * `watermark`. Input needs (ts TIMESTAMP, event_type STRING, value
    * DOUBLE) — e.g. a Kafka/file readStream of the events schema.
    */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding windows (windowLen long, sliding every slide): each event
    * enters windowLen/slide window instances BEFORE the partial agg — the
    * standard Spark expansion; watermark-bounded state as with tumbling.
    */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide).as("w"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"),
        col("n_events"), col("sum_value"))

  /** Per-user session windows (gap-based) with watermark-bounded state. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Streaming exact dedup on a key: state holds every key seen, duplicates
    * in LATER micro-batches are suppressed — the reference's at-least-once +
    * idempotent-sink pattern (T6) as engine state instead of sink state.
    * This unbounded form keeps one state row per distinct key forever; on an
    * unbounded 100 TB stream swap in `dropDuplicatesWithinWatermark(keys)`
    * after `withWatermark` so state expires once the key can no longer
    * recur — same query shape, bounded state.
    */
  def dedupByKey(events: DataFrame, keys: Seq[String]): DataFrame =
    events.dropDuplicates(keys)

  /** BOUNDED-state streaming dedup — the 100 TB form of [[dedupByKey]]:
    * `withWatermark` + `dropDuplicatesWithinWatermark` keeps a key's state
    * only until the watermark passes its event time + delay, so state
    * tracks the last `delay` of stream time instead of every key ever
    * seen. The contract shifts accordingly: duplicates are suppressed only
    * when they arrive within `delay` of the original (at-least-once
    * re-delivery is prompt — Kafka redelivers in seconds, not days — so
    * this is the semantics production dedup actually wants). `tsCol` must
    * be the event-time column the duplicates share.
    */
  def dedupByKeyBounded(events: DataFrame, keys: Seq[String], tsCol: String,
                        delay: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)

  /** STREAM-STATIC join — enrich each micro-batch with a BATCH dimension.
    * Stateless by construction: the static side is a plan subtree, not
    * stream state — the engine re-executes (or reuses the broadcast of)
    * the dimension per micro-batch, nothing is buffered, no watermark is
    * involved. The 100 TB enrichment shape: a broadcast dimension makes
    * the join map-side within every micro-batch; a growing dimension
    * would instead be a shuffled join per batch (or a slowly-refreshed
    * snapshot table). Append-mode output: enriched rows emit on arrival.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    key: String): DataFrame =
    events.join(broadcast(dim), Seq(key))

  /** STREAM-STREAM inner join with event-time range correlation — the
    * view→click attribution shape: for each view event, the click events
    * of the SAME user within `maxDelay` after it. Both sides are streaming
    * (here: two filters of one source — a streaming self-join), so the
    * engine buffers BOTH sides in state; the watermarks plus the two-sided
    * time bound on the join condition are what let it evict: a buffered
    * view can stop waiting once the click-side watermark passes
    * view_ts + maxDelay, and a buffered click once the view-side watermark
    * passes click_ts. Without the interval condition the state is the
    * whole stream — the unbounded-join trap; with it, state tracks the
    * last `maxDelay + watermark` of data regardless of stream length.
    * Inner join, so matches emit as soon as both rows have arrived (no
    * watermark wait on OUTPUT, unlike outer stream-stream joins).
    */
  def viewClickJoin(events: DataFrame, maxDelay: String = "2 hours",
                    watermark: String = "10 minutes"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    views.join(clicks,
        col("user_id") === col("click_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr(s"INTERVAL $maxDelay"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Arbitrary stateful processing via flatMapGroupsWithState — the §2i
    * custom-state API (KeyValueGroupedDataset) the built-in windows can't
    * express: per user, a running event count carried across micro-batches,
    * one (user, version, n_so_far) row emitted per batch the user appears
    * in. Only COUNTS live in state — order-insensitive within a batch, so
    * the output is deterministic for a deterministic batch split. State is
    * one (int, long) pair per live user; at 100 TB add a GroupStateTimeout
    * so idle users expire instead of accumulating.
    */
  def runningUserCounts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("user_id").as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[(Int, Long), (Long, Int, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[(Int, Long)]) =>
          val (v0, n0) = state.getOption.getOrElse((0, 0L))
          val n = n0 + rows.size
          val v = v0 + 1
          state.update((v, n))
          Iterator((user, v, n))
      }
      .toDF("user_id", "version", "n_so_far")
  }

  /** CDC APPLY as CONTINUOUSLY-MAINTAINED streaming state — the
    * streaming MERGE (X126): change rows arrive as files, and a per-key
    * `transformWithState` ValueState carries the fold's COMPLETE
    * sufficient statistic, the current winning (seq, op, payload) triple
    * (highest-sequence-wins is associative/idempotent over that triple,
    * so per-micro-batch folding composes to the batch fold exactly). A
    * key emits its current winner whenever it improves; emissions are
    * strictly monotone in seq per key, so the max-seq emission per key
    * in the append sink IS the final winner — deletes stay DATA ('D'
    * rows) all the way to the report, which drops them, exactly like the
    * batch gate. */
  def cdcApplyTws(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val s = rows.sparkSession
    import s.implicits._
    rows.selectExpr("k", "prio", "seq", "op")
      .as[(Long, String, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new CdcProcessor, TimeMode.None(),
        OutputMode.Append())
      .toDF("k", "seq", "op", "prio")
  }

  /** The [[cdcApplyTws]] processor: ValueState = the winning (seq, op,
    * prio). Top-level so the serialized processor captures no enclosing
    * scope. */
  private class CdcProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String, Long, String), (Long, Long, String, String)] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var st: ValueState[(Long, String, String)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("cdc",
        Encoders.product[(Long, String, String)], TTLConfig.NONE)
    override def handleInputRows(k: Long,
        rows: Iterator[(Long, String, Long, String)],
        tv: TimerValues): Iterator[(Long, Long, String, String)] = {
      var cur =
        if (st.exists()) st.get() else (Long.MinValue, null: String, null: String)
      var improved = false
      rows.foreach { case (_, prio, seq, op) =>
        if (seq > cur._1) { cur = (seq, op, prio); improved = true }
      }
      if (improved) {
        st.update(cur)
        Iterator.single((k, cur._1, cur._2, cur._3))
      } else Iterator.empty
    }
  }

  /** [[runningUserCounts]] re-expressed on `transformWithState` — Spark
    * 4's arbitrary-stateful successor to flatMapGroupsWithState, and the
    * API a new 100 TB pipeline should target: state lives in NAMED, typed
    * handles (`ValueState`/`ListState`/`MapState`, each independently
    * TTL-able) instead of one opaque per-key blob, so a processor can
    * evolve its state layout, expire pieces separately, and back it all
    * with RocksDB (mandatory for this operator — exactly what unbounded
    * key spaces need: state spills to disk instead of living on the JVM
    * heap). Same semantics as the fMGWS form, same oracle — the gate pins
    * that migrating the API does not move a single output row.
    */
  def runningUserCountsTws(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("user_id").as[Long]
      .groupByKey(identity)
      .transformWithState(new RunningCountsProcessor, TimeMode.None(),
        OutputMode.Append())
      .toDF("user_id", "version", "n_so_far")
  }

  /** The [[runningUserCountsTws]] processor: one ValueState[(version,
    * count)] per user. Top-level (not method-local) so the serialized
    * processor captures no enclosing scope.
    */
  private class RunningCountsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Long, (Long, Int, Long)] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var st: ValueState[(Int, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("counts",
        Encoders.product[(Int, Long)], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[Long],
        tv: TimerValues): Iterator[(Long, Int, Long)] = {
      val (v0, n0) = if (st.exists()) st.get() else (0, 0L)
      val n = n0 + rows.size
      val v = v0 + 1
      st.update((v, n))
      Iterator.single((user, v, n))
    }
  }

  /** The batch funnel fold run as CONTINUOUSLY-MAINTAINED streaming state
    * (X117) — the reason the greedy earliest-match funnel
    * ([[graft.operators.EventWindows.eventFunnel]]) incrementalizes
    * perfectly: its accumulator (step, last_match_time) is the COMPLETE
    * sufficient statistic of the fold, so a per-user ValueState carrying
    * exactly that pair advances micro-batch by micro-batch and lands on
    * the identical reach the one-shot batch fold computes — provided
    * events arrive per-user time-ordered ACROSS batches (the fixture is
    * the time-split two-batch form; within a batch the processor sorts by
    * the batch fold's (t, type) key, so the concatenation is the fully
    * sorted sequence). Emits the user's current reach each batch; reach
    * is monotone, so the gate's max-per-user is the final state.
    */
  def funnelReachTws(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val s = events.sparkSession
    import s.implicits._
    events
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS t",
        "event_type")
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new FunnelProcessor, TimeMode.None(),
        OutputMode.Append())
      .toDF("user_id", "reach")
  }

  /** The [[funnelReachTws]] processor: ValueState = (step, last-match
    * micros), the greedy fold's accumulator. Top-level so the serialized
    * processor captures no enclosing scope. */
  private class FunnelProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, String), (Long, Int)] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    private val Steps = Array("signup", "view", "click", "purchase")
    @transient private var st: ValueState[(Int, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("funnel",
        Encoders.product[(Int, Long)], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, String)],
        tv: TimerValues): Iterator[(Long, Int)] = {
      var (step, last) = if (st.exists()) st.get() else (0, Long.MinValue)
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, t, et) =>
        if (step < Steps.length && t > last && et == Steps(step)) {
          step += 1; last = t
        }
      }
      st.update((step, last))
      Iterator.single((user, step))
    }
  }

  /** [[runningUserCountsTws]] with PER-STATE TTL — the expiry story that
    * makes transformWithState's named handles worth having: the TTL is
    * declared ON the state handle (`TTLConfig`), not hand-rolled with
    * timers, and each named handle in a processor can carry a DIFFERENT
    * TTL (counts kept an hour, a session blob kept a day) — the
    * per-piece expiry fMGWS's single opaque blob cannot express.
    * Requires `TimeMode.ProcessingTime`; expiry is lazy — an expired
    * value simply stops being returned at the next read, so a returning
    * user restarts at version 1 (same trade as the fMGWS timeout form,
    * minus the timer callback). At 100 TB this is how live state tracks
    * ACTIVE keys under an unbounded key space without hand-rolled timer
    * traffic. Run it with a periodic trigger for the same reason as the
    * timeout form below: under ProcessingTime the engine always has
    * "another batch" to run, so the default trigger busy-loops and
    * `processAllAvailable` never returns.
    */
  def runningUserCountsTwsTtl(events: DataFrame,
                              ttlMillis: Long = 2000L): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("user_id").as[Long]
      .groupByKey(identity)
      .transformWithState(new RunningCountsTtlProcessor(ttlMillis),
        TimeMode.ProcessingTime(), OutputMode.Append())
      .toDF("user_id", "version", "n_so_far")
  }

  /** The [[runningUserCountsTwsTtl]] processor: identical logic to
    * [[RunningCountsProcessor]], but the ValueState carries a TTL — the
    * handle declaration IS the whole expiry implementation.
    */
  private class RunningCountsTtlProcessor(ttlMillis: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Long, (Long, Int, Long)] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var st: ValueState[(Int, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("counts",
        Encoders.product[(Int, Long)],
        TTLConfig(java.time.Duration.ofMillis(ttlMillis)))
    override def handleInputRows(user: Long, rows: Iterator[Long],
        tv: TimerValues): Iterator[(Long, Int, Long)] = {
      val (v0, n0) = if (st.exists()) st.get() else (0, 0L)
      val n = n0 + rows.size
      val v = v0 + 1
      st.update((v, n))
      Iterator.single((user, v, n))
    }
  }

  /** [[runningUserCounts]] with STATE EXPIRY — the 100 TB form: a
    * processing-time timeout evicts a user's state after `idleFor` without
    * new events, so live state tracks ACTIVE users, not every user ever
    * seen. On eviction the count genuinely restarts (a returning user
    * emits version 1 again) — the trade the timeout buys; callers that
    * need exact lifetime counts keep the unbounded form and pay its state.
    * Timeout callbacks arrive as an (empty-iterator, hasTimedOut) group
    * invocation on the first micro-batch after the deadline; emitting
    * nothing there keeps the output schema identical to the unbounded op.
    * Run it with a periodic trigger: under ProcessingTimeTimeout the engine
    * always has "another batch" to run (a timeout may fire at any wall-
    * clock moment), so the default as-fast-as-possible trigger busy-loops
    * idle micro-batches and `processAllAvailable` never returns.
    */
  def runningUserCountsExpiring(events: DataFrame,
                                idleFor: String = "30 seconds"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = events.sparkSession
    import s.implicits._
    events.selectExpr("user_id").as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[(Int, Long), (Long, Int, Long)](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[(Int, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (v0, n0) = state.getOption.getOrElse((0, 0L))
            val n = n0 + rows.size
            val v = v0 + 1
            state.update((v, n))
            state.setTimeoutDuration(idleFor)
            Iterator((user, v, n))
          }
      }
      .toDF("user_id", "version", "n_so_far")
  }
}
