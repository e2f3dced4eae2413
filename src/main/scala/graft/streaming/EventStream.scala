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
}
