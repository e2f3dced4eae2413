package graft

import java.sql.Timestamp

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming window semantics over an in-memory stream: windows aggregate
  * across micro-batches; the watermark admits in-order progress.
  */
class EventStreamSpec extends SparkSpec {

  import spark.implicits._

  /** Epoch-based minute timestamps (TZ-free; session TZ is UTC). */
  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("tumbling streaming aggregation accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val query = EventStream.tumblingCounts(events, windowLen = "1 hour")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      input.addData((ts(5), "click", 1.0), (ts(10), "click", 2.0))
      query.processAllAvailable()
      input.addData((ts(20), "click", 3.0), (ts(70), "view", 4.0))
      query.processAllAvailable()

      val rows = spark.table("tumbling_out")
        .orderBy("window_start", "event_type").collect()
      assert(rows.map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSeq ==
        Seq(("click", 3L, 6.0), ("view", 1L, 4.0)))
    } finally query.stop()
  }

  test("stream-stream join matches across micro-batches, bounds the interval") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "user_id", "ts", "event_type")

    val query = EventStream.viewClickJoin(events, maxDelay = "2 hours")
      .writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    try {
      // minute offsets start at 1000, NOT 0: the initial watermark is the
      // epoch, and stream-stream join INPUT rows with event time <= the
      // current watermark are dropped as late — a row at exactly ts(0)
      // silently vanishes before it can buffer
      val b = 1000
      // batch 1: a view and a same-batch click for user 10; a click for
      // user 20 with no view anywhere
      input.addData((1L, 10L, ts(b), "view"), (2L, 10L, ts(b + 10), "click"),
        (9L, 20L, ts(b + 5), "click"))
      query.processAllAvailable()
      // batch 2: a click that must match batch 1's BUFFERED view through
      // join state (cross-batch), and one past the 2-hour bound
      input.addData((3L, 10L, ts(b + 30), "click"), (4L, 10L, ts(b + 200), "click"))
      query.processAllAvailable()

      val got = spark.table("ssjoin_out")
        .select("user_id", "view_id", "click_id")
        .orderBy("view_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq((10L, 1L, 2L), (10L, 1L, 3L)))
    } finally query.stop()
  }

  test("bounded dedup suppresses in-horizon duplicates, frees state beyond it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("event_id", "ts")

    val query = EventStream.dedupByKeyBounded(events, Seq("event_id"), "ts",
        delay = "1 hour")
      .writeStream.format("memory").queryName("dedup_bounded_out")
      .outputMode("append").start()
    try {
      // start at minute 1000: the initial watermark is the epoch and rows
      // at/below it would be dropped as late (cf. the ssjoin test)
      val b = 1000
      input.addData((1L, ts(b)), (2L, ts(b + 10)))
      query.processAllAvailable()
      // watermark = b+10 − 60: the id-1 replay at ts(b) is above it and
      // inside the horizon → suppressed via cross-batch STATE
      input.addData((1L, ts(b)), (3L, ts(b + 20)))
      query.processAllAvailable()
      // advance the watermark past b+60 so id 1's state expires...
      input.addData((4L, ts(b + 300)))
      query.processAllAvailable()
      // ...then id 1 recurs above the new watermark (b+240): state is gone,
      // so it RE-EMITS — the bounded-state trade the unbounded form never
      // makes (dropDuplicates would still be holding id 1)
      input.addData((1L, ts(b + 250)))
      query.processAllAvailable()

      val got = spark.table("dedup_bounded_out")
        .orderBy("ts", "event_id")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
      assert(got == Seq((1L, ts(b)), (2L, ts(b + 10)), (3L, ts(b + 20)),
        (4L, ts(b + 300)), (1L, ts(b + 250))).sortBy(p => (p._2.getTime, p._1)))
    } finally query.stop()
  }

  test("bounded content dedup: in-horizon recrawl suppressed by state, beyond-horizon re-admitted") {
    // the q_stream_corpus_ingest_bounded lifecycle: dedup keys on the
    // content DIGEST (fresh doc_id every recrawl — key dedup can't help),
    // state expires with the crawl-time watermark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "crawl_ts")
    val query = EventStream.dedupByKeyBounded(
        docs.withColumn("text_hash", md5(col("text"))),
        Seq("text_hash"), "crawl_ts", delay = "1 hour")
      .writeStream.format("memory").queryName("ingest_bounded_out")
      .outputMode("append").start()
    try {
      val b = 1000
      input.addData((1L, "aaa", ts(b)), (2L, "bbb", ts(b + 10)))
      query.processAllAvailable()
      // recrawl of "aaa" under a NEW id, above the watermark (b−50) and
      // inside the horizon → suppressed via cross-batch content state;
      // "ccc" is genuinely new
      input.addData((3L, "aaa", ts(b + 5)), (4L, "ccc", ts(b + 20)))
      query.processAllAvailable()
      // push the watermark past b+60: "aaa"'s digest state expires
      input.addData((5L, "ddd", ts(b + 300)))
      query.processAllAvailable()
      // the same content recurs beyond the horizon: state is gone, so it
      // RE-ADMITS — the bounded-state trade (the unbounded ingest gate
      // would still be holding the digest)
      input.addData((6L, "aaa", ts(b + 250)))
      query.processAllAvailable()

      val admitted = spark.table("ingest_bounded_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(admitted == Set(1L, 2L, 4L, 5L, 6L))
    } finally query.stop()
  }

  test("processing-time timeout evicts idle user state; the count restarts") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.Trigger
    val input = MemoryStream[Long]
    val events = input.toDF().toDF("user_id")

    // processAllAvailable CANNOT be used here: with ProcessingTimeTimeout
    // the engine always has "another batch" to run (a timeout may fire at
    // any wall-clock moment), so the no-new-data signal it waits on never
    // comes. Poll the sink to a deadline instead; a periodic trigger keeps
    // the idle-batch churn bounded.
    val query = EventStream.runningUserCountsExpiring(events, idleFor = "2 seconds")
      .writeStream.format("memory").queryName("expiring_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    def rows(): Seq[(Long, Int, Long)] = spark.table("expiring_out")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    def waitForRows(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (rows().size < n) {
        query.exception.foreach(e => fail(s"query died: $e"))
        assert(System.currentTimeMillis() < deadline,
          s"timed out waiting for $n sink rows, have ${rows()}")
        Thread.sleep(100)
      }
    }
    try {
      input.addData(7L, 7L)
      waitForRows(1)
      // let user 7's deadline pass; a trigger fires the timed-out-group
      // callback, which must remove the state silently (no output row)
      Thread.sleep(2500)
      input.addData(8L)
      // once 8's row is sunk, 7's eviction is committed too: the batch that
      // carried 8's data fires pending timeouts for data-less keys in the
      // same commit (or an earlier idle batch already had)
      waitForRows(2)
      // user 7 returns: state was evicted, so version AND count restart
      input.addData(7L)
      waitForRows(3)

      val got = rows()
      // without the timeout user 7's return row would be (7, 2, 3); the
      // two (7, 1, _) rows share a sort key, so compare as a multiset
      assert(got.size == 3)
      assert(got.toSet == Set((7L, 1, 2L), (7L, 1, 1L), (8L, 1, 1L)))
    } finally query.stop()
  }

  test("transformWithState ValueState TTL expires a key's state between batches") {
    // The TWS analog of the processing-time-timeout test above: the TTL is
    // declared ON the state handle (TTLConfig), no timers. Under
    // TimeMode.ProcessingTime the engine — exactly like the fMGWS
    // ProcessingTimeTimeout case — always has "another batch" to run, so
    // processAllAvailable never settles and the default trigger busy-loops
    // (observed: 3000+ micro-batch versions in seconds). Periodic trigger
    // + sink polling, as above. RocksDB provider scoped-and-restored:
    // transformWithState requires it.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.Trigger
    val input = MemoryStream[Long]
    val events = input.toDF().toDF("user_id")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val query = EventStream.runningUserCountsTwsTtl(events, ttlMillis = 3000L)
      .writeStream.format("memory").queryName("tws_ttl_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    def rows(): Seq[(Long, Int, Long)] = spark.table("tws_ttl_out")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    def waitForRows(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (rows().size < n) {
        query.exception.foreach(e => fail(s"query died: $e"))
        assert(System.currentTimeMillis() < deadline,
          s"timed out waiting for $n sink rows, have ${rows()}")
        Thread.sleep(100)
      }
    }
    try {
      input.addData(7L, 7L)
      waitForRows(1)
      // within the TTL the state survives: version increments
      input.addData(7L)
      waitForRows(2)
      // let the TTL lapse with margin, then the key returns: the handle
      // reads expired → version AND count restart at 1
      Thread.sleep(6000)
      input.addData(7L)
      waitForRows(3)

      val got = rows()
      // without TTL the last row would be (7, 3, 4)
      assert(got.size == 3)
      assert(got.toSet == Set((7L, 1, 2L), (7L, 2, 3L), (7L, 1, 1L)),
        s"got $got")
    } finally {
      query.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("session streaming windows merge within the gap, split beyond it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
      .withColumn("value", lit(1.0))

    val query = EventStream.sessionCounts(events, gap = "30 minutes")
      .writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    try {
      input.addData((ts(0), 1L), (ts(20), 1L), (ts(90), 1L), (ts(0), 2L))
      query.processAllAvailable()
      val rows = spark.table("session_out")
        .orderBy("user_id", "session_start").collect()
      // user 1: [0,20] merge (gap 30), 90 splits; user 2: singleton
      assert(rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
        .toSeq == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally query.stop()
  }

  test("streaming CDC fold: late lower-seq rows are no-ops; deletes win across batches") {
    // the at-least-once/out-of-order tolerance of the streaming MERGE: a
    // change feed may replay or reorder, and a LATE lower-seq row must
    // neither regress the state nor re-emit — the winner is monotone in
    // seq. RocksDB provider scoped-and-restored (transformWithState
    // requires it).
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, String)]
    val rows = input.toDF().toDF("k", "prio", "seq", "op")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val query = EventStream.cdcApplyTws(rows)
      .writeStream.format("memory").queryName("cdc_tws_out")
      .outputMode("append").start()
    try {
      input.addData((1L, "A", 2L, "U"), (2L, "B", 1L, "I"))
      query.processAllAvailable()
      // batch 2: key 1 sees a LATE lower-seq insert (must be a silent
      // no-op), key 2 a delete that must beat its batch-1 insert
      input.addData((1L, "stale", 1L, "I"),
        (2L, null.asInstanceOf[String], 3L, "D"))
      query.processAllAvailable()
      val got = spark.table("cdc_tws_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getString(3))).toSeq
      assert(got.count(_._1 == 1L) == 1,
        s"the late row must not re-emit: $got")
      assert(got.filter(_._1 == 1L).head == ((1L, 2L, "U", "A")))
      val k2 = got.filter(_._1 == 2L)
      assert(k2.map(_._2).sorted == Seq(1L, 3L), s"$k2")
      assert(k2.maxBy(_._2)._3 == "D", "the delete must win")
    } finally {
      query.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
