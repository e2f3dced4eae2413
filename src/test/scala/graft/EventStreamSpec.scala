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
}
