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
}
