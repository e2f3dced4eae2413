package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** The schema-adaptive ts helpers — in particular the LONG (raw-ns) arm,
  * which the current µs testdata no longer exercises through the gates.
  */
class TablesSpec extends SparkSpec {

  import spark.implicits._

  test("tsAsMicros on raw-ns LONG is exact at ns-epoch magnitude") {
    // 2^53-scale hazard: double division of 1.7e18 rounds by ~±128 ns.
    // The decimal path must truncate exactly — including values 1 ns
    // either side of a µs boundary.
    val ns = Seq(
      1704067207179575123L, // arbitrary non-aligned ns instant
      1704067207179575999L, // just below the next µs
      1704067207179576000L, // exactly on a µs boundary
      1704067207179576001L) // just above it
    val out = ns.toDF("ts")
      .select(Tables.tsAsMicros(col("ts"), LongType).as("us"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1704067207179575L, 1704067207179575L,
      1704067207179576L, 1704067207179576L))
  }

  test("tsAsNtz agrees across the LONG and NTZ physical shapes") {
    val usValue = 1704067207179575L
    val fromNs = Seq(usValue * 1000 + 123).toDF("ts")
      .select(Tables.tsAsNtz(col("ts"), LongType).as("t"))
      .collect().head.getAs[java.time.LocalDateTime]("t")
    val fromNtz = Seq(usValue).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .select(Tables.tsAsNtz(col("ts"), TimestampNTZType).as("t"))
      .collect().head.getAs[java.time.LocalDateTime]("t")
    assert(fromNs == fromNtz, s"$fromNs != $fromNtz")
  }
}
