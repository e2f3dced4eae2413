package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The decimal→double gate edge must pass values inside the 2^53-unscaled
  * exactness range untouched (including NULL aggregates) and raise LOUDLY —
  * not drift — the moment a value crosses it.
  */
class DecimalEdgeSpec extends SparkSpec {

  import spark.implicits._

  test("in-range values cast exactly; nulls pass through") {
    val df = Seq(Some(BigDecimal("123456.7891")), None)
      .toDF("v")
      .select(DecimalEdge.dbl(col("v").cast(DecimalType(18, 4)), 4).as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) === 123456.7891)
    assert(rows(1).isNullAt(0))
  }

  test("crossing 2^53 unscaled raises with the switch-the-gate message") {
    // 2^53 / 10^4 ≈ 9.007e11; a value above it must raise, not round.
    val big = Seq(BigDecimal("999999999999.0000")).toDF("v")
      .select(DecimalEdge.dbl(col("v").cast(DecimalType(18, 4)), 4).as("d"))
    val e = intercept[Exception](big.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("string compare")))
  }
}
