package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Executable guard for the decimal→double compare edge.
  *
  * Gated queries aggregate in exact DECIMAL (order-independent) and cast to
  * DOUBLE at the output edge for the driver's hash compare. That cast is
  * bit-identical across Spark and DuckDB only while the decimal's UNSCALED
  * magnitude stays below 2^53 (~9e11 at scale 4, ~9e9 at scale 6): DuckDB
  * converts int128→double and then divides by 10^scale, which is correctly
  * rounded only in that range, while Spark's BigDecimal.doubleValue always
  * is. Rather than a comment documenting the bound, the edge raises in-plan
  * the moment a scale-factor bump crosses it — a loud "switch this gate to
  * the string compare" instead of a silent hash mismatch. Cost: one
  * codegen'd branch per OUTPUT row (post-aggregation, tiny cardinality).
  */
object DecimalEdge {

  /** Cast a DECIMAL column (of decimal `scale`) to double, raising if the
    * value leaves the range where the cross-engine compare is exact.
    */
  def dbl(c: Column, scale: Int): Column = {
    val bound = math.pow(2, 53) / math.pow(10, scale)
    when(c.isNull || abs(c) < lit(bound), c.cast("double"))
      .otherwise(raise_error(concat(
        lit(s"graft decimal->double gate edge: |value*10^$scale| >= 2^53; " +
          "the hash compare is no longer exact at this sf - switch this " +
          "gate to the documented string compare. value="),
        c.cast("string"))))
  }
}
