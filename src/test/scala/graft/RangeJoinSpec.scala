package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Boundary semantics of the bucketed trailing-window join (the oracle
  * gate checks it against DuckDB's plain inequality join at scale).
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private val HourUs = 3600L * 1000 * 1000

  test("trailingWindow: half-open interval, cross-bucket matches, zero-match rows kept") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60 * 1000)
    val left = Seq(
      (1L, ts(90), 10L),   // window [00:30, 01:30): catches 00:30(incl) .. 01:29
      (2L, ts(90), 20L))   // other user: no views at all
      .toDF("user_id", "ts", "click_id")
    val right = Seq(
      (1L, ts(30), 100L),  // exactly ts-window -> INCLUDED (closed lower bound)
      (1L, ts(89), 101L),  // inside, same bucket as click
      (1L, ts(45), 102L),  // inside, PREVIOUS hour bucket -> cross-bucket match
      (1L, ts(90), 103L),  // exactly click ts -> EXCLUDED (open upper bound)
      (1L, ts(29), 104L))  // just before window -> excluded
      .toDF("user_id", "ts", "view_id")
    val out = RangeJoin.trailingWindow(left, right, Seq("user_id"), "ts", "click_id",
      HourUs, Seq(
        // count(*) is safe under the matched-rows contract: it must see
        // only genuine matches, never probe copies or null-extended rows
        count(lit(1)).as("n"),
        sort_array(collect_list(col("view_id"))).as("ids")))
      .collect().map(r => r.getAs[Long]("click_id") ->
        (Option(r.getAs[java.lang.Long]("n")), Option(r.getAs[Seq[Long]]("ids")))).toMap
    assert(out(10L) == (Some(3L), Some(Seq(100L, 101L, 102L))))
    // zero-match left rows are kept, with NULL aggregates
    assert(out(20L) == (None, None))
  }
}
