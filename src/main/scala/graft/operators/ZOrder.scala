package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * lever for 100 TB scan pruning. A table range-partitioned and sorted on
  * ONE key prunes scans on that key only; interleaving the bits of TWO
  * normalized keys into one z-value and laying the data out by z-value
  * gives every file a narrow min/max envelope in BOTH dimensions, so
  * parquet row-group stats (and partition-level min/max) prune selective
  * filters on EITHER column — the technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, here as a plain Spark write-path transform:
  *
  *   df.withColumn("z", zValue(x, y))
  *     .repartitionByRange(n, col("z")).sortWithinPartitions("z")
  *     .write.parquet(...)
  *
  * Everything is exact integer arithmetic (scale to 8 bits by integer
  * multiply-divide, interleave by shift-and-mask), so the layout is
  * deterministic and engine-portable — the DuckDB oracle replays the
  * identical bit math.
  *
  * The GATE (`q_zorder_layout`) proves the clustering property in-plan
  * without writing files: bucket = the z-value's top 4 bits (a pure map —
  * the at-scale bucketing is `repartitionByRange(z)`, whose sampled
  * boundaries are not engine-portable; the bit-prefix bucket is the
  * deterministic stand-in with the same locality), then per-bucket
  * min/max of BOTH raw dimensions. Z-ordering makes those envelopes
  * narrow in x and y simultaneously; a single-key sort would leave one
  * dimension's envelope spanning the full range in every bucket. One map
  * + one 16-group hash agg — map-side combine collapses everything.
  */
object ZOrder {

  private val Bits = 8

  /** Interleave the low `Bits` bits of `x` and `y` (x at odd positions,
    * y at even): a SQL-expression string valid in BOTH Spark SQL and
    * DuckDB (`&` and `+` are shared; shifts spelled per dialect via
    * `shl`/`shr`). Bits are disjoint, so `+` assembles the word.
    */
  private def interleaveSql(x: String, y: String,
                            shl: (String, Int) => String,
                            shr: (String, Int) => String): String =
    (0 until Bits).flatMap { i =>
      Seq(shl(s"(${shr(x, i)} & 1)", 2 * i + 1),
        shl(s"(${shr(y, i)} & 1)", 2 * i))
    }.mkString("(", " + ", ")")

  private def sparkShl(e: String, n: Int) = s"shiftleft($e, $n)"
  private def sparkShr(e: String, n: Int) = if (n == 0) e else s"shiftright($e, $n)"
  private def duckShl(e: String, n: Int) = s"($e << $n)"
  private def duckShr(e: String, n: Int) = if (n == 0) e else s"($e >> $n)"

  /** The z-value of two already-8-bit-normalized integer columns. */
  def zValue(x: String, y: String): Column =
    expr(interleaveSql(x, y, sparkShl, sparkShr))

  // events-table dimensions, normalized to 8 bits by EXACT integer
  // multiply-then-floor-divide (both engines: trunc toward zero on
  // non-negative operands): user_id 0..149 → 0..254, minute-of-day
  // 0..1439 → 0..255. Full-range y spread keeps the bit interleave
  // meaningful in both coordinates.
  private val xSqlSpark = "((user_id * 256) div 150)"
  private val xSqlDuck  = "((user_id * 256) // 150)"
  private def ySql(hour: String, minute: String) =
    s"((($hour * 60 + $minute) * 256) div 1440)"

  /** Per-bucket layout report over events: bucket = z >> 12 (top 4 bits),
    * then count + min/max of both RAW dimensions per bucket.
    */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(s, dir)
      .withColumn("x8", expr(xSqlSpark))
      .withColumn("y8", expr(ySql("hour(ts)", "minute(ts)")))
      .withColumn("minute_of_day", expr("hour(ts) * 60 + minute(ts)"))
      .withColumn("z", zValue("x8", "y8"))
    ev.groupBy(expr("shiftright(z, 12)").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"),
        min(col("minute_of_day")).cast("int").as("min_minute"),
        max(col("minute_of_day")).cast("int").as("max_minute"))
      .orderBy("bucket")
  }

  private val zorderLayoutSql = {
    val y = "(((hour(ts) * 60 + minute(ts)) * 256) // 1440)"
    val z = interleaveSql(xSqlDuck, y, duckShl, duckShr)
    s"""SELECT ($z >> 12) AS bucket, COUNT(*) AS n,
       |  min(user_id) AS min_user, max(user_id) AS max_user,
       |  CAST(min(hour(ts) * 60 + minute(ts)) AS INT) AS min_minute,
       |  CAST(max(hour(ts) * 60 + minute(ts)) AS INT) AS max_minute
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------ write path
  //
  // The operator's value claim is FILE SKIPPING: lay the data out by
  // z-value and a selective filter on EITHER dimension prunes most
  // row-groups via parquet min/max stats. zorderLayout proves the
  // envelope property in-plan; the writers below produce the actual
  // laid-out files, and ZOrderSpec executes scans against them and reads
  // the scan's own metrics (numOutputRows after row-group pruning) to
  // show the subset — asserted AND executed.

  /** Write `df` z-order-clustered on two already-8-bit-normalized integer
    * columns: z-value → range partition (each output file covers a narrow
    * z interval ⇒ a narrow rectangle in (x, y)) → sort within partitions
    * (row groups inside a file cluster too). The helper column is dropped
    * before the write; the projection preserves the sort order.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, nFiles: Int): Unit =
    df.withColumn("__z", zValue(xCol, yCol))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** The single-key comparison layout: range-partitioned and sorted on
    * ONE column — prunes scans on that column only; the other dimension
    * spans its full range in every file.
    */
  def writeKeySorted(df: DataFrame, keyCol: String,
                     path: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(path)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder_layout" -> (zorderLayout(_, _)))

  val oracles: Map[String, String] = Map(
    "q_zorder_layout" -> zorderLayoutSql)
}
