package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — "for each left row, the latest right row at or
  * before it" — the time-series join Spark has no built-in operator for
  * (the reference has none either; this is §2x extension surface, the
  * standard point-in-time lookup of feature stores and market data).
  *
  * Implementation is the canonical DISTRIBUTED formulation, not a merge
  * join: tag both sides, union them, and carry the last right-side value
  * forward with a `last(..., ignoreNulls)` running window per key — ONE
  * shuffle+sort keyed by the join key, no range-join explosion, no
  * per-key driver loop. At 100 TB both sides shuffle once on the key and
  * each partition does a linear timestamp-ordered sweep; skewed keys
  * split fine because the window frame is running (AQE can split by key
  * ranges). A sort-merge range join would re-scan right rows per left
  * row; a windowed self-join (`ts BETWEEN x AND y`) explodes on dense
  * right sides. This shape is linear in input.
  *
  * Ties: a right row AT the left row's timestamp matches (inclusive
  * semantics, DuckDB `ASOF JOIN ... ON l.ts >= r.ts`) — encoded by
  * sorting right rows before left rows at equal timestamps. The right
  * side must be unique per (keys, ts); pre-aggregate it otherwise
  * (the gate dedupes with max(event_id), mirrored in the oracle).
  */
object AsofJoin {

  /** Generic backward as-of join.
    *
    * @param left      rows to annotate; keeps ALL its columns
    * @param right     lookup side, unique per (keys, tsCol)
    * @param keys      equi-join key columns (present on both sides)
    * @param tsCol     event-time column name (both sides, orderable)
    * @param valueCols right columns carried onto each left row (null when
    *                  no right row at or before the left row exists)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side 0 = right, 1 = left: at equal ts the right row sorts FIRST and
    // is therefore visible to the left row — inclusive match
    val taggedRight = right.select(
      (keys.map(col) :+ col(tsCol) :+ lit(0).as("__side")) ++
        valueCols.map(col) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(tsCol) :+ lit(1).as("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.map(c => c -> s"__asof_$c")
    val matchTs = s"__asof_$tsCol"

    val swept = carried.foldLeft(
      taggedRight.unionByName(taggedLeft)
        .withColumn(matchTs,
          last(when(col("__side") === 0, col(tsCol)), ignoreNulls = true).over(w))) {
      case (df, (c, out)) =>
        df.withColumn(out, last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    swept
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        carried.map { case (c, out) => col(out).as(c) } :+
        col(matchTs).as(s"${tsCol}_right"): _*)
  }

  // ---- oracle gate ------------------------------------------------------

  /** The gate: for every `click` event, the latest `view` of the same user
    * at or before it (point-in-time attribution). The oracle is DuckDB's
    * NATIVE `ASOF LEFT JOIN` — the established semantics, not a replay of
    * our formulation — so the union+window sweep is checked against an
    * independent implementation of the operator.
    */
  def asofClicks(s: SparkSession, dir: String): DataFrame = {
    val ev = EventWindows.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    asofBackward(clicks, views, Seq("user_id"), "ts", Seq("view_id"))
      .select(col("user_id"), col("click_id"), col("ts").as("click_ts"),
        col("view_id"), col("ts_right").as("view_ts"))
      .orderBy("click_id")
  }

  private val asofClicksSql =
    """WITH clicks AS (
      |  SELECT user_id, ts, event_id AS click_id FROM events
      |  WHERE event_type = 'click'),
      |views AS (
      |  SELECT user_id, ts, max(event_id) AS view_id FROM events
      |  WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT c.user_id, c.click_id, c.ts AS click_ts, v.view_id, v.ts AS view_ts
      |FROM clicks c ASOF LEFT JOIN views v
      |  ON c.user_id = v.user_id AND c.ts >= v.ts
      |ORDER BY c.click_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (asofClicks(_, _)))

  val oracles: Map[String, String] = Map(
    "q_asof_join" -> asofClicksSql)
}
