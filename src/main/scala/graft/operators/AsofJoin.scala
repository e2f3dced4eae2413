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
  * each partition does a linear timestamp-ordered sweep. A HOT key still
  * serializes through one task — window partitions cannot be split by
  * AQE — so the skew remedy is a composite (key, time-bucket) partition
  * with each bucket seeded by the previous bucket's last right row (two
  * passes), not salting. A sort-merge range join would re-scan right
  * rows per left row; a windowed self-join (`ts BETWEEN x AND y`)
  * explodes on dense right sides. This shape is linear in input.
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
    val tsRight = s"${tsCol}_right"
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(!keys.contains(tsCol), s"'$tsCol' cannot be both key and timestamp")
    require(!valueCols.contains(tsCol),
      s"'$tsCol' is returned as '$tsRight'; do not list it in valueCols")
    val collisions = valueCols.intersect(leftCols)
    require(collisions.isEmpty,
      s"value columns ${collisions.mkString(", ")} collide with left columns — alias them first")
    val reserved = (leftCols ++ valueCols).intersect(Seq("__side", "__m", "__match", "__ts"))
    require(reserved.isEmpty,
      s"columns ${reserved.mkString(", ")} collide with reserved as-of names")
    require(!leftCols.contains(tsRight),
      s"left already has a '$tsRight' column — the match timestamp output would collide")

    // a right row with a NULL key or NULL timestamp can never match (SQL
    // equality semantics / ASOF ordering) — drop up front, which also makes
    // null-key LEFT rows correctly match nothing despite window partitions
    // grouping nulls together
    val matchableRight = right.filter(
      (keys.map(col(_).isNotNull) :+ col(tsCol).isNotNull).reduce(_ && _))

    // The match is carried as ONE struct (timestamp + all value columns):
    // the struct is non-null exactly when a right row exists, so a single
    // last(ignoreNulls) sweep keeps values and match-timestamp from the
    // SAME right row — per-column sweeps would skip a matched row whose
    // value happens to be null and resurrect an older row's value.
    val mType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__ts", right.schema(tsCol).dataType) +:
        valueCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    // side 0 = right, 1 = left: at equal ts the right row sorts FIRST and
    // is therefore visible to the left row — inclusive match
    val taggedRight = matchableRight.select(
      (keys.map(col) :+ col(tsCol) :+ lit(0).as("__side") :+
        struct(col(tsCol).as("__ts") +: valueCols.map(col): _*).as("__m")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(tsCol) :+ lit(1).as("__side") :+
        lit(null).cast(mType).as("__m")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__match", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__match.$c").as(c)) :+
        col("__match.__ts").as(tsRight): _*)
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
