package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trailing-window range join — "for each left row, the right rows of the
  * same key with `ts` in `[left.ts - window, left.ts)`" — the
  * feature-engineering join ("events in the trailing hour") that naive
  * SQL plans as a nested-loop range join.
  *
  * Scale shape: both sides are bucketed by `floor(ts / window)`; a right
  * row in the trailing window of a left row can only live in the left
  * row's bucket or the one before it, so each left row probes exactly TWO
  * buckets via an ordinary equi-join on (keys, bucket), and the exact
  * range predicate filters inside the bucket pair. Work scales with
  * bucket occupancy (×2 replication of the left side), never |L|×|R|;
  * the join stays a hash join on narrow keys. This is the standard
  * bounded-expansion rewrite of a band/range join.
  */
object RangeJoin {

  /** Per-left-row aggregates over the trailing window.
    *
    * @param left     probe rows: keys + `tsCol` + an `idCol` unique per row
    * @param right    event rows: keys + `tsCol` + columns used by `aggs`
    * @param keys     equi-join key columns
    * @param tsCol    event-time column (TIMESTAMP) on both sides
    * @param windowUs trailing window length in MICROSECONDS; the interval
    *                 is `[left.ts - window, left.ts)` — half-open, so a
    *                 right row AT the left timestamp is excluded
    * @param aggs     aggregates over the MATCHED right rows only (count,
    *                 sum, collect_list …). Left rows with zero matches are
    *                 kept with NULL aggregate values — `coalesce` at the
    *                 call site for zero defaults (count(*) is safe: it
    *                 counts matched rows, never probe artifacts)
    */
  def trailingWindow(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, idCol: String, windowUs: Long,
      aggs: Seq[Column]): DataFrame = {
    require(windowUs > 0, "window must be positive")
    val reserved = Seq("__ts_us", "__rts_us", "__b", "__b0")
    val clash = (left.columns ++ right.columns).intersect(reserved)
    require(clash.isEmpty,
      s"columns ${clash.mkString(", ")} collide with reserved range-join names")
    // the final left join re-keys on idCol: a duplicated id would fan out
    // and merge DISTINCT probe rows' aggregates. Uniqueness can't be
    // asserted cheaply distributed, but an idCol that also lives on the
    // right is certain trouble (the inner-join output would carry both)
    require(left.columns.contains(idCol),
      s"idCol '$idCol' must be a left column (and UNIQUE per left row — " +
        "a duplicated id merges distinct probe rows' aggregates)")
    require(!right.columns.contains(idCol),
      s"idCol '$idCol' must not also exist on the right side")
    // NTZ timestamps convert to instants through the SESSION time zone; in
    // a DST-observing zone that conversion is non-linear and a window-mate
    // can land outside the probed bucket pair (silently missing rows). The
    // engine pins UTC everywhere — make a violation loud, not wrong.
    if (Seq(left.schema(tsCol).dataType, right.schema(tsCol).dataType)
        .contains(org.apache.spark.sql.types.TimestampNTZType)) {
      val tz = left.sparkSession.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC",
        s"trailingWindow on TIMESTAMP_NTZ needs spark.sql.session.timeZone=UTC, found $tz")
    }
    // all time arithmetic on microsecond LONGS: the bucket and range
    // predicates stay integer comparisons. Buckets use exact long
    // floor-division — (t - pmod(t, w)) is the exact floor multiple and
    // integral `div` of an exact multiple never rounds — where the naive
    // floor(t / w) runs a DOUBLE division that loses integer precision
    // past 2^52 and could misbucket boundary rows
    val us = (c: Column) => unix_micros(c.cast("timestamp"))
    def bucketOf(tsUs: String): Column =
      expr(s"($tsUs - pmod($tsUs, ${windowUs}L)) div ${windowUs}L")

    // each left row probes its own bucket and the previous one — the only
    // two buckets a trailing-window right row can occupy
    val probes = left
      .withColumn("__ts_us", us(col(tsCol)))
      .withColumn("__b0", bucketOf("__ts_us"))
      .withColumn("__b", explode(array(col("__b0") - 1, col("__b0"))))
      .drop("__b0")
    val events = right
      .select((keys.map(col) :+ us(col(tsCol)).as("__rts_us")) ++
        right.columns.filterNot(c => keys.contains(c) || c == tsCol).map(col): _*)
      .withColumn("__b", bucketOf("__rts_us"))

    val joinCond = (keys.map(k => probes(k) === events(k)) :+
      (probes("__b") === events("__b")) :+
      (events("__rts_us") >= probes("__ts_us") - windowUs) :+
      (events("__rts_us") < probes("__ts_us"))).reduce(_ && _)

    // INNER join + aggregate + join back: aggregating over the left join
    // directly would feed aggs the x2 exploded probe copies and their
    // null-extended no-match rows — count(*) would count artifacts. The
    // inner join keeps only matched right rows (each matches exactly one
    // probe copy, so no double count), and unmatched left rows re-enter
    // with NULL aggregates through the final left join on the unique id.
    // Join the FULL events frame: the condition holds attribute references
    // into it, and dropping key columns first would make them re-resolve
    // by name against the probe side (degenerating the key equality).
    val matched = probes
      .join(events, joinCond)
      .groupBy(probes(idCol))
      .agg(aggs.head, aggs.tail: _*)
    left.join(matched, Seq(idCol), "left")
  }

  // ---- oracle gate ------------------------------------------------------

  /** The gate: per click, how many views (and their decimal-exact value
    * sum) the same user produced in the trailing hour. DuckDB replays the
    * plain inequality join — the semantics, not the bucket rewrite.
    */
  def trailingViews(s: SparkSession, dir: String): DataFrame = {
    val ev = EventWindows.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"), col("value"))
    trailingWindow(clicks, views, Seq("user_id"), "ts", "click_id",
      3600L * 1000 * 1000,
      Seq(count(col("view_id")).as("n_views"),
        graft.DecimalEdge.dbl(
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))), 6)
          .as("sum_view_value")))
      // zero-match clicks carry NULL aggregates (matched-rows contract) —
      // default them to the oracle's LEFT-JOIN zeros here
      .select(col("click_id"), col("user_id"), col("ts").as("click_ts"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("sum_view_value"), lit(0.0)).as("sum_view_value"))
      .orderBy("click_id")
  }

  private val trailingViewsSql =
    """WITH clicks AS (
      |  SELECT user_id, ts, event_id AS click_id FROM events
      |  WHERE event_type = 'click'),
      |views AS (
      |  SELECT user_id, ts, event_id AS view_id, value FROM events
      |  WHERE event_type = 'view')
      |SELECT c.click_id, c.user_id, c.ts AS click_ts,
      |  count(v.view_id) AS n_views,
      |  CAST(coalesce(sum(CAST(v.value AS DECIMAL(18,6))), 0) AS DOUBLE) AS sum_view_value
      |FROM clicks c LEFT JOIN views v
      |  ON c.user_id = v.user_id
      |  AND v.ts >= c.ts - INTERVAL 1 HOUR AND v.ts < c.ts
      |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> (trailingViews(_, _)))

  val oracles: Map[String, String] = Map(
    "q_range_join" -> trailingViewsSql)
}
