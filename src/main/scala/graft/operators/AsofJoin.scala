package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * AQE — so [[asofBackwardBucketed]] ships the skew remedy: a composite
  * (key, time-bucket) partition with each bucket seeded by the latest
  * earlier-bucket right row (two passes, the second at bucket granularity),
  * not salting. A sort-merge range join would re-scan right
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
  /** Shared validation + side-tagging for both as-of variants. */
  private case class Tagged(taggedRight: DataFrame, taggedLeft: DataFrame,
      leftCols: Seq[String], tsRight: String)

  private def validateAndTag(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String]): Tagged = {
    val leftCols = left.columns.toSeq
    val tsRight = s"${tsCol}_right"
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(!keys.contains(tsCol), s"'$tsCol' cannot be both key and timestamp")
    require(!valueCols.contains(tsCol),
      s"'$tsCol' is returned as '$tsRight'; do not list it in valueCols")
    val collisions = valueCols.intersect(leftCols)
    require(collisions.isEmpty,
      s"value columns ${collisions.mkString(", ")} collide with left columns — alias them first")
    val reserved = (leftCols ++ valueCols)
      .intersect(Seq("__side", "__m", "__match", "__ts", "__tl", "__b", "__eb", "__s", "__last", "__carry", "__back", "__fwd"))
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
    Tagged(taggedRight, taggedLeft, leftCols, tsRight)
  }

  /** The sweep shared by both variants: last-right-row-forward over the
    * given window partition, then peel the left rows back out.
    */
  private def sweep(unioned: DataFrame, partCols: Seq[Column], tsCol: String,
      valueCols: Seq[String], tg: Tagged): DataFrame = {
    val w = Window.partitionBy(partCols: _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(tg.leftCols.map(col) ++
        valueCols.map(c => col(s"__match.$c").as(c)) :+
        col("__match.__ts").as(tg.tsRight): _*)
  }

  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val tg = validateAndTag(left, right, keys, tsCol, valueCols)
    sweep(tg.taggedRight.unionByName(tg.taggedLeft), keys.map(col), tsCol, valueCols, tg)
  }

  /** Distance-comparable view of an orderable ts column: timestamps via
    * the shared Tables.tsAsMicros mapping, dates by day number, integral
    * numerics as-is, fractional numerics as DOUBLE (a long cast would
    * truncate 10.4 vs 10.5 to a false tie and pick the wrong neighbor).
    * Integral decimals (scale 0, long-representable) stay EXACT through
    * the long path — a DECIMAL(20,0) ns-epoch would lose ~hundreds of ns
    * to double rounding, the very hazard the double fallback is scoped to
    * fractional/oversized decimals to avoid. Anything else is rejected up
    * front — a silent null distance would otherwise bias every choice to
    * the forward row.
    */
  private def asDistance(c: Column, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case TimestampNTZType | TimestampType => graft.Tables.tsAsMicros(c, dt)
      case DateType => unix_date(c)
      case ByteType | ShortType | IntegerType | LongType => c.cast(LongType)
      case d: DecimalType if d.scale == 0 && d.precision <= 18 => c.cast(LongType)
      case FloatType | DoubleType | _: DecimalType => c.cast(DoubleType)
      case other => throw new IllegalArgumentException(
        s"asofNearest needs a timestamp/date/numeric ts column, got $other")
    }
  }

  /** NEAREST as-of join — pandas `merge_asof(direction='nearest')`: for
    * each left row, the right row minimizing |ts_right − ts_left| within
    * the key, ties to the BACKWARD (≤) candidate so the operator degrades
    * to [[asofBackward]] on exact hits. Same distributed shape as the
    * backward sweep — tag, union, ONE shuffle+sort per key — but with TWO
    * frames over the SAME window ordering: last(ignoreNulls) over
    * (unbounded, current) carries the latest right row at-or-before, and
    * first(ignoreNulls) over (current, unbounded) grabs the earliest
    * right row strictly after (a right row AT the left timestamp sorts
    * before it, so it lands in the backward frame where the tie rule
    * wants it). Spark computes both frames in the one sort pass — the
    * forward direction costs no second shuffle. Null-safe choice: a
    * missing side loses automatically; both missing ⇒ null match.
    */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val tg = validateAndTag(left, right, keys, tsCol, valueCols)
    nearestSweep(tg.taggedRight.unionByName(tg.taggedLeft), keys.map(col),
      tsCol, valueCols, tg, left.schema(tsCol).dataType)
  }

  /** The two-frame sweep shared by [[asofNearest]] (partition = keys) and
    * [[asofNearestBucketed]] (partition = keys + time bucket): both frames
    * ride ONE sort — last(≤ current) is the backward candidate, first(≥
    * current) the forward one — then the null-safe distance choice, ties
    * backward.
    */
  private def nearestSweep(unioned: DataFrame, partCols: Seq[Column],
      tsCol: String, valueCols: Seq[String], tg: Tagged,
      tsType: org.apache.spark.sql.types.DataType): DataFrame = {
    val wBack = Window.partitionBy(partCols: _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(partCols: _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val t = asDistance(col(tsCol), tsType)
    val backDist = t - asDistance(col("__back.__ts"), tsType)
    val fwdDist = asDistance(col("__fwd.__ts"), tsType) - t
    unioned
      .withColumn("__back", last(col("__m"), ignoreNulls = true).over(wBack))
      .withColumn("__fwd", first(col("__m"), ignoreNulls = true).over(wFwd))
      .filter(col("__side") === 1)
      .withColumn("__match",
        when(col("__back").isNull, col("__fwd"))
          .when(col("__fwd").isNull, col("__back"))
          .when(backDist <= fwdDist, col("__back"))
          .otherwise(col("__fwd")))
      .select(tg.leftCols.map(col) ++
        valueCols.map(c => col(s"__match.$c").as(c)) :+
        col("__match.__ts").as(tg.tsRight): _*)
  }

  /** Skew-safe backward as-of join — the 100 TB remedy for hot keys.
    *
    * [[asofBackward]] partitions its window by key alone, so one hot key
    * serializes through one task. This variant partitions by the composite
    * (keys…, time-bucket of width `bucketUs`) — a hot key spreads over as
    * many tasks as it spans buckets — and restores cross-bucket matches in
    * a second, BUCKET-GRANULARITY pass: per (key, bucket) the last right
    * row is aggregated (one struct per occupied bucket, data-size
    * independent), a running sweep over that tiny frame computes each left
    * bucket's carry-in (the latest right row of any STRICTLY EARLIER
    * bucket), and the carry is injected into the bucket's partition as a
    * synthetic right row. Its timestamp comes from an earlier bucket, so
    * it naturally sorts before every native row of the bucket and the
    * in-bucket sweep is unchanged. Identical results to [[asofBackward]]
    * by construction; pick `bucketUs` so a hot key's densest bucket fits a
    * task (total work stays linear — the extra pass touches one row per
    * occupied (key, bucket), not per input row).
    *
    * @param bucketUs bucket width in MICROSECONDS of the timestamp column
    *                 (timestamps are bucketed on their epoch-micros value)
    */
  def asofBackwardBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String], bucketUs: Long): DataFrame = {
    val tg = bucketChecks(left, right, keys, tsCol, valueCols, bucketUs)
    val rightB = withBucket(tg.taggedRight, tsCol, bucketUs)
    val leftB  = withBucket(tg.taggedLeft, tsCol, bucketUs)
    val back = seedRows(
      carrySeeds(rightB, leftB, keys, forward = false), tg, left, keys, tsCol)
    // pass 2: the standard sweep, partitioned by the COMPOSITE key
    sweep(rightB.unionByName(leftB).unionByName(back),
      keys.map(col) :+ col("__b"), tsCol, valueCols, tg)
  }

  /** NEAREST as-of under the same skew remedy: [[asofNearest]]'s hot-key
    * window partitions by key alone, serializing a hot key through one
    * task exactly as [[asofBackward]]'s did before the bucketed variant.
    * Here the composite (keys…, bucket) partition needs carries in BOTH
    * directions: the backward seed (latest right row of any strictly
    * earlier bucket — sorts before every native row of its target bucket)
    * and the forward seed (earliest right row of any strictly later bucket
    * — sorts after every native row, so the in-bucket forward frame finds
    * it last). With both seeds injected, the two-frame sweep inside a
    * bucket sees exactly the global backward and forward candidates, so
    * results match [[asofNearest]] by construction (AsofJoinSpec holds it
    * to the brute force under 90%-hot-key skew).
    */
  def asofNearestBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String], bucketUs: Long): DataFrame = {
    val tg = bucketChecks(left, right, keys, tsCol, valueCols, bucketUs)
    val rightB = withBucket(tg.taggedRight, tsCol, bucketUs)
    val leftB  = withBucket(tg.taggedLeft, tsCol, bucketUs)
    val back = seedRows(
      carrySeeds(rightB, leftB, keys, forward = false), tg, left, keys, tsCol)
    val fwd = seedRows(
      carrySeeds(rightB, leftB, keys, forward = true), tg, left, keys, tsCol)
    nearestSweep(rightB.unionByName(leftB).unionByName(back).unionByName(fwd),
      keys.map(col) :+ col("__b"), tsCol, valueCols, tg,
      left.schema(tsCol).dataType)
  }

  private def bucketChecks(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String], bucketUs: Long): Tagged = {
    require(bucketUs > 0, "bucket width must be positive")
    if (Seq(left.schema(tsCol).dataType, right.schema(tsCol).dataType)
        .contains(org.apache.spark.sql.types.TimestampNTZType)) {
      val tz = left.sparkSession.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC",
        s"bucketed as-of on TIMESTAMP_NTZ needs spark.sql.session.timeZone=UTC, found $tz")
    }
    validateAndTag(left, right, keys, tsCol, valueCols)
  }

  // exact floor-division bucketing in LONG arithmetic: (t - pmod(t, w))
  // is the exact floor multiple, and integral `div` of an exact multiple
  // has no rounding — correct over the whole long range, unlike
  // floor(t / w) whose double division loses integer precision past 2^52
  private def withBucket(df: DataFrame, tsCol: String, bucketUs: Long): DataFrame = df
    .withColumn("__tl", unix_micros(col(tsCol).cast("timestamp")))
    .withColumn("__b", expr(s"(__tl - pmod(__tl, ${bucketUs}L)) div ${bucketUs}L"))
    .drop("__tl")

  /** Pass 1 of the bucketed variants, at BUCKET granularity (one row per
    * occupied (key, bucket), data-size independent): for each left-occupied
    * bucket, the latest right row of any strictly earlier bucket
    * (backward), or the earliest right row of any strictly later bucket
    * (forward). Struct min/max order on the leading __ts field, so
    * max(__m)/min(__m) ARE the bucket's latest/earliest right rows; a right
    * bucket's marker is shifted one bucket toward its visibility side
    * (+1 backward, −1 forward) so the running carry sweep sees exactly the
    * buckets STRICTLY on the other side of each left bucket.
    */
  private def carrySeeds(rightB: DataFrame, leftB: DataFrame, keys: Seq[String],
      forward: Boolean): DataFrame = {
    val perBucket = rightB.groupBy(keys.map(col) :+ col("__b"): _*)
      .agg((if (forward) min(col("__m")) else max(col("__m"))).as("__last"))
    val leftBuckets = leftB.select(keys.map(col) :+ col("__b"): _*).distinct()
    val shift = if (forward) -1 else 1
    val markers = perBucket
      .select((keys.map(col) :+ (col("__b") + shift).as("__eb") :+
        lit(0).as("__s") :+ col("__last")): _*)
      .unionByName(leftBuckets.select(
        (keys.map(col) :+ col("__b").as("__eb") :+ lit(1).as("__s") :+
          lit(null).cast(perBucket.schema("__last").dataType).as("__last")): _*))
    // forward sweeps bucket-DESCENDING: the last marker seen before a left
    // bucket is then the nearest strictly-later occupied right bucket
    val wCarry = Window.partitionBy(keys.map(col): _*)
      .orderBy((if (forward) col("__eb").desc else col("__eb")), col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    markers
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wCarry))
      .filter(col("__s") === 1 && col("__carry").isNotNull)
      .select(keys.map(col) :+ col("__eb").as("__b") :+ col("__carry"): _*)
  }

  /** Inject carries as synthetic right rows of their target bucket; the
    * other-bucket timestamp sorts a backward seed before (and a forward
    * seed after) every native row of the bucket, so the in-bucket sweeps
    * need no special cases. */
  private def seedRows(seeds: DataFrame, tg: Tagged, left: DataFrame,
      keys: Seq[String], tsCol: String): DataFrame =
    seeds.select(
      (keys.map(col) :+ col("__carry.__ts").as(tsCol) :+ lit(0).as("__side") :+
        col("__carry").as("__m")) ++
        tg.leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__b"): _*)

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

  /** Same semantics through the skew-safe variant (1-hour buckets) — the
    * oracle is byte-identical to q_asof_join's, so the two-pass rewrite is
    * held to exactly the single-window formulation's results.
    */
  def asofClicksBucketed(s: SparkSession, dir: String): DataFrame = {
    val ev = EventWindows.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    asofBackwardBucketed(clicks, views, Seq("user_id"), "ts", Seq("view_id"),
      bucketUs = 3600L * 1000 * 1000)
      .select(col("user_id"), col("click_id"), col("ts").as("click_ts"),
        col("view_id"), col("ts_right").as("view_ts"))
      .orderBy("click_id")
  }

  /** Nearest-direction gate: for every click, the view of the same user
    * closest in time (either direction, ties backward). The oracle runs
    * DuckDB's native ASOF twice — `>=` (backward) and `<` (forward) —
    * and replays the distance choice in epoch microseconds, so our
    * two-frame single-sweep formulation is checked against two
    * independent native as-of passes.
    */
  def asofClicksNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = EventWindows.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    asofNearest(clicks, views, Seq("user_id"), "ts", Seq("view_id"))
      .select(col("user_id"), col("click_id"), col("ts").as("click_ts"),
        col("view_id"), col("ts_right").as("view_ts"))
      .orderBy("click_id")
  }

  private val asofClicksNearestSql =
    """WITH clicks AS (
      |  SELECT user_id, ts, event_id AS click_id FROM events
      |  WHERE event_type = 'click'),
      |views AS (
      |  SELECT user_id, ts, max(event_id) AS view_id FROM events
      |  WHERE event_type = 'view' GROUP BY 1, 2),
      |b AS (
      |  SELECT c.user_id, c.click_id, c.ts AS click_ts,
      |    v.view_id AS b_id, v.ts AS b_ts
      |  FROM clicks c ASOF LEFT JOIN views v
      |    ON c.user_id = v.user_id AND c.ts >= v.ts),
      |f AS (
      |  SELECT c.click_id, v.view_id AS f_id, v.ts AS f_ts
      |  FROM clicks c ASOF LEFT JOIN views v
      |    ON c.user_id = v.user_id AND c.ts < v.ts)
      |SELECT b.user_id, b.click_id, b.click_ts,
      |  CASE WHEN b_id IS NULL THEN f_id
      |       WHEN f_id IS NULL THEN b_id
      |       WHEN epoch_us(click_ts) - epoch_us(b_ts)
      |            <= epoch_us(f_ts) - epoch_us(click_ts) THEN b_id
      |       ELSE f_id END AS view_id,
      |  CASE WHEN b_id IS NULL THEN f_ts
      |       WHEN f_id IS NULL THEN b_ts
      |       WHEN epoch_us(click_ts) - epoch_us(b_ts)
      |            <= epoch_us(f_ts) - epoch_us(click_ts) THEN b_ts
      |       ELSE f_ts END AS view_ts
      |FROM b JOIN f USING (click_id)
      |ORDER BY b.click_id""".stripMargin

  /** Nearest semantics through the skew-safe variant (1-hour buckets) —
    * oracle byte-identical to q_asof_nearest's, so the two-carry rewrite is
    * held to exactly the single-window formulation's results.
    */
  def asofClicksNearestBucketed(s: SparkSession, dir: String): DataFrame = {
    val ev = EventWindows.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    asofNearestBucketed(clicks, views, Seq("user_id"), "ts", Seq("view_id"),
      bucketUs = 3600L * 1000 * 1000)
      .select(col("user_id"), col("click_id"), col("ts").as("click_ts"),
        col("view_id"), col("ts_right").as("view_ts"))
      .orderBy("click_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (asofClicks(_, _)),
    "q_asof_join_bucketed" -> (asofClicksBucketed(_, _)),
    "q_asof_nearest" -> (asofClicksNearest(_, _)),
    "q_asof_nearest_bucketed" -> (asofClicksNearestBucketed(_, _)))

  val oracles: Map[String, String] = Map(
    "q_asof_join" -> asofClicksSql,
    "q_asof_join_bucketed" -> asofClicksSql,
    "q_asof_nearest" -> asofClicksNearestSql,
    "q_asof_nearest_bucketed" -> asofClicksNearestSql)
}
