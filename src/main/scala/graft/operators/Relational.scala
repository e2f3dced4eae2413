package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampNTZType}

/** Relational operator inventory over the TPC-H-ish testdata.
  *
  * One query per operator family from SURVEY.md §2 (scans, filters, ranges,
  * semi/anti joins, equi joins, aggregations, windows, sort/offset/limit,
  * set ops, scalar functions). Each query:
  *   - is a pure (SparkSession, sfDir) => DataFrame function,
  *   - ends in a deterministic total order (driver hash compare),
  *   - aliases every computed column identically to its DuckDB oracle,
  *   - casts double arithmetic to DECIMAL before aggregation so Spark and
  *     DuckDB agree bit-for-bit (double summation is order-dependent).
  *
  * Scale posture: filters/projections sit directly on the parquet scan
  * (pushdown + pruning), aggregations are partial+final hash aggs, small
  * dimensions are broadcast — no collect(), no driver-side loops.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact-decimal view of a double column (sum order-independence).
    *
    * Bound: the decimal→double at the output edge is bit-identical across
    * Spark and DuckDB only while the UNSCALED aggregate stays below 2^53
    * (~9e11 at scale 4): DuckDB converts int128→double then divides by
    * 10^scale, which is correctly rounded only in that range, while Spark's
    * BigDecimal.doubleValue always is. TPC-H sums at the tested scale
    * factors sit orders of magnitude below the bound; at sf≥100 switch the
    * edge to a rounded/formatted string compare instead. The bound is
    * ENFORCED in-plan by [[graft.DecimalEdge.dbl]] at every sum edge below —
    * crossing it raises loudly rather than silently drifting the hash.
    */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Guarded decimal(…,4)→double output edge — see [[graft.DecimalEdge]]. */
  private def dbl4(c: Column): Column = graft.DecimalEdge.dbl(c, 4)

  /** Columns the profile gate audits — a string, a categorical, a
    * numeric: the three shapes a profiler must render uniformly. */
  private val ProfileCols = Seq("lang", "source", "n_chars")

  /** Table PROFILE / data-quality audit (X114) — the first query anyone
    * runs against an unfamiliar 100 TB table, and the circuit-breaker
    * every ingest pipeline runs against a fresh delivery (a vendor drop
    * whose null rate doubled or whose enum grew a value should fail
    * BEFORE it joins the lake): per column, null count, exact distinct
    * count, and min/max rendered as strings at the output edge ONLY —
    * min/max must compute in the column's native type first
    * (lexicographic "100" < "99" is the classic string-profiling bug).
    * ONE scan: all per-column aggregates ride a single Aggregate node
    * (the distincts plan as the standard Expand — one extra pass-width
    * per distinct column, still one scan of the parquet), and the 1-row
    * result unpivots to \|columns\| rows via stack.
    */
  def tableProfile(s: SparkSession, dir: String): DataFrame = {
    val aggs = ProfileCols.flatMap { c => Seq(
      count(when(col(c).isNull, 1)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c"))
    }
    t(s, dir, "documents")
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(s"""stack(${ProfileCols.length}, ${ProfileCols
          .map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")})""")
        .as(Seq("column", "n_nulls", "n_distinct", "min_value", "max_value")))
      .orderBy("column")
  }

  private val tableProfileSql = ProfileCols.map { c =>
    s"""SELECT '$c' AS "column", count(*) FILTER (WHERE $c IS NULL) AS n_nulls,
       |  count(DISTINCT $c) AS n_distinct,
       |  CAST(min($c) AS VARCHAR) AS min_value,
       |  CAST(max($c) AS VARCHAR) AS max_value
       |FROM documents""".stripMargin
  }.mkString("", "\nUNION ALL ", "\nORDER BY \"column\"")

  private val HistBins = 20L

  /** Equi-width HISTOGRAM at an exact integer grain (X116) — the
    * distribution companion to [[tableProfile]]: values land at integer
    * cents (floor(price·100) — the one portable way to bin a double:
    * binning raw doubles makes the bin edge itself a rounding coin-flip),
    * the domain [min, max] comes from one stats pass, and width =
    * (max−min) div bins + 1 keeps the maximum inside the last bin with
    * pure integer arithmetic — every row's bin is then (c − min) div
    * width, a deterministic expression both engines evaluate identically.
    * Two scans by necessity (a one-pass equi-width histogram needs the
    * domain in advance); the stats row rides a broadcast into the
    * binning scan. Empty bins are absent, not zero-filled — the output
    * is the support, and the oracle agrees on absence.
    */
  def histogram(s: SparkSession, dir: String): DataFrame = {
    val cents = t(s, dir, "orders").select(
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("c"))
    val stats = cents.agg(min(col("c")).as("min_c"), max(col("c")).as("max_c"))
      .withColumn("w", expr(s"(max_c - min_c) div $HistBins + 1"))
    cents.crossJoin(broadcast(stats))
      .withColumn("bin", expr("(c - min_c) div w"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        min(expr("min_c + bin * w")).as("lo_cents"),
        min(expr("min_c + (bin + 1) * w - 1")).as("hi_cents"))
      .select(col("bin"), col("lo_cents"), col("hi_cents"), col("n"))
      .orderBy("bin")
  }

  private val histogramSql =
    s"""WITH c AS (
       |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS c FROM orders),
       |st AS (
       |  SELECT min(c) AS min_c, max(c) AS max_c,
       |    (max(c) - min(c)) // $HistBins + 1 AS w
       |  FROM c)
       |SELECT (c - min_c) // w AS bin,
       |  min(min_c + ((c - min_c) // w) * w) AS lo_cents,
       |  min(min_c + (((c - min_c) // w) + 1) * w - 1) AS hi_cents,
       |  count(*) AS n
       |FROM c CROSS JOIN st
       |GROUP BY 1 ORDER BY 1""".stripMargin

  private val RfmBuckets = 5
  // monetary buckets at a $100 grain: the boundary pass sorts DISTINCT
  // grains, whose count is bounded by the SPEND RANGE, not the customer
  // count — the knob that keeps the quantile step lake-scale-safe
  private val RfmMonetaryGrain = 10000L

  /** Executable ceiling on the per-metric DISTINCT grain count (r16
    * verdict: "nothing asserts the distinct count stays small"). The
    * bounds() window below is single-partition BY DESIGN — sound only
    * while it sorts distinct GRAINS, not rows; a grain choice that
    * unbounds the distinct count (e.g. dropping the monetary bucketing)
    * must fail loudly in-plan (the DecimalEdge discipline), not silently
    * funnel the lake through one partition. 1e6 grains sort in
    * milliseconds on one core; real metric grains sit orders of
    * magnitude below. */
  private val RfmMaxDistinctGrains = 1000000L

  /** Cardinality guard over a (v, cnt) distinct-grain distribution:
    * raise in-plan if the grain count outgrows the single-partition
    * window's safe range. The count rides an unpartitioned window —
    * the frame is ALREADY funneled to one partition for the cumulative
    * sum, so the guard shares that exchange instead of scheduling a
    * separate broadcast job per metric (r18: three such jobs priced
    * ~0.3 s each on the bench). Split out so the raise is spec-testable
    * with a lowered ceiling. */
  private[graft] def grainGuarded(dist: DataFrame, mc: String,
      ceiling: Long = RfmMaxDistinctGrains): DataFrame =
    dist.withColumn("nv", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("v",
        when(col("nv") <= lit(ceiling), col("v"))
          .otherwise(raise_error(concat(
            lit(s"graft rfm grain bound: distinct $mc grain count "),
            col("nv").cast("string"),
            lit(s" > $ceiling - re-bucket the metric grain")))))
      .drop("nv")

  /** RFM customer segmentation (X125, r16) — the classic marketing-
    * warehouse op (Recency / Frequency / Monetary quintiles), previously
    * skipped here because the textbook ntile(5) spelling is a
    * single-partition global sort of the whole customer aggregate. This
    * is the scale-safe form: quintile BOUNDARIES come from the
    * cumulative distribution over DISTINCT metric values (recency in
    * days and order counts are naturally low-cardinality; monetary is
    * bucketed at a $100 grain so its distinct count is bounded by the
    * spend range), and every customer is then bucketed by COMPARISON
    * against the 4 broadcast boundary scalars — a pure map. Plan: ONE
    * lake shuffle keyed on customer for the base aggregate; three narrow
    * distribution aggregates over the cached |customers|-row frame; the
    * only sorts are over distinct-value distributions.
    *
    * Semantics are deliberately tie-deterministic where ntile is not:
    * boundary_k = smallest v with cumcount ≥ ⌈k·n/5⌉, bucket = 1 + #{k :
    * v > boundary_k} — equal values always share a bucket (so bucket
    * populations deviate from n/5 exactly by tie mass, and a boundary
    * collision under heavy ties skips a bucket), which is what makes the
    * result oracle-comparable cross-engine at all. Digit meaning:
    * r_score 1 = most recent, f_score/m_score 5 = most frequent / top
    * spend. Output = per-(r,f,m) segment exact counts + the mod-2^40
    * BIGINT membership hashsum, so segment ASSIGNMENT is oracle-checked
    * per customer, not just segment sizes.
    *
    * Reference analog: none (§2x warehouse-analytics extension surface,
    * next to cohort/funnel/transitions). */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orders = t(s, dir, "orders")
    val refD = orders.agg(max(col("o_orderdate")).as("ref"))
    val cust = orders.groupBy(col("o_custkey").as("c"))
      .agg(max(col("o_orderdate")).as("last_d"),
        count(lit(1)).as("f"),
        sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .crossJoin(broadcast(refD))
      .select(col("c"),
        expr("datediff(CAST(ref AS DATE), CAST(last_d AS DATE))").as("r"),
        col("f"),
        expr(s"cents div $RfmMonetaryGrain").as("m"))
      .cache()
    val n1 = cust.agg(count(lit(1)).as("n"))
    // boundary_k over one metric: cumulative counts over the DISTINCT
    // values (the only sort — bounded by value cardinality, not rows)
    def bounds(mc: String): DataFrame = {
      val dist = cust.groupBy(col(mc).as("v")).agg(count(lit(1)).as("cnt"))
      val cum = grainGuarded(dist, mc).withColumn("cum",
        sum(col("cnt")).over(Window.orderBy(col("v"))))
      val aggs = (1 until RfmBuckets).map { k =>
        min(when(col("cum") >=
            expr(s"($k * n + ${RfmBuckets - 1}) div $RfmBuckets"),
          col("v"))).as(s"${mc}_b$k")
      }
      cum.crossJoin(broadcast(n1)).agg(aggs.head, aggs.tail: _*)
    }
    def score(mc: String) =
      (1 until RfmBuckets).foldLeft(lit(1)) { (acc, k) =>
        acc + (col(mc) > col(s"${mc}_b$k")).cast("int")
      }.as(s"${mc}_score")
    val out = cust
      .crossJoin(broadcast(bounds("r")))
      .crossJoin(broadcast(bounds("f")))
      .crossJoin(broadcast(bounds("m")))
      .select(col("c"), score("r"), score("f"), score("m"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        TextOps.hashSum("c", 1099511627776L).as("cust_hashsum"))
      .orderBy("r_score", "f_score", "m_score")
      .localCheckpoint()
    cust.unpersist(blocking = false)
    out
  }

  private val rfmSegmentsSql = {
    def boundsSql(mc: String) = {
      val cols = (1 until RfmBuckets).map { k =>
        s"min(CASE WHEN cum >= ($k * n + ${RfmBuckets - 1}) // $RfmBuckets" +
          s" THEN v END) AS b$k"
      }.mkString(", ")
      s"""(SELECT $cols FROM (
         |  SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM (
         |    SELECT $mc AS v, count(*) AS cnt FROM cust GROUP BY 1) AS d)
         |  AS cm CROSS JOIN n) AS ${mc}b""".stripMargin
    }
    def scoreSql(mc: String) =
      s"1 + ${(1 until RfmBuckets).map(k =>
        s"(CASE WHEN $mc > ${mc}b.b$k THEN 1 ELSE 0 END)").mkString(" + ")}"
    s"""WITH refd AS (
       |  SELECT CAST(max(o_orderdate) AS DATE) AS ref FROM orders),
       |cust AS (
       |  SELECT o_custkey AS c,
       |    date_diff('day', CAST(max(o_orderdate) AS DATE),
       |      (SELECT ref FROM refd)) AS r,
       |    count(*) AS f,
       |    SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
       |      // $RfmMonetaryGrain AS m
       |  FROM orders GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM cust),
       |scored AS (
       |  SELECT c,
       |    ${scoreSql("r")} AS r_score,
       |    ${scoreSql("f")} AS f_score,
       |    ${scoreSql("m")} AS m_score
       |  FROM cust
       |  CROSS JOIN ${boundsSql("r")}
       |  CROSS JOIN ${boundsSql("f")}
       |  CROSS JOIN ${boundsSql("m")})
       |SELECT r_score, f_score, m_score, count(*) AS n_customers,
       |  ${TextOps.hashSumSql("c", 1099511627776L)}
       |    AS cust_hashsum
       |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_table_profile" -> (tableProfile(_, _)),
    "q_histogram" -> (histogram(_, _)),
    "q_rfm_segments" -> (rfmSegments(_, _)),
    // A1/A3 hash aggregation with partial (map-side) combine.
    // Ref: GraphQLPersistence.scala:370-403 (SUM balance) generalized.
    "q_agg_sum" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // DECIMAL inside the agg (order-independent), DOUBLE at the edge:
          // a decimal→double cast of the same exact value is bit-identical
          // on Spark and DuckDB, so the driver's hash compare agrees.
          dbl4(sum(dec(col("l_quantity")))).as("sum_qty"),
          dbl4(sum(dec(col("l_extendedprice")))).as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P2-P4 equality + range predicates pushed into the parquet scan.
    // Ref: GraphQLPersistence.scala:277-316 (documented semantics, see Q1).
    "q_filter_range" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === lit("F"))
        .filter(col("o_totalprice") >= lit(1000.0) && col("o_totalprice") < lit(5000.0))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // J1-analog broadcast equi-join (dimension side broadcast, no shuffle
    // of the small side) + grouped aggregate.
    "q_join_broadcast" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val nat  = t(s, dir, "nation")
      cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_cust"),
          dbl4(sum(dec(col("c_acctbal")))).as("sum_bal"))
        .orderBy(col("n_name"))
    }),

    // P5 membership filter (reference `name = ANY(...)` —
    // GraphQLPersistence.scala:168-171, 227-231). isin compiles to an IN
    // predicate pushed into the parquet scan.
    "q_isin" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // L2 per-group top-k (reference take-2-oldest-snapshots —
    // PrimaryDataExplorationService.scala:118-124): rank window + filter,
    // deterministic tie-break on the key.
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        // BIGINT rn: DuckDB row_number() yields BIGINT, Spark INT
        .select(col("o_custkey"), col("rn").cast("long").as("rn"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // A3/A4 fold-to-sequence + in-group sort (reference fold + sortBy —
    // PrimaryDataExplorationService.scala:154, 176-177): collect_list +
    // sort_array, rendered as a joined string so the compare is exact.
    // Sort happens on the NUMERIC keys, then cast to string (string sort
    // would put "10" before "9").
    "q_collect_sorted" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n_orders"),
          expr("array_join(transform(sort_array(collect_list(o_orderkey)), x -> CAST(x AS STRING)), ',')")
            .as("order_keys"))
        .orderBy(col("o_custkey"))
    }),

    // Rollup (hierarchical subtotals) — beyond the reference's surface;
    // Spark's built-in Expand + hash agg, one extra shuffle only.
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dbl4(sum(dec(col("o_totalprice")))).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // Exact percentiles (quantile_cont semantics: linear interpolation at
    // rank p*(n-1)) — beyond the reference's surface. Exact percentile is
    // a per-group sort; at 100 TB swap in approx_percentile (t-digest,
    // mergeable partial aggs) — the query shape is unchanged.
    "q_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.95D))").as("qs"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          element_at(col("qs"), 1).as("p25"),
          element_at(col("qs"), 2).as("p50"),
          element_at(col("qs"), 3).as("p75"),
          element_at(col("qs"), 4).as("p95"),
          col("n"))
        .orderBy("l_returnflag")
    }),

    // Approximate percentiles — the 100 TB path for q_percentiles above.
    // approx_percentile is a mergeable Greenwald-Khanna sketch: bounded
    // memory per group with partial+final agg, where exact `percentile`
    // (a TypedImperativeAggregate) buffers every value of a group on one
    // executor. The sketch value is engine-specific, so the gate verifies
    // the GK rank GUARANTEE in-plan instead of the value: each approximate
    // value v is broadcast back over the corpus and rank-counted; the
    // emitted verdict is `ok = rank(v) within p*n ± (2n/accuracy + 2)`
    // (2x for sketch-merge error accumulation, +2 for rank discreteness).
    // The oracle expects every verdict true — an out-of-band value flips
    // the hash and fails the gate. Plan: two scans, one tiny broadcast,
    // no per-group buffering anywhere.
    "q_percentiles_approx" -> ((s, dir) => {
      val acc = 1000 // GK relative rank error <= n/acc per partial
      val ps  = Seq(0.25, 0.5, 0.75, 0.95)
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val probes = li.groupBy(col("l_returnflag"))
        .agg(expr(s"approx_percentile(l_extendedprice, array(${ps.map(_.toString + "D").mkString(",")}), $acc)").as("qs"))
        .select(col("l_returnflag").as("g"), posexplode(col("qs")))
        .select(col("g"),
          element_at(array(ps.map(lit): _*), col("pos") + 1).as("p"),
          col("col").as("v"))
      li.join(broadcast(probes), li("l_returnflag") === probes("g"))
        .groupBy(col("g"), col("p"), col("v"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_extendedprice") < col("v"), 1L).otherwise(0L)).as("c_lt"),
          sum(when(col("l_extendedprice") <= col("v"), 1L).otherwise(0L)).as("c_le"))
        .select(col("g"), col("p"), col("n"),
          (col("c_lt") <= col("p") * col("n") + col("n") * 2.0 / acc + lit(2.0) &&
            col("c_le") >= col("p") * col("n") - col("n") * 2.0 / acc - lit(2.0)).as("ok"))
        .orderBy("g", "p")
    }),

    // Pivot (long -> wide conditional aggregation): Spark's .pivot() with
    // an EXPLICIT value list — without it Spark runs a driver-side distinct
    // scan to discover columns, which is a hidden extra job at scale.
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dbl4(sum(dec(col("o_totalprice")))))
        .withColumnsRenamed(Map("F" -> "sum_f", "O" -> "sum_o", "P" -> "sum_p"))
        .orderBy("o_orderpriority")
    }),

    // Analytic window functions (lag / rank / running sum) — per-customer
    // order history. One hash-partitioned sort per window spec; all three
    // share the same (o_custkey, o_orderdate, o_orderkey) ordering so
    // Catalyst plans ONE Window operator, one shuffle.
    "q_analytics" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast(TimestampNTZType).as("o_orderdate"),
          rank().over(w).cast("long").as("rnk"),
          lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
          dbl4(sum(dec(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .as("running_total"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // Exact distinct aggregation (expands to a two-phase agg in Spark).
    "q_count_distinct" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))
    }),

    // Approximate distinct counting — the 100 TB path for q_count_distinct.
    // approx_count_distinct is HyperLogLog++: a fixed-size mergeable sketch
    // per group (partial+final agg, bounded memory), where exact
    // countDistinct expands into a second shuffle keyed by the VALUE. The
    // HLL estimate is engine-specific, so — like q_percentiles_approx — the
    // gate verifies the accuracy GUARANTEE in-plan (|est − exact| within
    // 5×rsd, generous against the ~rsd standard error; HLL is deterministic
    // for a given input so the verdict is stable) and hash-compares the
    // verdict booleans plus the exact counts, not the estimate.
    "q_approx_distinct" -> ((s, dir) => {
      val rsd = 0.02
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey"), rsd).as("est"),
          countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"))
        .select(col("o_orderstatus"), col("n_custs"), col("n_orders"),
          (abs(col("est") - col("n_custs")).cast("double")
            <= lit(5 * rsd) * col("n_custs")).as("ok"))
        .orderBy(col("o_orderstatus"))
    }),

    // Cube (all subtotal combinations) — Expand + one hash agg, like
    // rollup; orders' dimensions are non-null so the NULL markers identify
    // each grouping set unambiguously in the compare.
    "q_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dbl4(sum(dec(col("o_totalprice")))).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // Explicit grouping sets — the general form rollup/cube specialize;
    // per-dimension marginals without the cross-combinations cube pays for.
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dbl4(sum(dec(col("o_totalprice")))).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // INTERSECT (distinct) — customers holding a BUILDING segment row AND
    // at least one order. Compiles to an aggregate + semi-join pair; at
    // scale prefer the left_semi form (E1) when inputs are already distinct.
    "q_intersect" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
        .intersect(t(s, dir, "orders").select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    }),

    // EXCEPT (distinct) — customers with a finished order but no open one
    // (the set-op rendering of the reference's new-vs-known difference,
    // E1/J3; non-empty at every tested sf, unlike customer∖orders).
    "q_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
        .except(o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    }),

    // Distribution-analytic window functions (ntile / percent_rank /
    // cume_dist / first-last value) — one shared window spec, ONE Window
    // operator, one shuffle; rank-derived doubles are integer quotients,
    // bit-identical across engines.
    "q_window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          first(col("o_orderkey")).over(w).as("cheapest_key"),
          last(col("o_orderkey")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .as("priciest_key"))
        .orderBy("o_orderstatus", "o_totalprice", "o_orderkey")
    }),

    // Null semantics end to end: a nullable key built in-plan (the testdata
    // is null-free), grouped WITH a null group, then re-joined on itself
    // with NULL-SAFE equality (<=> / IS NOT DISTINCT FROM) so the null key
    // matches its own summary row — plus count(col) vs count(*) skew under
    // nulls. A plain equi-join would silently drop the null group.
    "q_null_semantics" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("prio", nullif(col("o_orderpriority"), lit("3-MEDIUM")))
      val all = o.groupBy(col("prio"))
        .agg(count(lit(1)).as("n_all"), count(col("prio")).as("n_nonnull"))
      val fin = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("prio").as("prio_f"))
        .agg(count(lit(1)).as("n_f"))
      all.join(fin, col("prio") <=> col("prio_f"), "left")
        .select(col("prio"), col("n_all"), col("n_nonnull"), col("n_f"))
        .orderBy(col("prio").asc_nulls_first)
    }),

    // NOT IN three-valued logic — the null-aware anti join, the classic
    // silent-wrong-answer surface: `x NOT IN (list)` is never TRUE when x
    // is NULL, and never TRUE for ANY x once the list contains a NULL
    // (the whole predicate collapses to empty — the single most-reported
    // SQL correctness trap). A plain left_anti on equality gets both
    // wrong, so Spark must plan its null-aware anti join for the
    // null-bearing list. Three scalar subqueries pin the three behaviors
    // in one row: meaningful filtering against a null-free list (null
    // probes excluded), the null-list collapse (MUST be 0), and the null
    // probe count the first two silently dropped. SQL text, not DataFrame
    // ops — RewritePredicateSubquery + the NAAJ planning is the surface
    // being graded.
    "q_not_in_null" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("nin_orders")
      s.sql(
        """WITH o AS (
          |  SELECT nullif(o_orderpriority, '3-MEDIUM') AS prio
          |  FROM nin_orders)
          |SELECT
          |  (SELECT count(*) FROM o WHERE prio NOT IN (
          |     SELECT DISTINCT o_orderpriority FROM nin_orders
          |     WHERE o_orderpriority LIKE '1-%'
          |        OR o_orderpriority LIKE '2-%')) AS n_clean,
          |  (SELECT count(*) FROM o WHERE prio NOT IN (
          |     SELECT prio FROM o)) AS n_null_list,
          |  (SELECT count(*) FROM o WHERE prio IS NULL) AS n_probe_null""".stripMargin)
    }),

    // LATERAL correlated-subquery join — per-nation top-2 suppliers where
    // the inner query references the OUTER row (n_nationkey) under its own
    // ORDER BY ... LIMIT. Catalyst cannot run a subquery per outer row at
    // 100 TB; DecorrelateInnerQuery must rewrite the correlated LIMIT into
    // a partitioned window (rank over s_nationkey) + one join — the
    // same shape q_topk_per_group hand-writes, here produced by the
    // OPTIMIZER from the lateral form. Nations without suppliers drop out
    // (inner lateral). Doubles pass through unarithmetic'd, so the hash
    // compare sees the stored bits.
    "q_lateral_topk" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("lat_nation")
      t(s, dir, "supplier").createOrReplaceTempView("lat_supplier")
      s.sql(
        """SELECT n_name, s_name, s_acctbal
          |FROM lat_nation JOIN LATERAL (
          |  SELECT s_name, s_acctbal FROM lat_supplier
          |  WHERE s_nationkey = n_nationkey
          |  ORDER BY s_acctbal DESC, s_name LIMIT 2) t
          |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin)
    }),

    // Date/time arithmetic family (§2h beyond the journal's ISO parse):
    // truncation, month arithmetic (both engines clamp to month end —
    // Jan 31 + 1 month = Feb 29), month-end resolution, day diffs from a
    // fixed epoch, and calendar fields. Functions chosen so Spark and
    // DuckDB agree by DEFINITION (dayofweek is deliberately absent: Spark
    // counts Sunday=1, DuckDB Sunday=0 — an off-by-one the compare would
    // catch but no portable expression avoids cleanly). All pure map,
    // grouped to month grain for a compact deterministic output.
    "q_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          date_trunc("month", col("o_orderdate")).cast(TimestampNTZType).as("month_start"),
          col("o_orderdate"))
        .groupBy(col("month_start"))
        .agg(
          count(lit(1)).as("n"),
          min(add_months(col("o_orderdate").cast("date"), 1)).as("next_month_min"),
          max(last_day(col("o_orderdate").cast("date"))).as("month_end"),
          max(datediff(col("o_orderdate").cast("date"),
            lit("1998-01-01").cast("date"))).cast("long").as("max_days_since"),
          min(quarter(col("o_orderdate"))).cast("long").as("q"),
          min(year(col("o_orderdate"))).cast("long").as("y"))
        .orderBy("month_start")
    }),

    // Unpivot/melt — wide-to-long reshaping (the inverse of q_pivot):
    // four measure columns become (metric, value) rows. Spark's native
    // unpivot is a row-local Expand (4 output rows per input row, no
    // shuffle, no UDTF); values pass through unarithmetic'd so the
    // doubles hash-compare exactly against the oracle's UNION ALL form.
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    }),

    // E2 union (reference Future.reduceLeft(_ ++ _) over per-tenant fetches
    // — GraphQLService.scala:141-150): unionByName of two disjoint slices
    // projected in different column orders (the name-alignment is the op).
    "q_union" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val f = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val p = o.filter(col("o_orderstatus") === "P")
        .select(col("o_totalprice"), col("o_orderkey"), col("o_orderstatus"))
      f.unionByName(p).orderBy(col("o_orderkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_table_profile" -> tableProfileSql,
    "q_histogram" -> histogramSql,
    "q_rfm_segments" -> rfmSegmentsSql,
    "q_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_filter_range" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice >= 1000.0 AND o_totalprice < 5000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_isin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |ORDER BY c_custkey""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
    "q_collect_sorted" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_union" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus IN ('F', 'P') ORDER BY o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.25) AS p25,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.75) AS p75,
        |  quantile_cont(l_extendedprice, 0.95) AS p95,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_percentiles_approx" ->
      """SELECT l_returnflag AS g, CAST(p AS DOUBLE) AS p, count(*) AS n, true AS ok
        |FROM lineitem CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS p) ps
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS sum_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS sum_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS sum_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_analytics" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
        |  rank() OVER w AS rnk,
        |  lag(o_orderkey, 1) OVER w AS prev_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_count_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_approx_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs,
        |  COUNT(*) AS n_orders, true AS ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_intersect" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,
    "q_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY custkey""".stripMargin,
    "q_window_funcs" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  first_value(o_orderkey) OVER w AS cheapest_key,
        |  last_value(o_orderkey) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_key
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_totalprice, o_orderkey""".stripMargin,
    "q_not_in_null" ->
      """WITH o AS (
        |  SELECT nullif(o_orderpriority, '3-MEDIUM') AS prio FROM orders)
        |SELECT
        |  (SELECT count(*) FROM o WHERE prio NOT IN (
        |     SELECT DISTINCT o_orderpriority FROM orders
        |     WHERE o_orderpriority LIKE '1-%'
        |        OR o_orderpriority LIKE '2-%')) AS n_clean,
        |  (SELECT count(*) FROM o WHERE prio NOT IN (
        |     SELECT prio FROM o)) AS n_null_list,
        |  (SELECT count(*) FROM o WHERE prio IS NULL) AS n_probe_null""".stripMargin,
    "q_lateral_topk" ->
      """SELECT n_name, s_name, s_acctbal
        |FROM nation, LATERAL (
        |  SELECT s_name, s_acctbal FROM supplier
        |  WHERE s_nationkey = n_nationkey
        |  ORDER BY s_acctbal DESC, s_name LIMIT 2) t
        |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin,
    "q_date_funcs" ->
      """SELECT date_trunc('month', o_orderdate) AS month_start, count(*) AS n,
        |  min(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)) AS next_month_min,
        |  max(last_day(CAST(o_orderdate AS DATE))) AS month_end,
        |  max(date_diff('day', DATE '1998-01-01', CAST(o_orderdate AS DATE)))
        |    AS max_days_since,
        |  min(quarter(o_orderdate)) AS q,
        |  min(year(o_orderdate)) AS y
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "q_null_semantics" ->
      """WITH o AS (
        |  SELECT *, nullif(o_orderpriority, '3-MEDIUM') AS prio FROM orders),
        |a AS (
        |  SELECT prio, count(*) AS n_all, count(prio) AS n_nonnull
        |  FROM o GROUP BY 1),
        |f AS (
        |  SELECT prio AS prio_f, count(*) AS n_f FROM o
        |  WHERE o_orderstatus = 'F' GROUP BY 1)
        |SELECT prio, n_all, n_nonnull, n_f
        |FROM a LEFT JOIN f ON prio IS NOT DISTINCT FROM prio_f
        |ORDER BY prio ASC NULLS FIRST""".stripMargin
  )
}
