package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampNTZType}

/** Classic TPC-H composite queries over the testdata — the
  * end-to-end shapes that exercise many operators in ONE plan: multi-way
  * joins with selective dimension filters, date-range pushdown, grouped
  * decimal aggregation, top-k ordering. Individually every piece has its
  * own gate; these pin the COMPOSITION Catalyst produces (join order,
  * broadcast choices, partial aggs) against the oracle.
  *
  * Decimal discipline: products like extendedprice×(1−discount) are EXACT
  * decimal arithmetic end to end (see [[discPrice]] — the double-product-
  * then-cast form hits cross-engine half-boundary rounding), summed in
  * decimal so aggregation order cannot move the result, rounded ONCE at
  * the output edge (Spark cast ≡ DuckDB round(), both half-away-from-zero;
  * DuckDB's decimal DOWNCAST is not that — it resolves ties differently —
  * hence round() in the oracles). Averages divide the decimal-exact sum by
  * the count in double (identical inputs → identical quotient). The
  * guarded dbl edge raises if a sum ever leaves the 2^53 exact range.
  */
object TpchQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  private def dbl4(c: Column): Column = graft.DecimalEdge.dbl(c, 4)

  /** price × (1 − discount), EXACT. The double product then per-row cast
    * to decimal is a cross-engine trap: a product can land exactly on a
    * half-boundary at the cast scale, where Spark rounds half-UP and
    * DuckDB half-EVEN — observed flipping q1's sum_charge at sf0.01. So
    * every factor is cast to decimal FIRST (casting the raw stored double
    * is the proven-safe edge) and the multiplication itself is exact
    * decimal arithmetic: (18,4)×(19,4) → decimal(38,8) with no rounding,
    * then a PRECISION-only tightening to (18,8) (values fit — lossless)
    * so a further multiply stays inside precision 38. The only rounding
    * left is ONE final cast of each exact group sum back to scale 4.
    */
  private def discPrice: Column =
    (dec(col("l_extendedprice")) * (dec(lit(1.0)) - dec(col("l_discount"))))
      .cast(DecimalType(18, 8))

  /** discPrice × (1 + tax): (18,8)×(19,4) → decimal(38,12), still exact. */
  private def charge: Column =
    discPrice * (dec(lit(1.0)) + dec(col("l_tax")))

  /** One rounding at the very end: exact decimal sum → scale 4 → guarded
    * double edge. */
  private def sumRounded(c: Column): Column =
    dbl4(sum(c).cast(DecimalType(18, 4)))

  /** Q1: pricing summary report — scan-heavy single-table aggregate, the
    * partial+final hash-agg shape (4 decimal sums, 1 avg, 1 count over ~4
    * groups; at 100 TB this is pure map-side combine + a 4-row shuffle).
    */
  def q1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dbl4(sum(dec(col("l_quantity")))).as("sum_qty"),
        dbl4(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        sumRounded(discPrice).as("sum_disc_price"),
        sumRounded(charge).as("sum_charge"),
        (dbl4(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // the oracle-side renderings of discPrice / charge — identical exact-
  // decimal staging (see discPrice doc): factors cast to scale 4, products
  // exact, precision-only tighten between multiplies
  private val discPriceSql =
    """CAST(CAST(l_extendedprice AS DECIMAL(18,4))
      | * (CAST(1.0 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
      | AS DECIMAL(18,8))""".stripMargin.replace("\n", "")
  private val chargeSql =
    s"""($discPriceSql
       | * (CAST(1.0 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4))))""".stripMargin.replace("\n", "")

  private val q1Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       |  CAST(round(SUM($discPriceSql), 4) AS DOUBLE) AS sum_disc_price,
       |  CAST(round(SUM($chargeSql), 4) AS DOUBLE) AS sum_charge,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q3: shipping-priority top-10 — selective dimension filter (BUILDING
    * customers), fact-to-fact join, grouped revenue, top-k as
    * TakeOrderedAndProject (no global sort materialization). Deterministic
    * tie-break on (o_orderdate, l_orderkey) behind the revenue order.
    *
    * Customer is NOT broadcast-hinted: it grows linearly with scale factor
    * (a ~1/5 segment slice of it still does), so a forced broadcast is
    * wrong at 100 TB. The size-threshold/AQE machinery broadcasts it while
    * it is genuinely small and shuffles it once it is not — exactly the
    * runtime decision this plan should delegate.
    */
  def q3(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp")
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord  = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
    val li   = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"),
        col("o_orderdate").cast(TimestampNTZType).as("o_orderdate"),
        col("o_orderpriority"))
      .agg(sumRounded(discPrice).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    s"""SELECT l_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
      |  o_orderpriority,
      |  CAST(round(SUM($discPriceSql), 4) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin

  /** Q5: local-supplier volume — the 6-table star/snowflake join with a
    * region→nation chain and the c_nationkey = s_nationkey correlation.
    * Only the genuinely BOUNDED dimensions broadcast-hint: nation (25
    * rows) and region (5 rows) are constants of the data model at every
    * scale factor. Customer and supplier grow linearly with SF, so they
    * go through ordinary size-threshold/AQE join selection — broadcast
    * while small, shuffle at scale (a forced broadcast of either is an
    * executor OOM at 100 TB). Orders carries the date range into the scan.
    */
  def q5(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li   = t(s, dir, "lineitem")
    val sup  = t(s, dir, "supplier")
    val nat  = t(s, dir, "nation")
    val reg  = t(s, dir, "region").filter(col("r_name") === "ASIA")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey") &&
        cust("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sumRounded(discPrice).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Sql =
    s"""SELECT n_name,
      |  CAST(round(SUM($discPriceSql), 4) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin

  /** Q4: order-priority checking — the EXISTS-subquery shape. The classic
    * predicate (l_commitdate < l_receiptdate) uses columns the testdata
    * lacks, so the adapted existence predicate is l_returnflag = 'R'; the
    * SHAPE is identical: a date-sliced orders scan semi-joined against a
    * filtered lineitem, counted per priority. EXISTS compiles to
    * left_semi — lineitem contributes each matching orderkey ONCE (no
    * row multiplication, no distinct), and the semi join's build side
    * carries only the join key. At 100 TB both sides shuffle on orderkey;
    * nothing here broadcasts.
    */
  def q4(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-04-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-04-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q18: large-volume customers — the IN-aggregate-subquery shape: orders
    * whose total lineitem quantity exceeds a threshold (the HAVING subquery
    * compiles to an aggregate + semi join), re-joined to lineitem for the
    * quantity sum and to customer for the name, top-100 by price. Quantity
    * sums are exact decimal; the threshold compares the EXACT sum. The
    * final top-100 is TakeOrderedAndProject — no global sort. Customer is
    * not broadcast-hinted (grows with SF; threshold/AQE decides).
    */
  def q18(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty"))
      .filter(col("qty") > lit(250).cast(DecimalType(18, 4)))
      .select(col("l_orderkey").as("big_orderkey"))
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    ord.join(big, ord("o_orderkey") === col("big_orderkey"), "left_semi")
      .join(cust, col("o_custkey") === cust("c_custkey"))
      .join(li, col("o_orderkey") === li("l_orderkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast(TimestampNTZType).as("o_orderdate"),
        col("o_totalprice"))
      .agg(dbl4(sum(dec(col("l_quantity")))).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }

  private val q18Sql =
    """SELECT c_name, c_custkey, o_orderkey,
      |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY 1, 2, 3, 4, 5
      |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin

  /** Q17: small-quantity-order revenue — the CORRELATED SCALAR SUBQUERY
    * shape (the one classic Catalyst surface no other gate exercised):
    * lineitem rows below a per-part quantity threshold computed by a
    * subquery correlated on the OUTER part's key. Catalyst must
    * decorrelate (RewriteCorrelatedScalarSubquery): the subquery becomes
    * one Aggregate over lineitem grouped by the correlation key, joined
    * back — a per-row nested-loop re-scan of a 100 TB fact is the shape
    * this gate exists to forbid (PlanSpec pins the rewrite).
    *
    * The classic threshold `l_quantity < 0.2 * avg(l_quantity)` averages —
    * and Spark's decimal avg (scale+4, half-up) ≠ DuckDB's double avg at
    * the ULP edge, so a boundary row could flip cross-engine. Instead the
    * threshold is the q1 avg_qty pattern: the EXACT decimal sum cast to
    * double, divided by the count — identical IEEE inputs and operations
    * in both engines, so every comparison resolves identically (the
    * predicate is ×5-multiplied through, sparing the 0.2 literal's own
    * representation). The SQL text form (not DataFrame ops) is what makes
    * Catalyst's subquery machinery do the work being graded.
    */
  def q17(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("q17_lineitem")
    t(s, dir, "part").createOrReplaceTempView("q17_part")
    s.sql(
      """SELECT l_extendedprice
        |FROM q17_lineitem, q17_part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#1' AND p_size < 20
        |  AND 5.0 * l_quantity <
        |      (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |              / COUNT(*)
        |       FROM q17_lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
      .agg(
        (dbl4(sum(dec(col("l_extendedprice")))) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  private val q17Sql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
      |    AS avg_yearly,
      |  COUNT(*) AS n_small
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#1' AND p_size < 20
      |  AND 5.0 * l_quantity <
      |      (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
      |              / COUNT(*)
      |       FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** Q21: suppliers who kept orders waiting — the MULTI-KEY correlated
    * EXISTS + NOT EXISTS shape (the one decorrelation surface Q4/Q17/Q18
    * left uncovered): both subqueries correlate on l_orderkey EQUALITY and
    * carry an extra l_suppkey INEQUALITY. RewritePredicateSubquery must
    * compile them to one left_semi and one left_anti join whose condition
    * is the equi-key PLUS the non-equi residual — shuffle-partitionable on
    * orderkey at 100 TB, never a per-row re-scan (PlanSpec pins
    * semi+anti and forbids nested-loop/cartesian). The classic "late"
    * predicate (l_receiptdate > l_commitdate) uses columns the testdata
    * lacks; l_returnflag = 'R' stands in — the decorrelation SHAPE is
    * identical. Supplier carries no broadcast hint (it grows with SF;
    * size-threshold/AQE decides).
    */
  def q21(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "supplier").createOrReplaceTempView("q21_supplier")
    t(s, dir, "lineitem").createOrReplaceTempView("q21_lineitem")
    t(s, dir, "orders").createOrReplaceTempView("q21_orders")
    s.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM q21_supplier, q21_lineitem l1, q21_orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM q21_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM q21_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
  }

  private val q21Sql =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  /** Q13: customer order-count distribution — the OUTER-JOIN-AGGREGATE
    * shape with its classic semantics trap: the selective predicate lives
    * in the LEFT JOIN's ON clause, where it null-extends non-matching
    * customers into the c_count=0 bucket; written as a WHERE it would
    * DROP them and silently delete the zero bucket (the single most
    * common outer-join rewrite mistake — the gate exists to pin the
    * difference). The classic comment-pattern filter uses a column the
    * testdata lacks; an o_orderpriority exclusion stands in, same shape.
    * Two-level aggregate: per-customer count (left outer join, count of
    * the nullable side), then the distribution over counts. Both
    * aggregates shuffle on their keys; nothing broadcasts except what
    * AQE picks at small sf.
    */
  def q13(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders").filter(col("o_orderpriority") =!= "3-MEDIUM")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '3-MEDIUM'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q19: discounted revenue — the DISJUNCTIVE MULTI-BRANCH predicate
    * shape: three OR'd conjunctions, each constraining columns from BOTH
    * join sides (brand/size from part, quantity from lineitem). What makes
    * this a distinct engine surface: Catalyst must keep the equi-join key
    * out of the disjunction (the classic mistake is OR-ing the join
    * condition too, forcing a nested loop) and should push the UNION of
    * each side's branches into that side's scan as an OR filter — the
    * part scan reads only rows matching some branch's brand+size, the
    * lineitem scan only rows in some quantity range, and the full
    * three-way predicate re-applies after the join. At 100 TB the
    * difference between "scan filters rows then join" and "join
    * everything then filter" is the whole game. The classic container/
    * shipmode columns don't exist in the testdata; brand+size+quantity
    * branches preserve the shape.
    */
  def q19(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val pt = t(s, dir, "part")
    def branch(brand: String, qlo: Int, qhi: Int, shi: Int): Column =
      pt("p_brand") === brand &&
        li("l_quantity").between(qlo, qhi) && pt("p_size").between(1, shi)
    li.join(pt, li("l_partkey") === pt("p_partkey") &&
        (branch("Brand#12", 1, 11, 5) ||
          branch("Brand#23", 10, 20, 10) ||
          branch("Brand#3", 20, 30, 15)))
      .agg(sumRounded(discPrice).as("revenue"), count(lit(1)).as("n_items"))
  }

  private val q19Sql =
    s"""SELECT CAST(round(SUM($discPriceSql), 4) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND (
      |     (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
      |      AND p_size BETWEEN 1 AND 5)
      |  OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
      |      AND p_size BETWEEN 1 AND 10)
      |  OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
      |      AND p_size BETWEEN 1 AND 15))""".stripMargin

  /** Q22: global sales opportunity — the UNCORRELATED-SCALAR-SUBQUERY +
    * NOT-EXISTS shape: customers in a key-range slice holding an
    * above-average balance who never placed an urgent order. Two distinct
    * pieces of machinery in one plan: the scalar average compiles to its
    * own one-row aggregate subplan whose result feeds every outer row's
    * comparison (computed ONCE, not per row), and the NOT EXISTS compiles
    * to a left_anti join on custkey. SQL text so Catalyst's subquery
    * rewrite is what's graded. The classic substring(c_phone) country
    * code doesn't exist in the testdata; c_nationkey IN (...) is the same
    * slice shape. The average follows the established cross-engine edge:
    * exact decimal sum cast to double, divided by the count — never a
    * native double avg (order-dependent) or decimal avg (rounding-rule
    * divergent). Nothing here broadcasts by hint; the scalar result and
    * whatever AQE picks at small sf are runtime decisions.
    */
  def q22(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("q22_customer")
    t(s, dir, "orders").createOrReplaceTempView("q22_orders")
    s.sql(
      """SELECT c_nationkey, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        |FROM q22_customer
        |WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        |  AND c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |           / COUNT(*)
        |    FROM q22_customer
        |    WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        |  AND NOT EXISTS (SELECT 1 FROM q22_orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
  }

  private val q22Sql =
    """SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      |  AND c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
      |           / COUNT(*)
      |    FROM customer
      |    WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Q7: volume shipping between two nations — the SYMMETRIC-PAIR join
    * residual: supplier-nation × customer-nation must equal (1,2) or
    * (2,1), an OR that references BOTH dimension branches and so can only
    * resolve after both joins. The at-scale discipline this gate pins:
    * the pair constraint is pre-pushed as an IN filter on EACH nation
    * branch (a 2-row broadcast instead of 25 — at 100 TB the same move
    * keeps the fact rows that survive the dimension joins to the pair's
    * neighborhoods), with the OR residual deciding the pairing on the
    * joined row. Year extraction groups the revenue by shipping year;
    * nation broadcasts are the two genuinely bounded dimensions.
    */
  def q7(s: SparkSession, dir: String): DataFrame = {
    val pair = Seq(1, 2)
    val n1 = t(s, dir, "nation").filter(col("n_nationkey").isin(pair: _*))
      .select(col("n_nationkey").as("s_natkey"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation").filter(col("n_nationkey").isin(pair: _*))
      .select(col("n_nationkey").as("c_natkey"), col("n_name").as("cust_nation"))
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate").between(
        lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n1), sup("s_nationkey") === col("s_natkey"))
      .join(broadcast(n2), cust("c_nationkey") === col("c_natkey"))
      .filter((col("s_natkey") === 1 && col("c_natkey") === 2) ||
        (col("s_natkey") === 2 && col("c_natkey") === 1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sumRounded(discPrice).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Sql =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(round(SUM($discPriceSql), 4) AS DOUBLE) AS revenue
      |FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      |  AND c_nationkey = n2.n_nationkey
      |  AND ((n1.n_nationkey = 1 AND n2.n_nationkey = 2)
      |    OR (n1.n_nationkey = 2 AND n2.n_nationkey = 1))
      |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
      |                     AND TIMESTAMP '1997-12-31'
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Q14: promo revenue — CONDITIONAL AGGREGATION over a join: the CASE
    * branch keeps the exact-decimal discounted price for PROMO-typed
    * parts and contributes an exact zero otherwise, so the promo share is
    * a ratio of two EXACT decimal sums (each also emitted rounded once,
    * for a stronger hash). The ratio divides the two sums in double —
    * identical IEEE inputs and operation in both engines. The LIKE
    * 'PROMO%' prefix matches the testdata's single-word p_type by
    * startswith, exercising the string-predicate pushdown path. One month
    * of lineitem joins part on partkey; part grows with SF, so no
    * broadcast hint — size-threshold/AQE decides.
    */
  def q14(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
    val pt = t(s, dir, "part")
    val zero = lit(0).cast(DecimalType(18, 8))
    val promo = when(pt("p_type").like("PROMO%"), discPrice).otherwise(zero)
    li.join(pt, li("l_partkey") === pt("p_partkey"))
      .agg(
        (dbl4(sum(promo).cast(DecimalType(18, 4))) * 100.0 /
          dbl4(sum(discPrice).cast(DecimalType(18, 4)))).as("promo_pct"),
        sumRounded(promo).as("promo_revenue"),
        sumRounded(discPrice).as("total_revenue"),
        count(lit(1)).as("n_items"))
  }

  private val q14Sql =
    s"""SELECT
      |  CAST(round(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN $discPriceSql
      |                      ELSE CAST(0 AS DECIMAL(18,8)) END), 4) AS DOUBLE)
      |    * 100.0 /
      |  CAST(round(SUM($discPriceSql), 4) AS DOUBLE) AS promo_pct,
      |  CAST(round(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN $discPriceSql
      |                      ELSE CAST(0 AS DECIMAL(18,8)) END), 4) AS DOUBLE)
      |    AS promo_revenue,
      |  CAST(round(SUM($discPriceSql), 4) AS DOUBLE) AS total_revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-09-01'
      |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin

  /** Q2: minimum-cost supplier — the CORRELATED-MIN-IN-WHERE shape (the
    * classic rewrite q17's correlated-avg began): the outer row survives
    * only if its price EQUALS the minimum computed by a subquery that is
    * (a) correlated on the outer part key and (b) itself a 4-table join
    * (lineitem→supplier→nation→region). Catalyst must decorrelate the
    * whole subquery join into ONE aggregate over the region-sliced
    * lineitem grouped by the correlation key, joined back on partkey —
    * a per-outer-row re-execution of a 4-table join over a 100 TB fact
    * is exactly what the PlanSpec forbids. The testdata has no partsupp
    * table, so lineitem stands in for it (l_extendedprice as the cost,
    * l_suppkey as the sourcing link) — the decorrelation SHAPE is the
    * classic one. MIN of a stored double is exact cross-engine (no
    * arithmetic), and the equality compares two identically-stored IEEE
    * values, so no decimal staging is needed. Nation and region are the
    * bounded dimensions → broadcast-hinted; supplier/lineitem are not.
    */
  def q2(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").createOrReplaceTempView("q2_part")
    t(s, dir, "supplier").createOrReplaceTempView("q2_supplier")
    t(s, dir, "lineitem").createOrReplaceTempView("q2_lineitem")
    t(s, dir, "nation").createOrReplaceTempView("q2_nation")
    t(s, dir, "region").createOrReplaceTempView("q2_region")
    s.sql(
      """SELECT /*+ BROADCAST(q2_nation), BROADCAST(q2_region) */
        |  s_acctbal, s_name, n_name, p_partkey, p_brand,
        |  l_extendedprice AS min_price
        |FROM q2_part, q2_supplier, q2_lineitem, q2_nation, q2_region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size < 8 AND p_type = 'STANDARD'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND l_extendedprice = (
        |    SELECT MIN(l2.l_extendedprice)
        |    FROM q2_lineitem l2, q2_supplier s2, q2_nation n2, q2_region r2
        |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'ASIA')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin)
  }

  private val q2Sql =
    """SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
      |  l_extendedprice AS min_price
      |FROM part, supplier, lineitem, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND p_size < 8 AND p_type = 'STANDARD'
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND l_extendedprice = (
      |    SELECT MIN(l2.l_extendedprice)
      |    FROM lineitem l2, supplier s2, nation n2, region r2
      |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'ASIA')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** Q20: potential part promotion — the DOUBLY-NESTED decorrelation
    * shape: an IN subquery whose body contains BOTH a second (uncorrelated)
    * IN against the part slice AND a scalar subquery correlated on TWO
    * keys of the enclosing derived table. Catalyst has to (1) compile the
    * outer IN to a semi join on suppkey, (2) the inner IN to a semi join
    * on partkey, and (3) decorrelate the two-key scalar sum into one
    * aggregate over the date-sliced lineitem grouped by (partkey,
    * suppkey), joined back on both keys — three rewrites stacked in one
    * plan, every result equi-join shuffleable at 100 TB (PlanSpec forbids
    * nested-loop/cartesian fallbacks). No partsupp in the testdata:
    * "availability" is the early-window quantity sum per (part, supplier)
    * and the threshold is the late-window sum — `avail × 2 >` spares the
    * classic 0.5 literal any representation question, and both sides are
    * EXACT decimal sums compared without rounding (a pair with no late
    * shipments compares against NULL → excluded, the classic bare-subquery
    * semantics, identical in both engines). Nation is bounded → hinted;
    * supplier is not.
    */
  def q20(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").createOrReplaceTempView("q20_part")
    t(s, dir, "supplier").createOrReplaceTempView("q20_supplier")
    t(s, dir, "lineitem").createOrReplaceTempView("q20_lineitem")
    t(s, dir, "nation").createOrReplaceTempView("q20_nation")
    s.sql(
      """SELECT /*+ BROADCAST(q20_nation) */ s_name, s_acctbal
        |FROM q20_supplier, q20_nation
        |WHERE s_suppkey IN (
        |  SELECT ps.suppkey FROM (
        |    SELECT l_partkey AS pk, l_suppkey AS suppkey,
        |           SUM(CAST(l_quantity AS DECIMAL(18,4))) AS avail
        |    FROM q20_lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |    GROUP BY 1, 2) ps
        |  WHERE ps.pk IN (SELECT p_partkey FROM q20_part
        |                  WHERE p_type = 'ECONOMY' AND p_size < 25)
        |    AND ps.avail * 2 > (
        |      SELECT SUM(CAST(l_quantity AS DECIMAL(18,4)))
        |      FROM q20_lineitem l2
        |      WHERE l2.l_partkey = ps.pk AND l2.l_suppkey = ps.suppkey
        |        AND l2.l_shipdate >= TIMESTAMP '1998-01-01'))
        |  AND s_nationkey = n_nationkey AND n_regionkey = 2
        |ORDER BY s_name""".stripMargin)
  }

  private val q20Sql =
    """SELECT s_name, s_acctbal
      |FROM supplier, nation
      |WHERE s_suppkey IN (
      |  SELECT ps.suppkey FROM (
      |    SELECT l_partkey AS pk, l_suppkey AS suppkey,
      |           SUM(CAST(l_quantity AS DECIMAL(18,4))) AS avail
      |    FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
      |    GROUP BY 1, 2) ps
      |  WHERE ps.pk IN (SELECT p_partkey FROM part
      |                  WHERE p_type = 'ECONOMY' AND p_size < 25)
      |    AND ps.avail * 2 > (
      |      SELECT SUM(CAST(l_quantity AS DECIMAL(18,4)))
      |      FROM lineitem l2
      |      WHERE l2.l_partkey = ps.pk AND l2.l_suppkey = ps.suppkey
      |        AND l2.l_shipdate >= TIMESTAMP '1998-01-01'))
      |  AND s_nationkey = n_nationkey AND n_regionkey = 2
      |ORDER BY s_name""".stripMargin

  /** Q6: forecasting revenue change — the PURE-SCAN aggregate: three
    * range predicates on one table, no join, two aggregates. The entire
    * query should collapse to a parquet scan with every predicate in
    * PushedFilters feeding a partial+final agg over ONE output row — at
    * 100 TB this is the query whose cost is exactly "read the pruned
    * row groups once". revenue = price×discount is exact decimal:
    * (18,4)×(18,4) → (37,8) with no rounding, summed exact, rounded
    * once at the edge. The discount bounds compare stored doubles
    * against the same literals in both engines — no arithmetic, no ULP
    * hazard.
    */
  def q6(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        sumRounded(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))

  private val q6Sql =
    """SELECT
      |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |                 * CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)
      |    AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Q8: national market share — the widest join in the suite (7 tables,
    * nation twice in different roles) feeding a RATIO-OF-CONDITIONAL-SUMS
    * aggregate: the share of yearly volume supplied by one nation, where
    * the numerator keeps rows by a post-join CASE on the SUPPLIER-side
    * nation while the REGION slice filters on the CUSTOMER-side nation
    * chain. Both sums are exact decimal (q14's zero-else CASE pattern),
    * emitted rounded for the hash plus divided in double for the share.
    * Broadcast discipline: both nation roles and region are bounded →
    * hinted; part/customer/supplier/orders grow with SF → size-threshold/
    * AQE decides (the r9 lesson, inverted into PlanSpec).
    */
  def q8(s: SparkSession, dir: String): DataFrame = {
    val pt = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val cust = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("c_natkey"), col("n_regionkey"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("s_natkey"), col("n_name").as("supp_nation"))
    val reg = t(s, dir, "region").filter(col("r_name") === "AMERICA")
    val zero = lit(0).cast(DecimalType(18, 8))
    val natVol = when(col("supp_nation") === "NATION_2", discPrice).otherwise(zero)
    li.join(pt, li("l_partkey") === pt("p_partkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n1), cust("c_nationkey") === col("c_natkey"))
      .join(broadcast(reg), col("n_regionkey") === reg("r_regionkey"))
      .join(broadcast(n2), sup("s_nationkey") === col("s_natkey"))
      .groupBy(year(ord("o_orderdate")).as("o_year"))
      .agg(
        (dbl4(sum(natVol).cast(DecimalType(18, 4))) /
          dbl4(sum(discPrice).cast(DecimalType(18, 4)))).as("mkt_share"),
        sumRounded(natVol).as("nation_volume"),
        sumRounded(discPrice).as("total_volume"))
      .orderBy("o_year")
  }

  private val q8Sql =
    s"""SELECT year(o_orderdate) AS o_year,
      |  CAST(round(SUM(CASE WHEN n2.n_name = 'NATION_2' THEN $discPriceSql
      |                      ELSE CAST(0 AS DECIMAL(18,8)) END), 4) AS DOUBLE)
      |    /
      |  CAST(round(SUM($discPriceSql), 4) AS DOUBLE) AS mkt_share,
      |  CAST(round(SUM(CASE WHEN n2.n_name = 'NATION_2' THEN $discPriceSql
      |                      ELSE CAST(0 AS DECIMAL(18,8)) END), 4) AS DOUBLE)
      |    AS nation_volume,
      |  CAST(round(SUM($discPriceSql), 4) AS DOUBLE) AS total_volume
      |FROM part, supplier, lineitem, orders, customer,
      |     nation n1, nation n2, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |  AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
      |  AND o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND p_type = 'ECONOMY'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q9: product-type profit — the LIKE-sliced 5-table join grouped on
    * BOTH a dimension attribute and a derived year, with a SUBTRACTION
    * inside the aggregate: profit = discounted revenue − sourcing cost.
    * No partsupp in the testdata, so cost is p_retailprice × l_quantity
    * (the same "cost rides the part dimension onto each lineitem" shape
    * as ps_supplycost; profits go negative, which is fine — the gate
    * compares sums, not signs). All arithmetic exact decimal: the cost
    * product (18,4)×(18,4) → (37,8) tightened losslessly to (18,8),
    * subtracted from the (18,8) discPrice exactly, summed exact,
    * rounded once. The '%red%' infix LIKE cannot prefix-prune — it
    * rides the part scan as a residual filter, which is the honest shape
    * for an infix match at any scale.
    */
  def q9(s: SparkSession, dir: String): DataFrame = {
    val pt = t(s, dir, "part").filter(col("p_name").like("%red%"))
    val li = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    val ord = t(s, dir, "orders")
    val nat = t(s, dir, "nation")
    val cost = (dec(col("p_retailprice")) * dec(col("l_quantity")))
      .cast(DecimalType(18, 8))
    val amount = discPrice - cost
    li.join(pt, li("l_partkey") === pt("p_partkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sumRounded(amount).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  private val q9Sql =
    s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
      |  CAST(round(SUM($discPriceSql
      |    - CAST(CAST(p_retailprice AS DECIMAL(18,4))
      |           * CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,8))),
      |    4) AS DOUBLE) AS sum_profit
      |FROM part, supplier, lineitem, orders, nation
      |WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |  AND p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** Q10: returned-item reporting — one quarter of orders joined to the
    * 'R'-sliced lineitem, grouped PER CUSTOMER (the high-cardinality
    * grouping in the suite: |customers| keys, vs q1's 4 and q8's years),
    * top-20 by revenue. The shape this pins at 100 TB: both fact filters
    * reach their scans, the customer join shuffles (no hint — customer
    * grows with SF), the per-customer agg is partial+final on custkey,
    * and the top-20 is TakeOrderedAndProject — never a global sort of
    * |customers| rows. Nation rides on the end as a bounded broadcast.
    */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val nat = t(s, dir, "nation")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sumRounded(discPrice).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Sql =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(round(SUM($discPriceSql), 4) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-10-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q11: important stock — the HAVING-OVER-SCALAR-SUBQUERY shape: a
    * grouped sum kept only where it exceeds a fraction of the SAME sum
    * computed globally by an uncorrelated scalar subquery. Catalyst
    * compiles the scalar to its own subplan evaluated ONCE and feeds the
    * result into the post-aggregate filter — the gate pins that the
    * nation-sliced lineitem⋈supplier pipeline appears twice (group-keyed
    * and global) rather than once-per-group. No partsupp: lineitem's
    * price stands in for supplycost×availqty (q2/q20 convention). The
    * threshold compares in double (exact decimal sums cast — identical
    * IEEE inputs both engines) with the fraction as ×1000 on the LEFT so
    * no 0.001 literal ever needs a representation. SQL text so the
    * subquery rewrite is what's graded; supplier carries no hint (grows
    * with SF). BOUND (unlike the DecimalEdge.dbl-guarded sums elsewhere,
    * these casts are unguarded by design — SQL text): double loses
    * bit-exactness past 2^53, i.e. a global scale-4 revenue sum above
    * ~9.0e11 — about SF 100 on this data; far beyond any gate SF, and at
    * cluster scale the compare should move to DECIMAL outright.
    */
  def q11(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("q11_lineitem")
    t(s, dir, "supplier").createOrReplaceTempView("q11_supplier")
    s.sql(
      """SELECT l_partkey AS ps_partkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS part_value
        |FROM q11_lineitem, q11_supplier
        |WHERE l_suppkey = s_suppkey AND s_nationkey = 7
        |GROUP BY l_partkey
        |HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |       * 1000.0 > (
        |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |  FROM q11_lineitem, q11_supplier
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = 7)
        |ORDER BY part_value DESC, ps_partkey""".stripMargin)
  }

  private val q11Sql =
    """SELECT l_partkey AS ps_partkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
      |    AS part_value
      |FROM lineitem, supplier
      |WHERE l_suppkey = s_suppkey AND s_nationkey = 7
      |GROUP BY l_partkey
      |HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
      |       * 1000.0 > (
      |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
      |  FROM lineitem, supplier
      |  WHERE l_suppkey = s_suppkey AND s_nationkey = 7)
      |ORDER BY part_value DESC, ps_partkey""".stripMargin

  /** Q12: shipping-mode priority counts — the TWO-WAY CONDITIONAL COUNT
    * over a fact-fact join: per mode, how many lines belong to
    * high-priority orders vs not, as complementary CASE sums (their total
    * is the join's row count — a free self-check the oracle hashes). The
    * testdata has no l_shipmode; l_returnflag's two-value slice ('A','N')
    * is the stand-in mode column, same shape: an IN filter + date range
    * on the fact scan, an orderkey shuffle join (neither side bounded →
    * no hints), a 2-group agg whose CASE reads the OTHER side's column —
    * the conditional can only resolve post-join.
    */
  def q12(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
      .filter(col("l_returnflag").isin("A", "N") &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ord.join(li, ord("o_orderkey") === li("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  private val q12Sql =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey
      |  AND l_returnflag IN ('A', 'N')
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q15: top supplier — the SHARED-CTE + SCALAR-MAX shape: a quarterly
    * per-supplier revenue aggregate referenced TWICE (as the join input
    * and inside the scalar MAX subquery), keeping exactly the suppliers
    * whose revenue equals the maximum. The equality compares the EXACT
    * decimal sums — no rounding before the compare, so cross-engine ties
    * are impossible to miscount; the rounded double appears only in the
    * output. At 100 TB the revenue CTE is one suppkey-shuffled aggregate
    * and the MAX is a 1-row all-reduce over its |suppliers| output —
    * Catalyst plans the CTE subtree twice (or reuses the exchange under
    * AQE), never once-per-row. SQL text so the scalar-subquery machinery
    * is what's graded.
    */
  def q15(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("q15_lineitem")
    t(s, dir, "supplier").createOrReplaceTempView("q15_supplier")
    s.sql(
      s"""WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM($discPriceSql) AS total_rev
        |  FROM q15_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  CAST(round(total_rev, 4) AS DOUBLE) AS total_revenue
        |FROM q15_supplier, revenue
        |WHERE s_suppkey = supplier_no
        |  AND total_rev = (SELECT MAX(total_rev) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin)
  }

  private val q15Sql =
    s"""WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM($discPriceSql) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name,
      |  CAST(round(total_rev, 4) AS DOUBLE) AS total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_rev = (SELECT MAX(total_rev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** Q16: parts/supplier relationship — COUNT DISTINCT over a
    * DISTINCT-projected fact (lineitem's (partkey, suppkey) pairs stand
    * in for partsupp — q2/q20 convention) with an exclusion subquery.
    * The classic text says NOT IN; here it is NOT EXISTS deliberately:
    * the keys are non-null so the semantics are identical, but NOT IN
    * compiles to a null-aware anti join that can ONLY broadcast its
    * build side — and the "complaint supplier" slice grows with SF, so
    * that plan is the r9 broadcast defect in disguise. NOT EXISTS
    * compiles to a plain left_anti, shuffleable on suppkey at any scale
    * (the null-aware surface itself is pinned by q_not_in_null). Two
    * dedups stack: the DISTINCT pair projection, then COUNT(DISTINCT
    * suppkey) per (brand, type, size) — partial aggs handle both without
    * ever materializing the raw join.
    */
  def q16(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("q16_lineitem")
    t(s, dir, "part").createOrReplaceTempView("q16_part")
    t(s, dir, "supplier").createOrReplaceTempView("q16_supplier")
    s.sql(
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM q16_lineitem) ps,
        |     q16_part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#3' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND NOT EXISTS (SELECT 1 FROM q16_supplier
        |                  WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps, part
      |WHERE p_partkey = l_partkey
      |  AND p_brand <> 'Brand#3' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND NOT EXISTS (SELECT 1 FROM supplier
      |                  WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q6" -> (q6(_, _)),
    "q_tpch_q8" -> (q8(_, _)),
    "q_tpch_q9" -> (q9(_, _)),
    "q_tpch_q10" -> (q10(_, _)),
    "q_tpch_q11" -> (q11(_, _)),
    "q_tpch_q12" -> (q12(_, _)),
    "q_tpch_q15" -> (q15(_, _)),
    "q_tpch_q16" -> (q16(_, _)),
    "q_tpch_q2" -> (q2(_, _)),
    "q_tpch_q20" -> (q20(_, _)),
    "q_tpch_q1" -> (q1(_, _)),
    "q_tpch_q7" -> (q7(_, _)),
    "q_tpch_q14" -> (q14(_, _)),
    "q_tpch_q19" -> (q19(_, _)),
    "q_tpch_q22" -> (q22(_, _)),
    "q_tpch_q13" -> (q13(_, _)),
    "q_tpch_q3" -> (q3(_, _)),
    "q_tpch_q4" -> (q4(_, _)),
    "q_tpch_q5" -> (q5(_, _)),
    "q_tpch_q17" -> (q17(_, _)),
    "q_tpch_q18" -> (q18(_, _)),
    "q_tpch_q21" -> (q21(_, _)))

  val oracles: Map[String, String] = Map(
    "q_tpch_q6" -> q6Sql,
    "q_tpch_q8" -> q8Sql,
    "q_tpch_q9" -> q9Sql,
    "q_tpch_q10" -> q10Sql,
    "q_tpch_q11" -> q11Sql,
    "q_tpch_q12" -> q12Sql,
    "q_tpch_q15" -> q15Sql,
    "q_tpch_q16" -> q16Sql,
    "q_tpch_q2" -> q2Sql,
    "q_tpch_q20" -> q20Sql,
    "q_tpch_q1" -> q1Sql,
    "q_tpch_q7" -> q7Sql,
    "q_tpch_q14" -> q14Sql,
    "q_tpch_q19" -> q19Sql,
    "q_tpch_q22" -> q22Sql,
    "q_tpch_q13" -> q13Sql,
    "q_tpch_q3" -> q3Sql,
    "q_tpch_q4" -> q4Sql,
    "q_tpch_q5" -> q5Sql,
    "q_tpch_q17" -> q17Sql,
    "q_tpch_q18" -> q18Sql,
    "q_tpch_q21" -> q21Sql)
}
