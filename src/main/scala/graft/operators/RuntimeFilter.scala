package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Runtime bloom-filter join pruning — the non-partition-column analog of
  * dynamic partition pruning (X43) and the third of Spark's three runtime
  * scan-reduction levers (static prune / DPP / row-level runtime filter).
  *
  * The shape: a SELECTIVE dimension (orders sliced to one priority +
  * a date window) joins a fact (lineitem) on a key that is NOT a
  * partition column, so DPP cannot help and the naive plan shuffles the
  * ENTIRE fact just to discard ~95% of it at the join. Catalyst's
  * InjectRuntimeFilter instead aggregates the dim's join keys into a
  * bloom filter (`bloom_filter_agg`, a one-row subquery) and plants
  * `might_contain(bloom, xxhash64(l_orderkey))` on the fact BELOW its
  * exchange — fact rows whose key cannot match are dropped before they
  * are ever hashed, serialized, or shuffled. At 100 TB this turns a
  * full-fact shuffle into a matching-neighborhood shuffle for every
  * selective star join on a non-partition key; false positives cost one
  * wasted shuffle row, never correctness (the equi join re-checks).
  *
  * The injection is a RUNTIME decision read from session confs at
  * execution time, so the gate executes EAGERLY (localCheckpoint) inside
  * the conf scope and restores the session after — the returned frame
  * carries materialized rows. The thresholds exist because building +
  * broadcasting a bloom costs real work: production defaults only fire
  * when the application side is huge (10 GB+) and the creation side
  * small; the gate lowers the application floor to exercise the path at
  * test scale. PlanSpec pins the plan shape (bloom agg subquery,
  * might_contain below the fact's exchange); this gate pins that values
  * are EXACTLY the plain join's (a bloom that dropped a true match would
  * hash-fail).
  */
object RuntimeFilter {

  private def withConfs[T](s: SparkSession, kv: (String, String)*)(f: => T): T = {
    val prev = kv.map { case (k, _) => k -> s.conf.getOption(k) }
    kv.foreach { case (k, v) => s.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  private[graft] val bloomConfs: Seq[(String, String)] = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // production floor is 10 GB of application-side scan — the lever only
    // pays off against a big fact; 0 exercises the path at test scale
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    // broadcast would hide the point (the bloom prunes SHUFFLE input);
    // force the shuffle join the 100 TB plan would use
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  /** The lazy plan, for PlanSpec to inspect under the conf scope. */
  private[graft] def bloomJoinPlan(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.load(s, dir, "lineitem")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        graft.DecimalEdge.dbl(
          sum(col("l_extendedprice").cast(DecimalType(18, 4))), 4).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")
  }

  def bloomJoin(s: SparkSession, dir: String): DataFrame =
    withConfs(s, bloomConfs: _*) {
      // executes HERE, while the confs hold; the session is restored
      // before any other gate plans against it
      bloomJoinPlan(s, dir).localCheckpoint()
    }

  private val bloomJoinSql =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
      |    AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bloom_join" -> (bloomJoin(_, _)))

  val oracles: Map[String, String] = Map(
    "q_bloom_join" -> bloomJoinSql)
}
