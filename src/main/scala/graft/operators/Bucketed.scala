package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bucketed (pre-partitioned) tables and the shuffle-free co-located join
  * over them — the physical-layout lever SURVEY §2's Spark-mapping notes
  * keep pointing at ("bucketing for co-located joins").
  *
  * The idea at 100 TB: a fact-to-fact equi-join (orders ⋈ lineitem on
  * orderkey) normally shuffles BOTH sides on the key — the single largest
  * data movement in the plan. Writing both tables bucketed by the join key
  * into the same bucket count moves that shuffle to WRITE time, once; every
  * subsequent join of the two tables reads bucket i against bucket i with
  * no exchange at all (Spark's bucketed scan reports the hash-partitioned
  * output partitioning, and EnsureRequirements inserts nothing). Re-used
  * across queries, this is the warehouse-layout decision that pays for
  * itself on the first repeated join.
  *
  * The gate writes both tables bucketed (8 buckets, one sorted file per
  * bucket), joins them, and aggregates; the oracle replays the same join
  * over the RAW parquet — so row loss, duplication, or bucket-routing
  * errors in the write path all flip the compare. PlanSpec separately
  * asserts the join subtree contains NO shuffle exchange with broadcast
  * disabled (the property row counts cannot see).
  */
object Bucketed {

  private val NumBuckets = 8

  private def ident(dir: String): String =
    dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** Ensure `src` from `dir` exists as a bucketed catalog table in THIS
    * session; returns the table name. Data lands under /tmp keyed by the
    * sf dir and bucket spec (a pure function of the testdata, so existing
    * files are REUSED, never deleted — the same build-staged/promote-by-
    * rename discipline as JournalGate.writeOnce: each writer stages into
    * its own unique .building.<id> path and promotes by rename, so a
    * concurrent JVM can never observe a half-written or vanishing table;
    * a crash mid-write leaves only an orphan staging dir under /tmp).
    * The catalog entry is per-session: later sessions register an
    * external table over the promoted directory.
    *
    * The write is `repartition(NumBuckets, key)` first so each bucket is
    * ONE file: Spark only trusts the per-bucket sort order (and can skip
    * the join's sort) when a bucket holds a single file.
    */
  def ensureBucketed(s: SparkSession, dir: String, src: String,
                     key: String): String = synchronized {
    val table = s"graft_${src}_b${NumBuckets}_${ident(dir)}"
    if (!s.catalog.tableExists(table)) {
      val path = new java.io.File(s"/tmp/graft_bucketed_${ident(dir)}/$table")
      val df = Tables.load(s, dir, src).repartition(NumBuckets, col(key))
      if (!path.exists()) {
        // Stage into a PER-JVM unique path: a fixed shared staging dir lets
        // a second JVM racing on first build deleteQuietly/overwrite the
        // first one's in-progress files, so the loser's rename could
        // promote a directory of partial part-files. With a unique path
        // each writer only ever promotes its OWN complete output; the
        // loser of the rename race deletes its copy. A crashed build
        // leaves an orphan .building.<id> under /tmp — never reused, never
        // promoted.
        val staging = new java.io.File(
          path.getPath + ".building." + java.util.UUID.randomUUID().toString.take(8))
        // stage the bucket-encoded files via a throwaway table
        // registration (only saveAsTable writes bucketed layout), drop
        // the registration (external: files stay), promote atomically
        val stagingTable = table + "_staging"
        s.sql(s"DROP TABLE IF EXISTS $stagingTable")
        df.write
          .bucketBy(NumBuckets, key).sortBy(key)
          .option("path", staging.getPath)
          .mode("overwrite").format("parquet")
          .saveAsTable(stagingTable)
        s.sql(s"DROP TABLE IF EXISTS $stagingTable")
        if (!staging.renameTo(path)) {
          // lost a concurrent race: the winner's identical files stand
          org.apache.commons.io.FileUtils.deleteQuietly(staging)
        }
      }
      s.sql(s"CREATE TABLE $table (${df.schema.toDDL}) USING PARQUET " +
        s"CLUSTERED BY ($key) SORTED BY ($key) INTO $NumBuckets BUCKETS " +
        s"LOCATION '${path.getPath}'")
    }
    table
  }

  /** The co-located join: bucketed orders ⋈ bucketed lineitem on orderkey,
    * then a grouped aggregate. The join itself needs no exchange (bucket i
    * meets bucket i); the only shuffle in the plan is the aggregate's.
    */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val o = s.table(ensureBucketed(s, dir, "orders", "o_orderkey"))
    val l = s.table(ensureBucketed(s, dir, "lineitem", "l_orderkey"))
    join(o, l)
  }

  /** The join+agg shape, factored so PlanSpec can run it over its own
    * tiny bucketed tables. */
  def join(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
      .groupBy(col("o_orderstatus"), col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        graft.DecimalEdge.dbl(sum(col("l_quantity").cast(DecimalType(18, 4))), 4)
          .as("sum_qty"))
      .orderBy("o_orderstatus", "l_returnflag")

  private val bucketedJoinSql =
    """SELECT o_orderstatus, l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bucketed_join" -> (bucketedJoin(_, _)))

  val oracles: Map[String, String] = Map(
    "q_bucketed_join" -> bucketedJoinSql)
}
