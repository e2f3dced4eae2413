package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from per-module registries so each
  * operator family lives next to its implementation.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-join + aggregate: lineitem ⋈ orders ⋈ customer with the dimension
    * sides broadcast — exercises scan, pushdown, broadcast join, hash agg.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem")
    val o  = Tables.load(spark, dir, "orders")
    val c  = Tables.load(spark, dir, "customer")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_lines"), sum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.TypedAgg.queries ++
      operators.TpchQueries.queries ++
      operators.ZOrder.queries ++
      operators.Bucketed.queries ++
      operators.WarehouseQueries.queries ++
      operators.TextOps.queries ++
      operators.Similarity.queries ++
      operators.EventWindows.queries ++
      operators.AsofJoin.queries ++
      operators.RangeJoin.queries ++
      operators.Skew.queries ++
      operators.JournalGate.queries ++
      operators.CorpusSourceGate.queries ++
      operators.PartitionedScan.queries ++
      operators.Compaction.queries ++
      operators.RuntimeFilter.queries ++
      operators.SyncGate.queries ++
      operators.Graph.queries ++
      operators.Unigram.queries ++
      multimodal.Multimodal.queries

  /** Shared SPARK_GRAFT_ONLY handling for the Verify/Bench mains:
    * comma-separated query names select a subset; unknown names throw
    * (a typo'd name silently selecting nothing reads as an instantly
    * green/fast run).
    */
  def selectedQueries(onlyEnv: Option[String]): Map[String, (SparkSession, String) => DataFrame] =
    onlyEnv.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet) match {
      case Some(sel) =>
        val unknown = sel -- queries.keySet
        require(unknown.isEmpty,
          s"unknown SPARK_GRAFT_ONLY queries: ${unknown.toSeq.sorted.mkString(", ")}")
        queries.filter { case (n, _) => sel(n) }
      case None => queries
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.TypedAgg.oracles ++
      operators.TpchQueries.oracles ++
      operators.ZOrder.oracles ++
      operators.Bucketed.oracles ++
      operators.WarehouseQueries.oracles ++
      operators.TextOps.oracles ++
      operators.Similarity.oracles ++
      operators.EventWindows.oracles ++
      operators.AsofJoin.oracles ++
      operators.RangeJoin.oracles ++
      operators.Skew.oracles ++
      operators.JournalGate.oracles ++
      operators.CorpusSourceGate.oracles ++
      operators.PartitionedScan.oracles ++
      operators.Compaction.oracles ++
      operators.RuntimeFilter.oracles ++
      operators.SyncGate.oracles ++
      operators.Graph.oracles ++
      operators.Unigram.oracles ++
      multimodal.Multimodal.oracles
}
