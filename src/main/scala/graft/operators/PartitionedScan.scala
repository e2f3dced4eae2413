package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-pruning gates — the scan-reduction lever that matters most at
  * 100 TB and that the flat testdata never exercises: a corpus laid out as
  * `lang=<v>/part-*.parquet` (Hive-style partitioning, the standard layout
  * for Delta/Iceberg/plain-parquet lakes) must let
  *
  *  1. a literal predicate on the partition column prune directories at
  *     PLAN time (static pruning: `PartitionFilters` on the scan — pruned
  *     partitions are never listed, opened, or scheduled), and
  *  2. a selective dimension join prune them at RUN time (dynamic
  *     partition pruning: the dim side's build result is injected into the
  *     fact scan's partition filters as a `dynamicpruning` expression —
  *     the plan shape behind every star-schema query over a partitioned
  *     fact).
  *
  * Both gates hash-match DuckDB oracles recomputed from the flat parquet
  * (values must be IDENTICAL to an unpartitioned scan — pruning is a
  * performance contract, not a semantic one); PlanSpec pins the pruning
  * itself, which a correctness compare cannot see.
  */
object PartitionedScan {

  import JournalGate.{fixtureRoot, writeOnce}

  /** Documents re-laid-out Hive-style, once per testdata dir: partitioned
    * by `lang` (5 values — low-cardinality partition keys are the correct
    * choice; per-doc keys would mint millions of directories, the classic
    * over-partitioning failure).
    */
  private[operators] def partitionedDocs(s: SparkSession, dir: String): java.nio.file.Path =
    writeOnce(fixtureRoot("partdocs", dir)) { tmp =>
      Tables.load(s, dir, "documents")
        .repartition(2, col("lang"))
        .write.partitionBy("lang").parquet(tmp.toString)
    }

  /** Static pruning: a literal filter on the partition column. The scan
    * must list ONLY `lang=en/` (PlanSpec asserts the PartitionFilters and
    * that data filters do NOT contain the lang predicate — it never
    * reaches row evaluation); the aggregate values must equal the flat
    * oracle's exactly.
    */
  def partitionPruned(s: SparkSession, dir: String): DataFrame = {
    val root = partitionedDocs(s, dir)
    s.read.parquet(root.toString)
      .filter(col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("source")
  }

  private val partitionPrunedSql =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE lang = 'en'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Dynamic partition pruning: the langs to keep arrive as a FILTERED
    * DIMENSION (unknowable at plan time), joined on the partition column.
    * With the dim side broadcast, Spark reuses its build result as a
    * runtime partition filter on the fact scan — only `lang=en/` and
    * `lang=fr/` are ever read. The dim is built in-plan from the flat
    * table (deterministic), so the oracle replays the same join on
    * parquet.
    */
  def dppJoin(s: SparkSession, dir: String): DataFrame = {
    val root = partitionedDocs(s, dir)
    val fact = s.read.parquet(root.toString)
    val dim = Tables.load(s, dir, "documents")
      .select(col("lang")).distinct()
      .filter(col("lang").isin("en", "fr"))
    fact.join(broadcast(dim), "lang")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")
  }

  private val dppJoinSql =
    """SELECT d.lang, count(*) AS n_docs,
      |  CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
      |FROM documents d
      |JOIN (SELECT DISTINCT lang FROM documents
      |      WHERE lang IN ('en', 'fr')) k USING (lang)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Documents re-shaped with log-style NESTING, once per testdata dir:
    * the scalar metadata moves into a `meta` struct (with a doubly-nested
    * `quality` struct), the payload stays top-level — the shape every
    * event/crawl log has.
    */
  private[operators] def nestedDocs(s: SparkSession, dir: String): java.nio.file.Path =
    writeOnce(fixtureRoot("nesteddocs", dir)) { tmp =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          struct(col("lang"), col("source"),
            struct(col("n_chars")).as("quality")).as("meta"),
          col("text"))
        .repartition(2, col("doc_id"))
        .write.parquet(tmp.toString)
    }

  /** Nested-schema pruning: a query touching `meta.lang` and
    * `meta.quality.n_chars` must leave `text` (the corpus's bulk — the
    * payload column is ~99% of the bytes) and the untouched `meta.source`
    * OUT of the parquet ReadSchema. Without the prune, every subfield
    * access drags the whole struct + row through IO; PlanSpec pins the
    * ReadSchema, this gate pins the values.
    */
  def nestedPrune(s: SparkSession, dir: String): DataFrame = {
    val root = nestedDocs(s, dir)
    s.read.parquet(root.toString)
      .groupBy(col("meta.lang").as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("meta.quality.n_chars")).as("sum_chars"))
      .orderBy("lang")
  }

  private val nestedPruneSql =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_partition_pruned" -> (partitionPruned(_, _)),
    "q_dpp_join" -> (dppJoin(_, _)),
    "q_nested_prune" -> (nestedPrune(_, _)))

  val oracles: Map[String, String] = Map(
    "q_partition_pruned" -> partitionPrunedSql,
    "q_dpp_join" -> dppJoinSql,
    "q_nested_prune" -> nestedPruneSql)
}
