package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Two paths, as a 100 TB ANN stack needs both:
  *   - `cosineTopK`: exact brute-force top-k for a small query set — the
  *     correctness baseline. The query side is tiny and BROADCAST; the corpus
  *     side streams through codegen'd array arithmetic (zip_with/aggregate
  *     folds — no UDF, no collect); per-query top-k is a rank-filter window.
  *   - at scale the corpus side stays partitioned, per-partition work is a
  *     scan + k-sized heap (TakeOrderedAndProject after the window filter);
  *     nothing materializes the full similarity matrix for a bounded query
  *     set. For corpus×corpus near-dup joins, bucket first (see
  *     TextOps.minhashNearDup for the banded-LSH shape).
  *
  * Determinism contract with the DuckDB oracle: both sides promote float→
  * double BEFORE multiplying and reduce with a sequential left fold in array
  * order (Spark `aggregate(...)`, DuckDB `list_reduce(...)`), so the dot
  * products and norms are bit-identical doubles and the output cosine can be
  * hash-compared exactly.
  */
object Similarity {

  private val K = 10
  private val NumQueries = 10

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

  /** Sequential left-fold sum of an array<double> column (bit-deterministic,
    * matches DuckDB's list_reduce). */
  private def foldSum(arr: String): String =
    s"aggregate($arr, 0D, (acc, x) -> acc + x)"

  /** Exact cosine top-k: for each query vector (vec_id < 10), the K nearest
    * corpus vectors by cosine similarity, ties broken by vec_id. */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val corpus = emb(s, dir)
      .withColumn("nn", expr(foldSum("transform(v, x -> x * x)")))
    val queries = corpus
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nn").as("nq"))

    val pairs = corpus
      .join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("dot", expr(foldSum("zip_with(qv, v, (x, y) -> x * y)")))
      .withColumn("cosine", col("dot") / (sqrt(col("nq")) * sqrt(col("nn"))))

    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("qid"), col("rank"), col("vec_id").as("nid"), col("cosine"))
      .orderBy("qid", "rank")
  }

  private val cosineTopKSql =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS nn
       |  FROM e),
       |q AS (SELECT vec_id AS qid, v AS qv, nn AS nq FROM n WHERE vec_id < $NumQueries),
       |p AS (
       |  SELECT qid, n.vec_id AS nid,
       |    list_reduce(list_transform(range(len(qv)),
       |      i -> qv[i+1] * v[i+1]), (a, b) -> a + b)
       |      / (sqrt(nq) * sqrt(nn)) AS cosine
       |  FROM q CROSS JOIN n WHERE n.vec_id != qid),
       |r AS (
       |  SELECT qid, nid, cosine,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
       |  FROM p)
       |SELECT qid, rank, nid, cosine FROM r WHERE rank <= $K
       |ORDER BY qid, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk" -> (cosineTopK(_, _)))

  val oracles: Map[String, String] = Map(
    "q_cosine_topk" -> cosineTopKSql)
}
