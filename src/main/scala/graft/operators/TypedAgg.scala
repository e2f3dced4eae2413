package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The typed `Aggregator[IN, BUF, OUT]` surface (SURVEY §2j) — the one
  * Dataset-API extension point no native expression covers: a MERGEABLE
  * custom aggregate with a bounded buffer.
  *
  * The op: per-group top-k by (value DESC, id ASC). The window formulation
  * (q_topk_per_group) must SHUFFLE EVERY ROW to its group before ranking;
  * this aggregator keeps at most k pairs per group per partition, so the
  * shuffle carries k·|groups| rows after map-side partial aggregation —
  * at 100 TB with a handful of groups that is the difference between
  * shuffling the fact table and shuffling kilobytes. Both formulations
  * are gated against the same oracle shape, documenting the trade.
  *
  * Correctness of the merge: top-k is a semilattice (merge = concat,
  * re-sort, truncate; associative, commutative, absorbing), so ANY
  * partial-aggregation grouping yields the same result; ties resolve by
  * the id, so the result is deterministic for any input order.
  */
object TypedAgg {

  /** Buffer/output root for the product encoder (a bare Seq is not a
    * Product, so the k-bounded list rides inside a case class and the
    * output column is struct<items: array<struct<_1,_2>>>). */
  case class Wrap(items: Seq[(Double, Long)])

  /** Bounded top-k buffer over (value, id): keeps the k largest by
    * (value DESC, id ASC). */
  class TopK(k: Int) extends Aggregator[(Double, Long), Wrap, Wrap] {
    private val ord: Ordering[(Double, Long)] =
      Ordering.by { case (v, id) => (-v, id) }
    override def zero: Wrap = Wrap(Seq.empty)
    override def reduce(b: Wrap, a: (Double, Long)): Wrap =
      Wrap((b.items :+ a).sorted(ord).take(k))
    override def merge(b1: Wrap, b2: Wrap): Wrap =
      Wrap((b1.items ++ b2.items).sorted(ord).take(k))
    override def finish(b: Wrap): Wrap = b
    override def bufferEncoder: Encoder[Wrap] = Encoders.product[Wrap]
    override def outputEncoder: Encoder[Wrap] = Encoders.product[Wrap]
  }

  /** Per-priority top-3 orders by (o_totalprice DESC, o_orderkey ASC),
    * computed with the typed Aggregator registered as a UDAF — partial
    * aggregation (map-side combine of k-bounded buffers) visible in the
    * plan as partial_topk/topk, never a full-row shuffle. The buffered
    * pairs explode back to rows with their rank for the oracle compare.
    */
  def topKAgg(s: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new TopK(3))
    Tables.load(s, dir, "orders")
      .select(col("o_orderpriority"),
        struct(col("o_totalprice"), col("o_orderkey")).as("p"))
      .groupBy(col("o_orderpriority"))
      .agg(topk(col("p.o_totalprice"), col("p.o_orderkey")).as("top"))
      // the product encoder serializes the buffer as struct<items: array<…>>
      .select(col("o_orderpriority"), posexplode(col("top.items")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("o_orderkey"), col("col._1").as("o_totalprice"))
      .orderBy("o_orderpriority", "rank")
  }

  private val topKAggSql =
    """SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
      |  FROM orders)
      |WHERE rank <= 3 ORDER BY o_orderpriority, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_typed_topk_agg" -> (topKAgg(_, _)))

  val oracles: Map[String, String] = Map(
    "q_typed_topk_agg" -> topKAggSql)
}
