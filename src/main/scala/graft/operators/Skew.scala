package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins — the explicit tool for when AQE's
  * runtime skew-join splitting can't help (hash joins it won't split,
  * skew that only materializes after upstream aggregation, or a build
  * side that must replicate).
  *
  * `saltedJoin(left, right, keys, shards)` spreads each hot left-side key
  * over `shards` reducers: left rows get a salt derived from the hash of
  * the WHOLE row (same-key rows land on different shards as long as any
  * other column differs), the right side replicates `shards`× via a
  * sequence explode, and the join key becomes (keys…, salt). Correctness
  * is unchanged — every left row still meets every matching right row
  * exactly once — while the per-reducer load of a hot key drops by ~shards.
  *
  * Cost model: right side grows `shards`×, so pick `shards` ≈ (hot-key
  * rows / target-partition rows) and keep it small for large right sides;
  * for dimension-sized right sides the replication is noise next to the
  * skew it removes.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 shards: Int, joinType: String = "inner"): DataFrame = {
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "__salt is reserved by saltedJoin")
    require(shards > 0, "shards must be positive")
    // right-preserving joins would see each right row `shards` times
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports left-preserving joins only, got $joinType")
    val leftCols = left.columns
    val salted = left.withColumn("__salt",
      pmod(hash(leftCols.map(col): _*), lit(shards)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(shards - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Oracle gate: salted join ≡ plain join (the operator's whole contract).
    *
    * The fixture manufactures skew IN-PLAN from lineitem — ~75% of rows
    * collapse onto hot key 0, the tail spreads over p_partkey%1000 — and
    * joins a part-derived dimension through saltedJoin. The oracle is the
    * plain SQL join; any salting bug (lost row, double-met pair, salt
    * leaking into the key space) flips rows and fails the hash.
    */
  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "q_skew_join" -> ((s, dir) => {
      val li = graft.Tables.load(s, dir, "lineitem").select(
        when(col("l_orderkey") % 4 < 3, lit(0L))
          .otherwise(col("l_partkey") % 1000).as("k"),
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val dim = graft.Tables.load(s, dir, "part")
        .groupBy((col("p_partkey") % 1000).as("k"))
        .agg(min(col("p_name")).as("dim_name"))
      saltedJoin(li, dim, Seq("k"), shards = 8)
        .orderBy("k", "l_orderkey", "l_linenumber")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_skew_join" ->
      """WITH lt AS (
        |  SELECT CASE WHEN l_orderkey % 4 < 3 THEN 0 ELSE l_partkey % 1000 END AS k,
        |    l_orderkey, l_linenumber, l_quantity FROM lineitem),
        |dim AS (
        |  SELECT p_partkey % 1000 AS k, min(p_name) AS dim_name
        |  FROM part GROUP BY 1)
        |SELECT l.k, l.l_orderkey, l.l_linenumber, l.l_quantity, d.dim_name
        |FROM lt l JOIN dim d USING (k)
        |ORDER BY l.k, l.l_orderkey, l.l_linenumber""".stripMargin
  )
}
