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
}
