package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin returns exactly the plain join, spread over shards") {
    // 10k rows of one hot key + a long tail
    val left = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")
    val right = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("k", "d")

    val plain = left.join(right, Seq("k")).select("k", "v", "d")
    val salted = Skew.saltedJoin(left, right, Seq("k"), shards = 8)
      .select("k", "v", "d")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // the hot key's rows really do land on multiple shards
    val shardsUsed = left.filter(col("k") === "hot")
      .withColumn("__salt", pmod(hash(left.columns.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(shardsUsed > 1)
  }

  test("saltedJoin preserves left-outer semantics") {
    val left = Seq(("a", 1L), ("miss", 2L)).toDF("k", "v")
    val right = Seq(("a", "x")).toDF("k", "d")
    val out = Skew.saltedJoin(left, right, Seq("k"), shards = 4, joinType = "left")
      .orderBy("k").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[String]("d")).toSeq == Seq("x", null))
  }
}
