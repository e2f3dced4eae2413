package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout: bit-interleave parity against a direct Scala reference,
  * and the clustering property the layout exists for — per-bucket envelopes
  * narrow in BOTH dimensions at once.
  */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private def refInterleave(x: Int, y: Int): Int =
    (0 until 8).map(i => (((x >> i) & 1) << (2 * i + 1)) | (((y >> i) & 1) << (2 * i))).sum

  test("zValue matches the reference bit interleave on edge and random points") {
    val pts = Seq((0, 0), (255, 255), (0, 255), (255, 0), (1, 2), (128, 64),
      (254, 255), (85, 170)) ++
      (0 until 50).map(i => ((i * 37) % 256, (i * 101) % 256))
    val got = pts.toDF("x8", "y8")
      .withColumn("z", ZOrder.zValue("x8", "y8"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getAs[Number]("z").intValue()))
    got.foreach { case (x, y, z) =>
      assert(z == refInterleave(x, y), s"interleave($x, $y): got $z, want ${refInterleave(x, y)}")
    }
  }

  test("z buckets bound BOTH dimensions: narrow user AND minute envelopes") {
    val rows = ZOrder.zorderLayout(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("min_user"), r.getAs[Long]("max_user"))
      val (mLo, mHi) = (r.getAs[Int]("min_minute"), r.getAs[Int]("max_minute"))
      // a bucket pins the top 2 bits of each 8-bit dim: x8 spans ≤ 64 of 256
      // (≤ ~38 raw user ids of 150), y8 spans ≤ 64 (≤ 360 raw minutes of
      // 1440). A single-dimension sort would leave the OTHER envelope at
      // full range — exactly what these bounds reject.
      assert(hi - lo <= 40, s"bucket ${r.get(0)}: user envelope $lo..$hi too wide")
      assert(mHi - mLo <= 361, s"bucket ${r.get(0)}: minute envelope $mLo..$mHi too wide")
    }
  }

  test("layout report is one map + one grouped agg — a single hash shuffle") {
    val plan = ZOrder.zorderLayout(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"no join belongs in a layout report:\n$plan")
    assert("hashpartitioning".r.findAllIn(plan).size == 1,
      s"exactly the aggregate's shuffle:\n$plan")
  }
}
