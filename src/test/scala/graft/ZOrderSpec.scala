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

  /** Rows the parquet SCAN surfaces after row-group stat pruning — the
    * executed-scan metric (not a plan string): pushed filters prune whole
    * row groups by min/max; whatever survives streams out of the scan and
    * is counted by its numOutputRows.
    */
  private def scanOutputRows(path: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
    val df = spark.read.parquet(path).filter(pred)
    val qe = df.queryExecution
    qe.toRdd.count() // execute the real plan (no AQE wrapper: scan+filter only)
    val scan = qe.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    (scan.metrics("numOutputRows").value, scan.metrics("numFiles").value)
  }

  test("written z-order files prune scans on EITHER dimension; key-sort on one") {
    // full 256x256 grid, one row per (x, y): pruning ratios are exact by
    // construction instead of hostage to testdata skew
    val n = 256 * 256
    val grid = spark.range(n.toLong)
      .selectExpr("CAST(id % 256 AS INT) AS x8", "CAST(id div 256 AS INT) AS y8",
        "id AS payload")
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val zPath = s"$tmp/by_z"; val xPath = s"$tmp/by_x"
    // 16 files ≈ one row group each at this size: row-group stats become
    // file-level envelopes, so surviving rows measure skipped FILES
    ZOrder.writeZOrdered(grid, "x8", "y8", zPath, nFiles = 16)
    ZOrder.writeKeySorted(grid, "x8", xPath, nFiles = 16)

    val (zxRows, zxFiles) = scanOutputRows(zPath, col("x8") === 7)
    val (zyRows, _)       = scanOutputRows(zPath, col("y8") === 7)
    val (sxRows, _)       = scanOutputRows(xPath, col("x8") === 7)
    val (syRows, syFiles) = scanOutputRows(xPath, col("y8") === 7)

    // both layouts LIST every file — what differs is row groups actually
    // read, i.e. this is stat pruning, not partition pruning
    assert(zxFiles == 16 && syFiles == 16)

    // single-key layout: its own key prunes hard...
    assert(sxRows <= n / 8, s"x-sorted layout must prune x filters, read $sxRows")
    // ...but the other dimension reads the ENTIRE table — every file's
    // y envelope spans the full range
    assert(syRows == n, s"x-sorted layout cannot prune y filters, read $syRows")

    // z-order: BOTH dimensions read a strict subset. 16 z-ranges ≈ a 4x4
    // tile grid: a point filter on either dim intersects ~4 tiles (~n/4
    // rows); ≤ n/2 is robust to repartitionByRange's sampled boundaries
    assert(zxRows <= n / 2, s"z layout must prune x filters, read $zxRows of $n")
    assert(zyRows <= n / 2, s"z layout must prune y filters, read $zyRows of $n")
    assert(zyRows < syRows, "the whole point: y filters prune under z, not under x-sort")
  }
}
