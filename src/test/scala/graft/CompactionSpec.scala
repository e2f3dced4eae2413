package graft

import graft.operators.Compaction

/** The layout contract a value-compare cannot see: compaction must
  * actually CHANGE the file layout — merging shattered files up toward
  * the advisory target, splitting when the target is smaller than the
  * data — while `q_compaction` (the oracle gate) pins that values are
  * untouched.
  */
class CompactionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def parquetFiles(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter { f =>
        val n = f.getFileName.toString
        n.startsWith("part-") && n.endsWith(".parquet")
      }.toSeq
    } finally s.close()
  }

  test("compaction merges 64 shattered files into few; rows survive") {
    val frag = Compaction.fragmentedDocs(spark, dir)
    val comp = Compaction.compactedDocs(spark, dir)
    assert(parquetFiles(frag).size == 64,
      s"fixture must be genuinely shattered, got ${parquetFiles(frag).size}")
    val outFiles = parquetFiles(comp).size
    // ~150 KB of data under a 128 MB advisory target must land in a
    // handful of files (1 under perfect coalescing; a small number if
    // AQE keeps reducer-count floors) — never the input's 64
    assert(outFiles >= 1 && outFiles <= 4,
      s"compaction must merge toward the target, got $outFiles files")
    assert(spark.read.parquet(comp.toString).count() ==
      spark.read.parquet(frag.toString).count())
  }

  test("an advisory target below the data size splits the output") {
    val frag = Compaction.fragmentedDocs(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("compact_split")
    // the advisory size meters SHUFFLE bytes (lz4-compressed), which run
    // well under the raw ~150 KB here — 4 KB is comfortably below the
    // compressed total, so AQE must keep several reducers
    Compaction.compact(spark, frag.toString, out.toString, 4 * 1024)
    val n = parquetFiles(out).size
    assert(n >= 2 && n < 64,
      s"a 4 KB target over ~150 KB raw must yield several files, got $n")
    assert(spark.read.parquet(out.toString).count() ==
      spark.read.parquet(frag.toString).count())
  }
}
