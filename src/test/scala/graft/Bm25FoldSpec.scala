package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextOps, VersionedRoot}

/** Pins the BM25 tombstone-delta lifecycle (r18): a delete commits an
  * O(batch) delta (tomb + df_delta + stats_delta) behind the manifest,
  * serving composes the truth at read time, and the X128 fold compacts
  * the chain into one clean root — with serve-equivalence across the
  * fold and the tombstoned docs physically gone from the compacted
  * postings. The oracle gates (q_bm25_index_delete/_upsert) check the
  * rebuild equivalence; this spec pins the FOLD half, which has no
  * bench gate by design (compaction is a scheduled background op — the
  * lifecycle gates must price the lifecycle, not the vacuum truck).
  */
class Bm25FoldSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("bm25 fold: tombstone chain compacts with identical serving") {
    val s = spark
    val root = TextOps.bm25BuildIndex(s, dir)
    val work = VersionedRoot.freshRoot("bm25fold")
    val cycle = VersionedRoot.cycle(work, root)
    // a takedown delta: every doc from the purge fixture source
    val purge = graft.Tables.load(s, dir, "documents")
      .filter(col("source") === TextOps.PurgeSource).select(col("doc_id"))
    val nPurged = purge.count()
    assert(nPurged > 0, "fixture must purge something")
    TextOps.writeBm25DeleteDelta(s, root, purge, s"${work.resolve("delta0")}")
    val dirs = cycle.append(work.resolve("delta0").toString)
    assert(dirs.size == 2)
    def serveRows(d: Seq[String]): Set[(Long, Double)] = {
      val (tf, df_, stats) = TextOps.bm25Effective(s, d, None)
      // fingerprint the full effective index, not just scores: postings
      // rows (dlen rides on them — the r19 layout), the dictionary, and
      // the global stats must all survive the fold bit-for-bit
      // (integral doubles — sums exact)
      val post = tf
        .select(col("doc_id"), (col("tf") * col("dlen")).as("w"))
        .groupBy(col("doc_id")).agg(sum(col("w")).as("w"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val dict = df_.agg(count(lit(1)).cast("double").as("n"),
        sum(col("df")).as("s")).head()
      val st = stats.select(col("n_docs"), col("avgdl")).head()
      post +
        ((-1L, st.getDouble(0) * 1e6 + st.getDouble(1))) +
        ((-2L, dict.getDouble(0) * 1e9 + dict.getDouble(1)))
    }
    val beforeFold = serveRows(dirs)
    val folded = TextOps.bm25IndexFold(s, cycle.vroot,
      work.resolve("compact").toString)
    assert(folded == Seq(work.resolve("compact").toString),
      s"fold must replace the chain with one root: $folded")
    val afterFold = serveRows(folded)
    assert(beforeFold == afterFold,
      "fold changed the effective index content")
    // the tombstoned docs are PHYSICALLY gone from the compacted postings
    val foldedTf = s.read.parquet(s"${folded.head}/tf")
    assert(foldedTf.join(purge, "doc_id").count() == 0,
      "purged docs still present in the compacted postings")
    // and the compacted root carries no tombstones at all
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(folded.head, "tomb")))
    // the pre-fold version still serves readers that pinned it (swap-
    // while-serving); retire + vacuum then reclaims the delta dir
    VersionedRoot.retire(cycle.vroot, keep = 1)
    val gone = VersionedRoot.vacuumDirs(cycle.vroot,
      Seq(work.resolve("delta0").toString))
    assert(gone == Seq(work.resolve("delta0").toString))
  }
}
