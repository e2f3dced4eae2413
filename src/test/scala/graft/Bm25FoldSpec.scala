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

  test("bm25 bucket family is recorded in meta and drives the probe (r20)") {
    val s = spark
    // build with a NON-DEFAULT bucket count: the index must record it and
    // a later probe (different session knob) must prune with the RECORDED
    // modulus, never the session's — the X81 family rule on the bm25 knob
    val tmp = java.nio.file.Files.createTempDirectory("bm25meta").toString
    val corpus = graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
    s.conf.set("graft.bm25.docBuckets", "4")
    try TextOps.writeBm25Index(s, corpus, tmp)
    finally s.conf.unset("graft.bm25.docBuckets")
    val meta = s.read.parquet(s"$tmp/meta").head()
    assert(meta.getAs[Long]("doc_buckets") == 4L,
      "meta must record the build-time bucket count")
    assert(meta.getAs[Int]("layout") == 2)
    // session knob back at default 16; the probe must still prune mod 4
    val purge = corpus.select(col("doc_id")).limit(3)
    val plan = TextOps.prunedDoomedPostings(s, tmp, purge)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("doc_bucket")),
      s"probe must partition-prune:\n$plan")
    // with modulus 4 every bucket value in the filter is < 4; a probe
    // hashing mod 16 would emit values the 4-bucket layout never wrote
    val vals = "doc_bucket#\\d+ IN \\(([^)]*)\\)".r
      .findFirstMatchIn(pf.get).map(_.group(1))
      .getOrElse(fail(s"no IN filter in: ${pf.get}"))
      .split(",").map(_.trim.toLong)
    assert(vals.nonEmpty && vals.forall(_ < 4),
      s"probe must prune with the RECORDED modulus 4, got ${vals.toSeq}")
    // an r18-format root (no meta) fails with rebuild guidance
    val bare = java.nio.file.Files.createTempDirectory("bm25old").toString
    val ex = intercept[IllegalStateException] {
      TextOps.prunedDoomedPostings(s, bare, purge)
    }
    assert(ex.getMessage.contains("Rebuild"))
  }
}
