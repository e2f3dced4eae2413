package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the write-path maintenance operator every
  * 100 TB lake needs and no query gate exercises: streaming ingests,
  * per-tenant writers, and over-parallel jobs each leave thousands of
  * KB-sized parquet files, and scan cost then drowns in file-open/footer
  * overhead (the NameNode/listing pressure is worse — a million tiny
  * files is a metadata outage, not a slow query).
  *
  * The compaction primitive is Spark's own REBALANCE hint under AQE: a
  * round-robin-ish shuffle whose output blocks AQE re-coalesces (and,
  * for skewed blocks, SPLITS) to `spark.sql.adaptive.advisoryPartitionSizeInBytes`
  * — so one knob yields size-targeted output files in both directions:
  * many small inputs merge, an oversized input splits. That beats the
  * two manual forms this operator deliberately avoids:
  * `coalesce(n)` (no shuffle, but inherits input skew — one fat
  * partition stays fat, and n must be guessed from input bytes) and
  * `repartition(n)` (even sizes, but n is still a guess that goes stale
  * the moment the table grows). At 100 TB the rebalance shuffle is the
  * honest cost of rewriting the data once; compaction runs incrementally
  * per partition/tenant directory, never over the whole lake.
  *
  * Reference analog: none (the reference's journal IS a small-file
  * format; this is the operator that would consolidate it — see
  * SURVEY.md §1.2 primary-storage layout).
  */
object Compaction {

  import JournalGate.{buildPerJvm, fixtureRoot, writeOnce}

  /** Rewrite `inPath` (parquet) into `outPath` with ~`targetBytes`-sized
    * output partitions. The advisory size is a session conf, not a plan
    * property, so it is set for the duration of the write and restored —
    * a production job would own its session and set it once.
    */
  def compact(s: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Unit = {
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = s.conf.getOption(key)
    s.conf.set(key, targetBytes.toString)
    try s.read.parquet(inPath).hint("rebalance")
      .write.mode("overwrite").parquet(outPath)
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Documents shattered into 64 tiny files, once per testdata dir — the
    * fixture a streaming ingest would leave behind (64 × ~3 KB here; the
    * pathology is file COUNT, not bytes).
    */
  private[graft] def fragmentedDocs(s: SparkSession, dir: String): java.nio.file.Path =
    writeOnce(fixtureRoot("fragdocs", dir)) { tmp =>
      Tables.load(s, dir, "documents").repartition(64)
        .write.parquet(tmp.toString)
    }

  /** The compacted output is code-under-test output, so it rebuilds once
    * per JVM (a cross-run cache would re-hash stale files after a code
    * change; per-call would make bench time the rewrite, not the read).
    */
  private[graft] def compactedDocs(s: SparkSession, dir: String): java.nio.file.Path = {
    val frag = fragmentedDocs(s, dir)
    buildPerJvm(fixtureRoot("compactdocs", dir)) { tmp =>
      compact(s, frag.toString, tmp.toString, 128L * 1024 * 1024)
    }
  }

  /** Gate: compaction must be byte-faithful — every row of the shattered
    * input survives the rewrite with identical values (text pinned by
    * md5 so the compare carries the payload without hauling it through
    * the hash harness). The oracle reads the ORIGINAL flat table: input
    * fragmentation and output layout must both be invisible to values.
    */
  def compaction(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(compactedDocs(s, dir).toString)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy("doc_id")

  private val compactionSql =
    """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_compaction" -> (compaction(_, _)))

  val oracles: Map[String, String] = Map(
    "q_compaction" -> compactionSql)
}
