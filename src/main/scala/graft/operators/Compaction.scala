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

  /** 2^40 — per-key hashes are bounded by this BEFORE the order-free
    * membership sum so the aggregate stays BIGINT on both engines (the
    * TextOps.exportManifest discipline; DECIMAL outputs fail the driver's
    * hash canonicalization even when values are exact). */
  private[graft] val HashSumMod = 1099511627776L

  /** Rewrite `inPath` (parquet) into `outPath` with ~`targetBytes`-sized
    * output partitions. The advisory size is a session conf, not a plan
    * property, so it is set for the duration of the write and restored —
    * a production job would own its session and set it once.
    */
  def compact(s: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Unit =
    compact(s, Seq(inPath), outPath, targetBytes)

  /** Multi-directory form: rewrite the UNION of `inPaths` — the file-set
    * list an append-only index root accumulates, one dir per update
    * batch — into one size-targeted directory, the compact-then-publish
    * half of the index-root compaction cycle (the other half is
    * [[VersionedRoot.publishDirs]] flipping the manifest to the single
    * compacted dir). */
  def compact(s: SparkSession, inPaths: Seq[String], outPath: String,
      targetBytes: Long): Unit = {
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = s.conf.getOption(key)
    s.conf.set(key, targetBytes.toString)
    try s.read.parquet(inPaths: _*).hint("rebalance")
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

  /** Column fingerprint shared by both snapshot-diff legs: every
    * reconciled column rendered at an engine-unambiguous string grain
    * (longs verbatim, the double price at integer cents — a raw double's
    * string form is NOT portable across engines) and md5'd, so "changed"
    * detection is one hash compare per key instead of a column-by-column
    * comparison shipped through the join. */
  private val fpCols =
    Seq("CAST(o_custkey AS STRING)", "o_orderstatus",
      "CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS STRING)",
      "o_orderpriority")

  /** Snapshot DIFF / reconciliation audit (X110) — the lake-versioning
    * op every 100 TB pipeline runs after a backfill, a migration, or a
    * vendor re-delivery: given yesterday's snapshot and today's, report
    * exactly what moved — added / removed / changed / unchanged — as
    * counts PLUS an order-free membership hashsum per class (classes are
    * SETS; an ordered checksum would funnel the lake-sized unchanged
    * class through one group), so the membership of every class is
    * oracle-compared, not just its size.
    * Snapshot B is materialized per JVM from deterministic edits
    * (a deleted key slice, a priority rewrite on a second slice, a
    * key-shifted clone of a third as the additions), and the oracle
    * re-derives B from the same arithmetic — so the diff operator is
    * checked against an independent reconstruction of both snapshots.
    *
    * Scale shape: ONE full-outer join on the key — with both snapshots
    * bucketed by key, a partition-wise merge with zero shuffle; the
    * row-compare is a single md5 fingerprint built AT THE SCAN (column
    * pruning keeps unreconciled columns on disk), so the join carries
    * (key, 32-byte hash) per side, never the row. The per-class
    * aggregation is |classes| = 4 output rows.
    *
    * Reference analog: none — the reference trusts its journal as the
    * single source of truth; reconciliation is §2x extension surface.
    */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val root = buildPerJvm(fixtureRoot("snapdiff", dir)) { tmp =>
      val a = Tables.load(s, dir, "orders")
      a.filter(pmod(col("o_orderkey"), lit(101L)) =!= 0 &&
          pmod(col("o_orderkey"), lit(103L)) =!= 0)
        .unionByName(a.filter(pmod(col("o_orderkey"), lit(103L)) === 0)
          .withColumn("o_orderpriority", lit("X-RECON")))
        .unionByName(a.filter(pmod(col("o_orderkey"), lit(107L)) === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L)))
        .write.parquet(s"$tmp/b")
    }
    val fp = md5(concat_ws("|", fpCols.map(expr): _*))
    val a = Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("k"), fp.as("fp_a"))
    val b = s.read.parquet(s"$root/b")
      .select(col("o_orderkey").as("k"), fp.as("fp_b"))
    a.join(b, Seq("k"), "full_outer")
      .withColumn("change_type",
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged"))
      .groupBy(col("change_type"))
      // membership fingerprint, not an ordered one: a class is a SET, and
      // the unchanged class is ~the whole lake — any collect-and-sort
      // checksum would funnel it through one group. hashSum routes through
      // the mod_sum DeclarativeAggregate (r18), whose BIGINT buffer is
      // mod-2^40-reduced at EVERY update/merge — value-identical to the
      // retired wide-DECIMAL spelling by (Σh) mod m == (Σ(h mod m)) mod m,
      // exact at any group size, and free of both the Java-Decimal update
      // cost and the driver hash gate's arrow Decimal canonicalization
      .agg(count(lit(1)).as("n_rows"),
        graft.operators.TextOps.hashSum("k", HashSumMod).as("key_hashsum"))
      .orderBy("change_type")
  }

  private val snapshotDiffFpSql =
    """md5(CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
      |  CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR) || '|' ||
      |  o_orderpriority)""".stripMargin

  private val snapshotDiffSql =
    s"""WITH b AS (
       |  SELECT * FROM orders
       |  WHERE o_orderkey % 101 != 0 AND o_orderkey % 103 != 0
       |  UNION ALL
       |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |    o_orderdate, 'X-RECON' AS o_orderpriority
       |  FROM orders WHERE o_orderkey % 103 = 0
       |  UNION ALL
       |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
       |    o_totalprice, o_orderdate, o_orderpriority
       |  FROM orders WHERE o_orderkey % 107 = 0),
       |fa AS (SELECT o_orderkey AS k, $snapshotDiffFpSql AS fp FROM orders),
       |fb AS (SELECT o_orderkey AS k, $snapshotDiffFpSql AS fp FROM b),
       |j AS (
       |  SELECT coalesce(fa.k, fb.k) AS k,
       |    CASE WHEN fa.k IS NULL THEN 'added'
       |         WHEN fb.k IS NULL THEN 'removed'
       |         WHEN fa.fp != fb.fp THEN 'changed'
       |         ELSE 'unchanged' END AS change_type
       |  FROM fa FULL OUTER JOIN fb ON fa.k = fb.k)
       |SELECT change_type, count(*) AS n_rows,
       |  ${graft.operators.TextOps.hashSumSql("k", HashSumMod)}
       |    AS key_hashsum
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** CDC APPLY (X111) — fold a change-data-capture batch into a snapshot:
    * the lakehouse MERGE primitive where deletes arrive as DATA (op rows),
    * completing the write-path family — compaction rewrites layout,
    * snapshot-diff audits what moved, this is the operator that MOVES it.
    * Semantics: per key, the highest-sequence operation wins (a key
    * touched by INSERT then UPDATE then DELETE within one batch must end
    * deleted — applying ops row-by-row in arrival order is the classic
    * CDC bug this gate pins against); survivors with op ≠ D form the new
    * snapshot. The fold is the [[graft.warehouse.Warehouse.upsert]]
    * precedence window generalized with op semantics: union snapshot
    * (seq 0) with the batch, one row_number window per key ordered by
    * seq DESC, filter the winner's op. ONE shuffle on the key at any
    * scale; deletes cost the same as updates (a tombstone is a row).
    *
    * The CDC batch is derived from deterministic key arithmetic (inserts
    * re-add a key slice the base snapshot lacks, updates rewrite a
    * second slice's priority, deletes tombstone a third — slices overlap
    * on purpose so precedence bites); output = per-surviving-provenance
    * counts plus the X110 order-free membership hashsum, every number
    * re-derived from scratch by the oracle.
    */
  /** The deterministic CDC fixture rows — ONE derivation shared by the
    * batch fold and the streaming door, so the two doors consume
    * literally the same change feed (and therefore share one oracle). */
  private[graft] def cdcBaseAndBatch(s: SparkSession,
                                     dir: String): (DataFrame, DataFrame) = {
    val orders = Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"))
    // base snapshot: the lake before the batch (missing the %5 slice)
    val base = orders.filter(pmod(col("k"), lit(5L)) =!= 0)
      .select(col("k"), col("prio"), lit(0L).as("seq"), lit("S").as("op"))
    val cdc = orders.filter(pmod(col("k"), lit(5L)) === 0)
        .select(col("k"), col("prio"), lit(1L).as("seq"), lit("I").as("op"))
      .unionByName(orders.filter(pmod(col("k"), lit(7L)) === 0)
        .select(col("k"), lit("CDC-U").as("prio"), lit(2L).as("seq"),
          lit("U").as("op")))
      .unionByName(orders.filter(pmod(col("k"), lit(11L)) === 0)
        .select(col("k"), lit(null.asInstanceOf[String]).as("prio"),
          lit(3L).as("seq"), lit("D").as("op")))
    (base, cdc)
  }

  /** The batch gate's survivor aggregation — shared with the streaming
    * door so both report (op, n_rows, key/payload hashsums) identically
    * from their winning rows. */
  private[graft] def cdcSurvivorReport(winners: DataFrame): DataFrame =
    winners
      .filter(col("op") =!= "D")
      .groupBy(col("op"))
      .agg(count(lit(1)).as("n_rows"),
        graft.operators.TextOps.hashSum("k", HashSumMod).as("key_hashsum"),
        // the winning row's PAYLOAD is part of the contract (an UPDATE
        // that wins on precedence but keeps the stale value is the
        // other classic CDC bug) — fingerprint it the X110 way,
        // wide-accumulated then mod-bounded like key_hashsum above
        graft.operators.TextOps.hashSum("concat(k, ':', prio)", HashSumMod)
          .as("payload_hashsum"))
      .orderBy("op")

  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (base, cdc) = cdcBaseAndBatch(s, dir)
    val w = Window.partitionBy(col("k")).orderBy(col("seq").desc)
    cdcSurvivorReport(base.unionByName(cdc)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1))
  }

  private val cdcApplySql =
    s"""WITH o AS (
       |  SELECT o_orderkey AS k, o_orderpriority AS prio FROM orders),
       |folded AS (
       |  SELECT k, prio, op FROM (
       |    SELECT k, prio, op,
       |      row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
       |    FROM (
       |      SELECT k, prio, 0 AS seq, 'S' AS op FROM o WHERE k % 5 != 0
       |      UNION ALL
       |      SELECT k, prio, 1, 'I' FROM o WHERE k % 5 = 0
       |      UNION ALL
       |      SELECT k, 'CDC-U', 2, 'U' FROM o WHERE k % 7 = 0
       |      UNION ALL
       |      SELECT k, NULL, 3, 'D' FROM o WHERE k % 11 = 0) AS u) AS r
       |  WHERE rn = 1 AND op != 'D')
       |SELECT op, count(*) AS n_rows,
       |  ${graft.operators.TextOps.hashSumSql("k", HashSumMod)}
       |    AS key_hashsum,
       |  ${graft.operators.TextOps.hashSumSql("k || ':' || prio", HashSumMod)}
       |    AS payload_hashsum
       |FROM folded GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_compaction" -> (compaction(_, _)),
    "q_snapshot_diff" -> (snapshotDiff(_, _)),
    "q_cdc_apply" -> (cdcApply(_, _)))

  val oracles: Map[String, String] = Map(
    "q_compaction" -> compactionSql,
    "q_snapshot_diff" -> snapshotDiffSql,
    "q_cdc_apply" -> cdcApplySql)
}
