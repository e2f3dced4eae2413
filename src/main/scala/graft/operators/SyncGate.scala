package graft.operators

import java.nio.file.Path

import graft.Tables
import graft.sources.Journal
import graft.warehouse.Warehouse
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle gate for the FULL incremental sync pipeline (P6 ownership filter,
  * P7 status assertion, P8 watermark skip, T3 watermark advance, T6
  * idempotence) — the loop the reference runs in
  * PrimaryDataExplorationService.scala:116-264.
  *
  * Shape: a deterministic journal fixture derived from the parquet
  * testdata is synced in THREE passes — pass 1 over the initial journal,
  * pass 2 after new events/transactions arrive (including snapshot
  * rotations, whose event versions restart, and below-watermark "late"
  * re-deliveries that must be skipped), pass 3 over the unchanged journal
  * (must be a no-op). The gated frame is the final warehouse state:
  * per-account watermarks plus how many transfers each account was
  * credited — and the DuckDB oracle recomputes both straight from the
  * parquet slice, so every filter in the pipeline is hash-checked.
  *
  * The sync passes execute when the query is CONSTRUCTED — this gate
  * materializes a pipeline, not a single plan (the other queries stay
  * lazy). The resulting warehouse is rebuilt once per JVM (fresh output
  * for every verify/bench run, while a run's warmup/timed constructions
  * share it and only re-read parquet).
  *
  * Fixture map (orders slice, k = o_orderkey < 600, ack = o_custkey % 50):
  *   - accounts: customers ck < 50 → `c<ck>`, snapshot-0 header
  *   - event for k: account c<ack>, status F→1/P→2/else 0 (in the
  *     FILENAME), version 1+k%5 (pass 1, k<300) or 11+k%5 (pass 2) so
  *     versions stay monotonic within a snapshot; rotated accounts
  *     (ack%3=0) take pass-2 events under snapshot 1
  *   - transaction x<k>: status WORD + one transfer crediting c<ack> —
  *     except k%11=0, which credits a non-party account so the P6
  *     ownership filter must drop it (the event still advances the
  *     watermark)
  *   - late canary (pass 2, k<300 ∧ k%13=0): event version 1 announcing a
  *     NEW transaction xL<k>. Version 1 is ≤ the account's pass-1
  *     watermark by construction (the same order produced a pass-1 event
  *     on the same account), so the watermark filter must skip it — if the
  *     skip logic breaks, yL transfers appear and the hash mismatches.
  */
object SyncGate {

  private val AcctBound = 50L
  private val KeyBound = 600L
  private val PassSplit = 300L

  private def statusInt(word: String): Int =
    word match { case "F" => 1; case "P" => 2; case _ => 0 }
  private def statusWord(i: Int): String =
    i match { case 1 => "committed"; case 2 => "rollbacked"; case _ => "promised" }

  /** One journal file set; `pass2` adds the second wave; `tailOnly` keeps
    * ONLY the second wave (what remains on disk after the first wave has
    * been compacted into a parquet manifest and its tiny files deleted).
    */
  private def writeJournal(s: SparkSession, dir: String, tmp: Path, pass2: Boolean,
      tailOnly: Boolean = false): Unit = {
    import JournalGate.put
    java.nio.file.Files.createDirectories(tmp)
    if (!tailOnly)
      Tables.load(s, dir, "customer")
        .filter(col("c_custkey") < AcctBound)
        .select("c_custkey", "c_mktsegment", "c_nationkey")
        .collect().foreach { r: Row =>
          val ccy = r.getString(1).substring(0, 3).toUpperCase
          put(tmp, s"t_T/account/c${r.getLong(0)}/snapshot/${Journal.versionSegment(0)}",
            s"$ccy F${r.getInt(2)}_T\n")
        }
    val orders = Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") < KeyBound)
      .select("o_orderkey", "o_orderstatus", "o_custkey")
      .collect()
    orders.foreach { r: Row =>
      val k = r.getLong(0); val st = statusInt(r.getString(1)); val ack = r.getLong(2) % 50
      val inPass2 = k >= PassSplit
      if ((!inPass2 && !tailOnly) || (inPass2 && pass2)) {
        val snap = Journal.versionSegment(if (inPass2 && ack % 3 == 0) 1 else 0)
        val v = if (inPass2) 11 + k % 5 else 1 + k % 5
        put(tmp, s"t_T/account/c$ack/events/$snap/${st}_1_x$k", s"$v\n")
        val credit = if (k % 11 == 0) s"c${ack + 1000}" else s"c$ack"
        put(tmp, s"t_T/transaction/x$k",
          s"${statusWord(st)}\ny$k T $credit T b${k % 7} 2020-01-01T00:00:00Z 1.00 CZK\n")
      }
      if (pass2 && !inPass2 && k % 13 == 0) {
        put(tmp, s"t_T/account/c$ack/events/${Journal.versionSegment(0)}/${st}_1_xL$k", "1\n")
        put(tmp, s"t_T/transaction/xL$k",
          s"${statusWord(st)}\nyL$k T c$ack T b${k % 7} 2020-01-01T00:00:00Z 1.00 CZK\n")
      }
    }
  }

  /** The gated pipeline: 3 sync passes into a content-keyed warehouse,
    * then the final state as one deterministic frame.
    */
  def syncState(s: SparkSession, dir: String): DataFrame = {
    import JournalGate.{buildPerJvm, fixtureRoot, writeOnce}
    val j1 = writeOnce(fixtureRoot("sync_p1", dir))(writeJournal(s, dir, _, pass2 = false))
    val j2 = writeOnce(fixtureRoot("sync_p2", dir))(writeJournal(s, dir, _, pass2 = true))
    val wh = buildPerJvm(fixtureRoot("sync_wh", dir)) { tmp =>
      Warehouse.sync(s, j1.toString, tmp.toString)
      Warehouse.sync(s, j2.toString, tmp.toString)
      // unchanged journal — T6: must discover nothing and move no watermark
      val third = Warehouse.sync(s, j2.toString, tmp.toString)
      require(third == Warehouse.SyncStats(0, 0, 0),
        s"re-sync of an unchanged journal discovered rows: $third")
    }
    val account = s.read.parquet(s"$wh/account")
    val credits = s.read.parquet(s"$wh/transfer")
      .groupBy(col("credit_name").as("name"))
      .agg(count(lit(1)).as("n_transfers"))
    account.join(credits, Seq("name"), "left")
      .withColumn("n_transfers", coalesce(col("n_transfers"), lit(0L)))
      .select("tenant", "name", "currency", "format",
        "last_syn_snapshot", "last_syn_event", "n_transfers")
      .orderBy(expr("CAST(substring(name, 2, 10) AS LONG)"))
  }

  private val syncStateSql =
    s"""WITH acct AS (
       |  SELECT 'T' AS tenant, 'c' || CAST(c_custkey AS VARCHAR) AS name,
       |         upper(substring(c_mktsegment, 1, 3)) AS currency,
       |         'F' || CAST(c_nationkey AS VARCHAR) AS format,
       |         c_custkey AS ck
       |  FROM customer WHERE c_custkey < $AcctBound
       |),
       |-- every journal event that must end up processed; the late canaries
       |-- (version 1 re-deliveries) are absent because the watermark filter
       |-- provably skips them: their order also wrote a pass-1 event on the
       |-- same account, so the watermark is already >= (0,1) when they land
       |ev AS (
       |  SELECT o_orderkey AS k, o_custkey % 50 AS ack,
       |         CASE WHEN o_orderkey >= $PassSplit AND (o_custkey % 50) % 3 = 0
       |              THEN 1 ELSE 0 END AS snap,
       |         CASE WHEN o_orderkey >= $PassSplit
       |              THEN 11 + o_orderkey % 5 ELSE 1 + o_orderkey % 5 END AS v,
       |         CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'P' THEN 2 ELSE 0 END AS status
       |  FROM orders WHERE o_orderkey < $KeyBound
       |),
       |-- T3: final watermark = lexicographic max (snapshot, version)
       |wm AS (SELECT ack, max(snap * 100 + v) AS m FROM ev GROUP BY ack),
       |-- transfers survive when announced (status <> 0) and the announcing
       |-- account is a party (P6 drops the k%11=0 foreign-credit rows)
       |xfer AS (
       |  SELECT ack, count(*) AS n_transfers FROM ev
       |  WHERE status <> 0 AND k % 11 <> 0 GROUP BY ack
       |)
       |SELECT a.tenant, a.name, a.currency, a.format,
       |  CAST(COALESCE(w.m // 100, 0) AS INT) AS last_syn_snapshot,
       |  CAST(COALESCE(w.m % 100, 0) AS INT) AS last_syn_event,
       |  CAST(COALESCE(x.n_transfers, 0) AS BIGINT) AS n_transfers
       |FROM acct a
       |LEFT JOIN wm w ON w.ack = a.ck
       |LEFT JOIN xfer x ON x.ack = a.ck
       |ORDER BY a.ck""".stripMargin

  /** The 100 TB HYBRID sync gated end-to-end: the first wave's tiny files
    * are gone — compacted into a parquet manifest — and every pass reads
    * manifest ∪ live tail. The manifest is LOAD-BEARING, not decorative:
    * pass 1 syncs over an EMPTY journal tree, so all first-wave accounts,
    * events, and transactions exist only if the compacted history really
    * substitutes for the tree (a broken manifest union erases 50 accounts
    * from the hash). Pass 2 adds the live tail (second wave + late
    * canaries — skipped against watermarks the MANIFEST events set); pass
    * 3 must discover nothing. Final state is identical to the 3-pass
    * full-tree pipeline, so the same oracle gates both.
    */
  def syncStateHybrid(s: SparkSession, dir: String): DataFrame = {
    import JournalGate.{buildPerJvm, fixtureRoot, writeOnce}
    val j1 = writeOnce(fixtureRoot("sync_p1", dir))(writeJournal(s, dir, _, pass2 = false))
    val tail = writeOnce(fixtureRoot("sync_tail", dir))(
      writeJournal(s, dir, _, pass2 = true, tailOnly = true))
    val empty = writeOnce(fixtureRoot("sync_empty", dir))(
      java.nio.file.Files.createDirectories(_): Unit)
    val wh = buildPerJvm(fixtureRoot("sync_whh", dir)) { tmp =>
      val m = tmp.resolve("manifest").toString
      Journal.compact(s, j1.toString, m)
      Warehouse.sync(s, empty.toString, tmp.toString, manifestDir = Some(m))
      Warehouse.sync(s, tail.toString, tmp.toString, manifestDir = Some(m))
      val third = Warehouse.sync(s, tail.toString, tmp.toString, manifestDir = Some(m))
      require(third == Warehouse.SyncStats(0, 0, 0),
        s"hybrid re-sync of an unchanged journal discovered rows: $third")
    }
    val account = s.read.parquet(s"$wh/account")
    val credits = s.read.parquet(s"$wh/transfer")
      .groupBy(col("credit_name").as("name"))
      .agg(count(lit(1)).as("n_transfers"))
    account.join(credits, Seq("name"), "left")
      .withColumn("n_transfers", coalesce(col("n_transfers"), lit(0L)))
      .select("tenant", "name", "currency", "format",
        "last_syn_snapshot", "last_syn_event", "n_transfers")
      .orderBy(expr("CAST(substring(name, 2, 10) AS LONG)"))
  }

  /** The STREAMING journal sync (T2 as Structured Streaming) under the
    * oracle: [[graft.streaming.JournalStream]] drains the full two-wave
    * journal through the checkpointed file source + idempotent
    * foreachBatch merge (Trigger.AvailableNow), then a RESTART over the
    * unchanged journal must add nothing — exactly-once from source
    * bookkeeping (the reference's timer loop + ON CONFLICT dance, T6).
    * The stream is the transfer path only (no watermark pipeline), so it
    * parses EVERY transaction file — including the late-canary
    * transactions the batch sync's event watermarks skip — and the oracle
    * counts accordingly: per credit account, all announced transfers and
    * how many are committed.
    */
  def syncStream(s: SparkSession, dir: String): DataFrame = {
    import JournalGate.{buildPerJvm, fixtureRoot, writeOnce}
    import org.apache.spark.sql.streaming.Trigger
    val j2 = writeOnce(fixtureRoot("sync_p2", dir))(writeJournal(s, dir, _, pass2 = true))
    val wh = buildPerJvm(fixtureRoot("sync_whs", dir)) { tmp =>
      val ckpt = tmp.resolve("ckpt").toString
      val whd = tmp.resolve("wh").toString
      def drain(): Unit = {
        val q = graft.streaming.JournalStream.start(
          s, j2.toString, whd, ckpt, Trigger.AvailableNow())
        q.awaitTermination()
      }
      drain()
      val before = s.read.parquet(s"$whd/transfer").count()
      drain() // restart, unchanged journal: checkpoint must suppress all
      val after = s.read.parquet(s"$whd/transfer").count()
      require(after == before,
        s"streaming re-sync of an unchanged journal appended rows: $before -> $after")
    }
    s.read.parquet(s"$wh/wh/transfer")
      .groupBy(col("credit_name").as("name"))
      .agg(count(lit(1)).as("n_transfers"),
        sum(when(col("status") === 1, 1L).otherwise(0L)).as("n_committed"))
      .orderBy(expr("CAST(substring(name, 2, 10) AS LONG)"))
  }

  private val syncStreamSql =
    s"""WITH ev AS (
       |  SELECT o_orderkey AS k, o_custkey % 50 AS ack,
       |         CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'P' THEN 2 ELSE 0 END AS status
       |  FROM orders WHERE o_orderkey < $KeyBound
       |),
       |x AS (
       |  SELECT CASE WHEN k % 11 = 0 THEN 'c' || CAST(ack + 1000 AS VARCHAR)
       |              ELSE 'c' || CAST(ack AS VARCHAR) END AS name, status
       |  FROM ev
       |  UNION ALL
       |  -- late-canary transactions: real files, so the stream parses them
       |  SELECT 'c' || CAST(ack AS VARCHAR), status FROM ev
       |  WHERE k < $PassSplit AND k % 13 = 0
       |)
       |SELECT name, count(*) AS n_transfers,
       |  CAST(sum(CASE WHEN status = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_committed
       |FROM x GROUP BY 1
       |ORDER BY CAST(substring(name, 2, 10) AS BIGINT)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sync_state" -> (syncState(_, _)),
    "q_sync_hybrid" -> (syncStateHybrid(_, _)),
    "q_sync_stream" -> (syncStream(_, _)))

  val oracles: Map[String, String] = Map(
    "q_sync_state" -> syncStateSql,
    "q_sync_hybrid" -> syncStateSql,
    "q_sync_stream" -> syncStreamSql)
}
