package graft

import java.nio.file.{Files, Path}

import graft.streaming.JournalStream
import graft.warehouse.Warehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental-sync behavior: watermark advancement (T3/P8), ownership and
  * status-assert filters (P6/P7), and the Structured Streaming variant (T2).
  */
class SyncSpec extends SparkSpec {

  private def put(root: Path, rel: String, content: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  /** Fixture with one committed 1 CZK transfer CREDIT←DEBIT (event v1). */
  private def baseFixture(): Path = {
    val root = Files.createTempDirectory("journal")
    put(root, "t_T/account/CREDIT/snapshot/0000000000", "CZK FORMAT_T\n")
    put(root, "t_T/account/DEBIT/snapshot/0000000000", "CZK FORMAT_T\n")
    put(root, "t_T/account/CREDIT/events/0000000000/1_1_TRN", "1\n")
    put(root, "t_T/account/DEBIT/events/0000000000/1_-1_TRN", "1\n")
    put(root, "t_T/transaction/TRN",
      "committed\nTRX T CREDIT T DEBIT 2020-01-01T00:00:00Z 1 CZK\n")
    root
  }

  test("sync advances account watermarks and skips synced events") {
    val root = baseFixture()
    val wh = Files.createTempDirectory("wh").toString
    // A2 discovery counters (reference metrics.feature: tenant=1,
    // account=2, transfer=1 for a scenario-3-shaped journal)
    val stats = Warehouse.sync(spark, root.toString, wh)
    assert(stats == Warehouse.SyncStats(1, 2, 1))

    val marks = spark.read.parquet(s"$wh/account")
      .select("name", "last_syn_snapshot", "last_syn_event")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(marks == Map("CREDIT" -> (0, 1), "DEBIT" -> (0, 1)))
    assert(spark.read.parquet(s"$wh/transfer").count() == 1)

    // second event (v2) lands: only it is ingested on the next pass
    put(root, "t_T/account/CREDIT/events/0000000000/1_1_TRN2", "2\n")
    put(root, "t_T/account/DEBIT/events/0000000000/1_-1_TRN2", "2\n")
    put(root, "t_T/transaction/TRN2",
      "committed\nTRX2 T CREDIT T DEBIT 2020-01-02T00:00:00Z 2 CZK\n")
    Warehouse.sync(spark, root.toString, wh)

    val marks2 = spark.read.parquet(s"$wh/account")
      .select("name", "last_syn_event").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(marks2 == Map("CREDIT" -> 2, "DEBIT" -> 2))
    val transfers = spark.read.parquet(s"$wh/transfer")
      .select("transfer").orderBy("transfer").collect().map(_.getString(0)).toSeq
    assert(transfers == Seq("TRX", "TRX2"))

    // third pass on an unchanged journal is a no-op, counters all zero
    assert(Warehouse.sync(spark, root.toString, wh) == Warehouse.SyncStats(0, 0, 0))
    assert(spark.read.parquet(s"$wh/transfer").count() == 2)
  }

  test("sync ingests a rotated snapshot's events despite restarted versions") {
    val root = baseFixture()
    val wh = Files.createTempDirectory("wh").toString
    Warehouse.sync(spark, root.toString, wh) // watermark now (0, 1)

    // snapshot rotates to 1; event versions RESTART at 1 (ref
    // PrimaryDataExplorationService.scala:157-158) — version 1 is <= the
    // stored last_syn_event, so a watermark that compares versions across
    // snapshots would silently drop this event and lose TRX3
    put(root, "t_T/account/CREDIT/events/0000000001/1_1_TRN3", "1\n")
    put(root, "t_T/account/DEBIT/events/0000000001/1_-1_TRN3", "1\n")
    put(root, "t_T/transaction/TRN3",
      "committed\nTRX3 T CREDIT T DEBIT 2020-02-01T00:00:00Z 5 CZK\n")
    val stats = Warehouse.sync(spark, root.toString, wh)
    assert(stats.newTransfers == 1)

    val marks = spark.read.parquet(s"$wh/account")
      .select("name", "last_syn_snapshot", "last_syn_event")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(marks == Map("CREDIT" -> (1, 1), "DEBIT" -> (1, 1)))
    assert(Warehouse.sync(spark, root.toString, wh) == Warehouse.SyncStats(0, 0, 0))
  }

  test("sync ignores transfers whose transaction no event announced") {
    val root = baseFixture()
    // orphan transaction file: no event references it -> not ingested
    put(root, "t_T/transaction/ORPHAN",
      "committed\nTRX9 T CREDIT T DEBIT 2020-01-03T00:00:00Z 9 CZK\n")
    val wh = Files.createTempDirectory("wh").toString
    Warehouse.sync(spark, root.toString, wh)
    assert(spark.read.parquet(s"$wh/transfer").count() == 1)
  }

  test("sync raises on event/transfer status mismatch (P7)") {
    val root = baseFixture()
    // event announces status 2 (rollbacked) but the transaction says committed
    put(root, "t_T/account/CREDIT/events/0000000000/2_1_TRNBAD", "2\n")
    put(root, "t_T/transaction/TRNBAD",
      "committed\nTRXB T CREDIT T DEBIT 2020-01-04T00:00:00Z 3 CZK\n")
    val wh = Files.createTempDirectory("wh").toString
    val e = intercept[IllegalStateException] {
      Warehouse.sync(spark, root.toString, wh)
    }
    assert(e.getMessage.contains("status"))
  }

  test("streaming sync ingests files appended mid-run (T2)") {
    val root = baseFixture()
    val wh = Files.createTempDirectory("whs").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val q = JournalStream.start(spark, root.toString, wh, ckpt,
      trigger = Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$wh/transfer").count() == 1)
      // a new transaction file appears while the query runs
      put(root, "t_T/transaction/TRN2",
        "committed\nTRX2 T CREDIT T DEBIT 2020-01-02T00:00:00Z 2 CZK\n")
      q.processAllAvailable()
      val transfers = spark.read.parquet(s"$wh/transfer")
        .select("transfer").orderBy("transfer").collect().map(_.getString(0)).toSeq
      assert(transfers == Seq("TRX", "TRX2"))
    } finally q.stop()
  }
  test("hybrid sync: manifest history + live tail equals full-tree sync") {
    // full journal: base + one extra account/event/transaction (the tail)
    val full = baseFixture()
    put(full, "t_T/account/LATE/snapshot/0000000000", "EUR FORMAT_T\n")
    put(full, "t_T/account/LATE/events/0000000000/1_1_TRN9", "1\n")
    put(full, "t_T/transaction/TRN9",
      "committed\nTRX9 T LATE T DEBIT 2021-01-01T00:00:00Z 2 CZK\n")

    // reference result: one sync over the whole tree
    val whFull = Files.createTempDirectory("whfull").toString
    Warehouse.sync(spark, full.toString, whFull)

    // hybrid: compact the BASE history, keep only the tail as live files
    // (plus one overlapping file present in both, to prove the dedupe)
    val m = Files.createTempDirectory("manifest").toString
    val base = baseFixture()
    graft.sources.Journal.compact(spark, base.toString, m)
    val tail = Files.createTempDirectory("tail")
    put(tail, "t_T/account/LATE/snapshot/0000000000", "EUR FORMAT_T\n")
    put(tail, "t_T/account/LATE/events/0000000000/1_1_TRN9", "1\n")
    put(tail, "t_T/transaction/TRN9",
      "committed\nTRX9 T LATE T DEBIT 2021-01-01T00:00:00Z 2 CZK\n")
    put(tail, "t_T/transaction/TRN",
      "committed\nTRX T CREDIT T DEBIT 2020-01-01T00:00:00Z 1 CZK\n") // overlap
    val whHybrid = Files.createTempDirectory("whhybrid").toString
    val stats = Warehouse.sync(spark, tail.toString, whHybrid,
      manifestDir = Some(m))
    assert(stats == Warehouse.SyncStats(1, 3, 2))

    def dump(wh: String, t: String): Set[String] =
      spark.read.parquet(s"$wh/$t").collect().map(_.toString).toSet
    for (t <- Seq("tenant", "account", "transfer"))
      assert(dump(whHybrid, t) == dump(whFull, t), s"table $t diverged")

    // idempotent hybrid re-sync discovers nothing
    assert(Warehouse.sync(spark, tail.toString, whHybrid, manifestDir = Some(m))
      == Warehouse.SyncStats(0, 0, 0))
  }

  test("balance MV root dispatches backend by scheme; copy-rename stores fail fast") {
    // r19: an hdfs:// warehouseDir routes the SAME commit protocol
    // through the Hadoop backend (atomic rename on the NameNode) and the
    // root stays on that filesystem — never a bogus local path. Object
    // stores whose rename is copy+delete still error with adapter
    // guidance rather than committing on a non-atomic primitive.
    val (hdfsStore, hdfsRoot) = Warehouse.balancesRoot("hdfs://nn:8020/wh")
    assert(hdfsRoot == "hdfs://nn:8020/wh/balances")
    assert(hdfsStore.isInstanceOf[graft.operators.VStore.Hadoop])
    intercept[IllegalArgumentException] {
      Warehouse.balancesRoot("s3a://bucket/wh")
    }
    val (localStore, localRoot) = Warehouse.balancesRoot("/tmp/wh")
    assert(localRoot == "/tmp/wh/balances"
      && localStore == graft.operators.VStore.Local)
    val (fileStore, fileRoot) = Warehouse.balancesRoot("file:/tmp/wh")
    assert(fileRoot == "/tmp/wh/balances"
      && fileStore == graft.operators.VStore.Local)
  }
}
