package graft.operators

import java.math.RoundingMode
import java.nio.file.{Files, Path, Paths}

import graft.Tables
import graft.sources.Journal
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Oracle gates for the journal SOURCE operators (S1-S5, T1, F1-F5): each
  * query materializes a deterministic journal fixture derived from the
  * parquet testdata, runs the real distributed parse on the files, and the
  * DuckDB oracle recomputes the expected rows straight from the parquet —
  * so the filename/layout/line parsing itself is what the hash compare
  * checks.
  *
  * Fixture writing is driver-side file IO over a bounded slice (~300
  * rows) — it builds TEST INPUT, not query results; the parse under test
  * is the distributed glob/wholetext plan in graft.sources.Journal. The
  * fixture content is a pure function of the testdata, so re-runs reuse
  * the directory.
  */
object JournalGate {

  /** Bounded deterministic slice: orders with key below this. */
  private val KeyBound = 1200

  private[graft] def fixtureRoot(kind: String, dir: String): Path =
    Paths.get("/tmp", s"graft_journal_${kind}_" +
      dir.replaceAll("[^a-zA-Z0-9]", "_"))

  private[operators] def writeOnce(root: Path)(write: Path => Unit): Path = {
    if (!Files.exists(root)) {
      val tmp = Paths.get(root.toString + ".building")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      write(tmp)
      if (!tmp.toFile.renameTo(root.toFile)) {
        // lost a concurrent race: the other writer's identical fixture wins
        org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      }
    }
    root
  }

  /** Like writeOnce, but rebuilt on each JVM's FIRST use: for directories
    * holding the OUTPUT of code under test (compacted manifests, synced
    * warehouses). A cross-run cache would silently re-hash stale output
    * after the code changes; a per-call rebuild would make bench re-time
    * the build instead of the gated read path. Once per JVM gives every
    * verify/bench run fresh output while warmup/timed runs share it.
    */
  private val builtThisJvm = new java.util.concurrent.ConcurrentHashMap[String, Path]()
  private[graft] def buildPerJvm(root: Path)(write: Path => Unit): Path =
    builtThisJvm.computeIfAbsent(root.toString, { _ =>
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
      val tmp = Paths.get(root.toString + ".building")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      write(tmp)
      if (!tmp.toFile.renameTo(root.toFile))
        throw new IllegalStateException(s"could not promote $tmp to $root")
      root
    })

  private[operators] def put(root: Path, rel: String, content: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private def statusWord(s: String): String =
    s match { case "F" => "committed"; case "P" => "rollbacked"; case _ => "promised" }

  /** S5/T1/F2/F4/F5: transaction files (status line + transfer records)
    * written from the orders slice, parsed back by the distributed
    * wholetext plan.
    */
  private def txFixture(s: SparkSession, dir: String): Path =
    writeOnce(fixtureRoot("tx", dir)) { tmp =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < KeyBound)
        .select("o_orderkey", "o_orderstatus", "o_custkey", "o_orderdate", "o_totalprice")
        .collect().foreach { r: Row =>
          val k = r.getLong(0)
          val amount = java.math.BigDecimal.valueOf(r.getDouble(4))
            .setScale(2, RoundingMode.HALF_UP).toPlainString
          // o_orderdate reads as TIMESTAMP_NTZ (naive parquet timestamp)
          val day = r.getAs[java.time.LocalDateTime](3).toLocalDate
          put(tmp, s"t_T/transaction/$k",
            s"${statusWord(r.getString(1))}\n" +
              s"x$k T c${r.getLong(2)} T b${k % 7} " +
              s"${day}T00:00:00Z $amount CZK\n")
        }
    }

  def journalTransfers(s: SparkSession, dir: String): DataFrame = {
    val root = txFixture(s, dir)
    Journal.transfers(s, root.toString)
      .withColumn("amount", col("amount").cast("double"))
      .withColumn("value_date", col("value_date").cast(TimestampNTZType))
      .orderBy(col("transaction").cast("long"))
  }

  private val journalTransfersSql =
    s"""SELECT 'T' AS tenant, CAST(o_orderkey AS VARCHAR) AS transaction,
       |  'x' || CAST(o_orderkey AS VARCHAR) AS transfer,
       |  CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'P' THEN 2 ELSE 0 END AS status,
       |  'T' AS credit_tenant, 'c' || CAST(o_custkey AS VARCHAR) AS credit_name,
       |  'T' AS debit_tenant, 'b' || CAST(o_orderkey % 7 AS VARCHAR) AS debit_name,
       |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       |  'CZK' AS currency, CAST(o_orderdate AS TIMESTAMP) AS value_date
       |FROM orders WHERE o_orderkey < $KeyBound ORDER BY o_orderkey""".stripMargin

  /** S1/S3/F1/F3: tenant directory listing + snapshot-header parse over
    * snapshot-v0 files written from the customer slice.
    */
  def journalAccounts(s: SparkSession, dir: String): DataFrame = {
    val root = writeOnce(fixtureRoot("acct", dir)) { tmp =>
      Tables.load(s, dir, "customer")
        .filter(col("c_custkey") < 100)
        .select("c_custkey", "c_mktsegment", "c_nationkey")
        .collect().foreach { r: Row =>
          val ccy = r.getString(1).substring(0, 3).toUpperCase
          put(tmp, s"t_T/account/c${r.getLong(0)}/snapshot/${Journal.versionSegment(0)}",
            s"$ccy F${r.getInt(2)}_T\n")
        }
    }
    Journal.accounts(s, root.toString)
      .orderBy(expr("CAST(substring(name, 2, 10) AS LONG)"))
  }

  private val journalAccountsSql =
    """SELECT 'T' AS tenant, 'c' || CAST(c_custkey AS VARCHAR) AS name,
      |  upper(substring(c_mktsegment, 1, 3)) AS currency,
      |  'F' || CAST(c_nationkey AS VARCHAR) AS format,
      |  CAST(0 AS INT) AS last_syn_snapshot, CAST(0 AS INT) AS last_syn_event
      |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin

  /** S4/F2/F4: event files whose FILENAME carries status + transaction and
    * whose first line carries the version.
    */
  def journalEvents(s: SparkSession, dir: String): DataFrame = {
    val root = writeOnce(fixtureRoot("ev", dir)) { tmp =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < KeyBound)
        .select("o_orderkey", "o_orderstatus", "o_custkey")
        .collect().foreach { r: Row =>
          val k = r.getLong(0)
          val status = r.getString(1) match { case "F" => 1; case "P" => 2; case _ => 0 }
          put(tmp,
            s"t_T/account/c${r.getLong(2)}/events/${Journal.versionSegment(0)}/${status}_1_x$k",
            s"${k % 5 + 1}\n")
        }
    }
    Journal.events(s, root.toString)
      .orderBy(expr("CAST(substring(transaction, 2, 12) AS LONG)"))
  }

  private val journalEventsSql =
    s"""SELECT 'T' AS tenant, 'c' || CAST(o_custkey AS VARCHAR) AS account,
       |  CAST(0 AS INT) AS snapshot_version,
       |  CAST(CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'P' THEN 2 ELSE 0 END AS INT) AS status,
       |  'x' || CAST(o_orderkey AS VARCHAR) AS transaction,
       |  CAST(o_orderkey % 5 + 1 AS INT) AS version
       |FROM orders WHERE o_orderkey < $KeyBound ORDER BY o_orderkey""".stripMargin

  /** The compaction path under the same oracle as q_journal_transfers:
    * fixture → `Journal.compact` manifest → `transfersFromManifest`. The
    * hash must equal the direct tiny-file parse, and the bench delta
    * vs q_journal_transfers shows what compaction buys (one parquet scan
    * instead of per-file listing + tasks).
    */
  def journalManifest(s: SparkSession, dir: String): DataFrame = {
    val root = txFixture(s, dir)
    val m = buildPerJvm(fixtureRoot("txmanifest", dir)) { tmp =>
      Journal.compact(s, root.toString, tmp.toString)
    }
    Journal.transfersFromManifest(s, m.toString)
      .withColumn("amount", col("amount").cast("double"))
      .withColumn("value_date", col("value_date").cast(TimestampNTZType))
      .orderBy(col("transaction").cast("long"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_journal_transfers" -> (journalTransfers(_, _)),
    "q_journal_accounts" -> (journalAccounts(_, _)),
    "q_journal_events" -> (journalEvents(_, _)),
    "q_journal_manifest" -> (journalManifest(_, _)))

  val oracles: Map[String, String] = Map(
    "q_journal_transfers" -> journalTransfersSql,
    "q_journal_accounts" -> journalAccountsSql,
    "q_journal_events" -> journalEventsSql,
    "q_journal_manifest" -> journalTransfersSql)
}
