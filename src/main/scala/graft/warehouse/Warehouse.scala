package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The warehouse core: idempotent merge primitives and the derived
  * balance-change table.
  *
  * The reference mirrors journal discoveries into Postgres with
  * `INSERT .. ON CONFLICT` upserts (SecondaryPersistence.scala:30-127).
  * On Parquet the same effectively-once semantics come from key-based
  * set operations:
  *   - insert-only keys (tenant, transfer): `left_anti` of discovered vs
  *     existing, then append (S7/S9, J3/E1);
  *   - keep-latest upsert (account with watermark columns): union + window
  *     `row_number()` rewrite (S8, §2e).
  * Both are shuffle-on-key operations that scale horizontally; neither
  * touches the driver.
  */
object Warehouse {

  /** Per-pass discovery counters — the reference's statsd
    * `discovery.tenant/account/transfer` metrics (A2,
    * PrimaryDataExplorationService.scala:58, 92, 247;
    * metrics/StatsDClient.scala:25-26). Collected via `Dataset.observe`, so
    * the counts ride the merge writes instead of costing extra passes.
    */
  final case class SyncStats(newTenants: Long, newAccounts: Long, newTransfers: Long)

  /** The balance-MV root plus the [[graft.operators.VStore]] backend its
    * scheme selects (r19 — the r18 local-only fail-fast retired): ONE
    * dispatcher, [[graft.operators.VStore.forRoot]] — schemeless/file:
    * take the java.nio fast path (normalized, so `file:/wh` and `/wh`
    * publish to the same place), allowlisted atomic-rename schemes
    * (hdfs://, …) commit the SAME protocol through the Hadoop backend,
    * and copy-rename object stores fail fast with adapter guidance
    * (route the MV through spark.graft.balance.mvPath + the
    * deployment's table-format commit there). */
  private[graft] def balancesRoot(warehouseDir: String)
      : (graft.operators.VStore, String) = {
    val (st, root) = graft.operators.VStore.forRoot(warehouseDir)
    (st, st.child(root, "balances"))
  }

  /** `INSERT … ON CONFLICT DO NOTHING` ≡ rows of `discovered` whose key is
    * absent from `existing` (left_anti), appended by the caller.
    * Ref: SecondaryPersistence.scala:30-58, 96-127.
    */
  def newRows(discovered: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    discovered
      .dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*), keys, "left_anti")

  /** `INSERT … ON CONFLICT DO UPDATE` ≡ keep the newest version of each key
    * across existing ∪ incoming. Incoming rows beat existing rows on a key
    * clash; `version` columns (descending) break ties among multiple
    * incoming rows for the same key, so the survivor is deterministic —
    * a bare precedence window would pick an arbitrary row when one batch
    * carries two updates for one key.
    * Ref: SecondaryPersistence.scala:60-94 (account upsert).
    */
  def upsert(incoming: DataFrame, existing: DataFrame, keys: Seq[String],
             version: Seq[String] = Seq.empty): DataFrame = {
    val inc = incoming.withColumn("__prec", lit(1))
    val ex  = existing.withColumn("__prec", lit(0))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__prec").desc +: version.map(col(_).desc): _*)
    ex.unionByName(inc)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__prec", "__rn")
  }

  /** Derived `account_balance_change`: each committed transfer contributes
    * +amount to its credit account and −amount to its debit account — a
    * 2-way unpivot via `stack` (stays inside whole-stage codegen; no
    * self-union double-scan).
    *
    * Semantics inferred from the reference's black-box test
    * (bbtest/features/graphql_api.feature:95-142): one committed 1 CZK
    * transfer ⇒ credit balance +1, debit −1; `account_balance_change` itself
    * is only ever read (GraphQLPersistence.scala:68-85, :370-403).
    */
  def balanceChanges(transfers: DataFrame): DataFrame =
    transfers
      .filter(col("status") === 1)
      .select(
        expr("stack(2, credit_tenant, credit_name, amount, debit_tenant, debit_name, -amount)")
          .as(Seq("tenant", "name", "amount")),
        col("value_date"))

  /** balance(tenant, name) = SUM(amount) over balance changes, 0 when the
    * account has none. Ref: GraphQLPersistence.scala:370-403 (A1).
    * Partial+final hash aggregate; grouped form so one pass serves every
    * account (the reference recomputes per account per query).
    */
  def balances(balanceChanges: DataFrame): DataFrame =
    balanceChanges
      .groupBy(col("tenant"), col("name"))
      .agg(sum(col("amount")).cast(DecimalType(38, 18)).as("balance"))

  /** The (tenant, name) → SUM(amount) pre-aggregate at the Sum's OWN
    * type — the stored artifact [[graft.plans.BalanceMvRewrite]]
    * substitutes for the lake-wide aggregate (the rule's type check
    * requires the stored column to carry exactly the Sum's result type;
    * wrapper casts in queries re-apply above the substitution). ONE
    * spelling shared by the sync-path maintenance, the MV gates, and the
    * incremental-merge gate.
    */
  def balancePreAgg(transfers: DataFrame): DataFrame =
    balanceChanges(transfers)
      .groupBy(col("tenant"), col("name"))
      .agg(sum(col("amount")).as("balance"))

  /** Point-lookup balance for ONE account. The generic path (`balances ∘
    * balanceChanges` then filter) leaves the (tenant, name) predicate
    * ABOVE the `stack` unpivot — Catalyst cannot infer the credit/debit
    * disjunction through the generator, so a single account's balance
    * scans every transfer row. Spelling the disjunction out pushes it into
    * the parquet scan (row-group skipping on credit_/debit_name stats):
    * the aggregate then reads only the account's own transfers.
    */
  def balanceOf(transfers: DataFrame, tenant: String, name: String): DataFrame =
    balances(balanceChanges(
      transfers.filter(
        (col("credit_tenant") === lit(tenant) && col("credit_name") === lit(name)) ||
          (col("debit_tenant") === lit(tenant) && col("debit_name") === lit(name))))
      .filter(col("tenant") === lit(tenant) && col("name") === lit(name)))

  /** Balances restricted to the accounts of `keys` (any frame carrying
    * tenant, name — typically a paginated account page). The semi join
    * sits BELOW the aggregate, so a bounded page aggregates only its own
    * accounts' balance changes instead of every account ever seen; AQE
    * broadcasts the page side when it is small. (The per-name scan
    * disjunction of [[balanceOf]] doesn't generalize to N names — parquet
    * pushdown can't express it through the unpivot — so scoping the
    * aggregate is the page-shaped equivalent.)
    */
  def balancesFor(transfers: DataFrame, keys: DataFrame): DataFrame =
    balances(balanceChanges(transfers)
      .join(keys.select(col("tenant"), col("name")).distinct(),
        Seq("tenant", "name"), "left_semi"))

  /** One incremental ETL pass: journal → warehouse tables, idempotently
    * merged into `warehouseDir` (parquet dirs tenant/account/transfer).
    * Re-running on an unchanged journal is a no-op (T6 effectively-once).
    *
    * Mirrors the reference exploration loop
    * (PrimaryDataExplorationService.scala:116-264) Spark-first:
    *   1. tenants + newly-discovered accounts insert-only (S7/S8-insert);
    *   2. events past each account's watermark (P8: snapshot_version ≥
    *      last_syn_snapshot, version > last_syn_event);
    *   3. transfers of those events' transactions, kept only where the
    *      event's account is the credit or debit party (P6, ref :215-218),
    *      with the transfer-status-vs-event-status assertion (P7, :219-226);
    *   4. new transfers appended (anti-join on key, J3/E1);
    *   5. account watermarks advanced via keep-latest upsert (T3, :260-264)
    *      with the (last_syn_snapshot, last_syn_event) version tie-break.
    *
    * At 100 TB the tables would be `partitionBy("tenant")` so tenant-scoped
    * queries prune partitions, and the account-table rewrite in step 5 would
    * be a Delta/Iceberg MERGE instead of the write-new-then-swap used on
    * plain parquet here (the swap keeps the overwrite safe while the plan
    * still reads the old files).
    */
  def sync(spark: SparkSession, journalRoot: String, warehouseDir: String,
           partitionByTenant: Boolean = false,
           metrics: graft.metrics.MetricsEmitter = graft.metrics.MetricsEmitter.Disabled,
           manifestDir: Option[String] = None): SyncStats = {
    import graft.sources.Journal
    import org.apache.spark.sql.Observation

    // Hybrid source (the at-scale operating mode): compacted history from
    // the parquet manifest (Journal.compact) plus the live tiny-file tail
    // under journalRoot, deduplicated per FILE (Journal.*Hybrid) — a file
    // that is both compacted and still on disk contributes once, so
    // compaction and deletion of the originals need not be atomic, while
    // duplicate records inside one file survive exactly as in a full read.
    def entity(live: => DataFrame, hybrid: String => DataFrame): DataFrame =
      manifestDir match {
        case Some(m) => hybrid(m)
        case None => live
      }

    val hconf = spark.sparkContext.hadoopConfiguration
    def tablePath(name: String) = new org.apache.hadoop.fs.Path(s"$warehouseDir/$name")

    // recover from a crash inside a previous pass's account-table swap:
    // if only the retired copy survives, promote it back
    locally {
      val fs = tablePath("account").getFileSystem(hconf)
      if (!fs.exists(tablePath("account")) && fs.exists(tablePath("account_old")))
        fs.rename(tablePath("account_old"), tablePath("account"))
      fs.delete(tablePath("account_old"), true)
      fs.delete(tablePath("account_new"), true)
      // the balance MV needs no recovery block: it lives in a
      // VersionedRoot (immutable version dirs + atomic pointer), where a
      // crashed publish leaves an orphan claim the next publish skips
    }

    def readOr(name: String, empty: => DataFrame): DataFrame = {
      val p = tablePath(name)
      if (p.getFileSystem(hconf).exists(p)) spark.read.parquet(p.toString)
      else empty
    }

    // A2 discovery counters: observe the merge write itself (no extra pass)
    def append(df: DataFrame, name: String, parts: Seq[String]): Long = {
      val obs = Observation()
      val w = df.observe(obs, count(lit(1)).as("n")).write.mode("append")
      (if (partitionByTenant && parts.nonEmpty) w.partitionBy(parts: _*) else w)
        .parquet(s"$warehouseDir/$name")
      obs.get("n").asInstanceOf[Long]
    }

    val tenants = entity(Journal.tenants(spark, journalRoot),
      Journal.tenantsHybrid(spark, journalRoot, _))
    val accounts = entity(Journal.accounts(spark, journalRoot),
      Journal.accountsHybrid(spark, journalRoot, _))

    val nTenants =
      append(newRows(tenants, readOr("tenant", tenants.limit(0)), Seq("name")),
        "tenant", Seq.empty)
    val nAccounts =
      append(newRows(accounts, readOr("account", accounts.limit(0)), Seq("tenant", "name")),
        "account", Seq("tenant"))

    val accountTable = readOr("account", accounts.limit(0))

    // P8: watermark filter — events already mirrored are skipped. Event
    // versions restart per snapshot (ref :157-158), so the version guard
    // applies ONLY within the watermark snapshot; any newer snapshot's
    // events are all unseen regardless of their (restarted) version
    // (ref PrimaryDataExplorationService.scala:171-175).
    val events = entity(Journal.events(spark, journalRoot),
      Journal.eventsHybrid(spark, journalRoot, _))
      .join(accountTable.select(col("tenant"), col("name").as("account"),
        col("last_syn_snapshot"), col("last_syn_event")), Seq("tenant", "account"))
      .filter(col("snapshot_version") > col("last_syn_snapshot") ||
        (col("snapshot_version") === col("last_syn_snapshot") &&
          col("version") > col("last_syn_event")))
      .cache()

    // Transfers of non-pending events' transactions, P6 ownership-filtered:
    // the announcing account must be one side of the transfer.
    val announced = events.filter(col("status") =!= 0)
      .select(col("tenant"), col("account"), col("transaction"),
        col("status").as("event_status"))
    val txTransfers = entity(Journal.transfers(spark, journalRoot),
      Journal.transfersHybrid(spark, journalRoot, _))
      .join(announced, Seq("tenant", "transaction"))
      .filter(col("credit_name") === col("account") ||
        col("debit_name") === col("account"))

    // P7: a transfer whose parsed status disagrees with its announcing
    // event's status is journal corruption — fail the pass (ref :219-226).
    val mismatches = txTransfers.filter(col("status") =!= col("event_status")).count()
    if (mismatches > 0)
      throw new IllegalStateException(
        s"$mismatches transfer(s) with status differing from their announcing event")

    val discovered = txTransfers.drop("account", "event_status")
    val nTransfers =
      append(newRows(discovered, readOr("transfer", discovered.limit(0)),
        Seq("tenant", "transaction", "transfer")), "transfer", Seq("tenant"))

    // T3: advance per-account watermarks through the keep-latest upsert.
    // The new watermark is the lexicographic max of (snapshot, version) —
    // pairing max(snapshot) with the global max(version) ACROSS snapshots
    // would fabricate a watermark no event carries and skip real events
    // after a snapshot rotation (versions restart per snapshot).
    val marks = events.groupBy(col("tenant"), col("account").as("name"))
      .agg(max(struct(col("snapshot_version"), col("version"))).as("__m"))
      .select(col("tenant"), col("name"),
        col("__m.snapshot_version").as("last_syn_snapshot"),
        col("__m.version").as("last_syn_event"))
    if (!marks.isEmpty) {
      val updated = accountTable
        .join(marks, Seq("tenant", "name"), "left_semi")
        .drop("last_syn_snapshot", "last_syn_event")
        .join(marks, Seq("tenant", "name"))
        .select(accountTable.columns.map(col): _*)
      val merged = upsert(updated, accountTable, Seq("tenant", "name"),
        Seq("last_syn_snapshot", "last_syn_event"))
      // write-new-then-swap: the merged plan reads the live account files,
      // so a direct overwrite would delete its own input mid-plan. The
      // retire-then-promote rename order means a crash at any point leaves
      // either `account` or `account_old` intact (recovered at pass start);
      // a table format (Delta/Iceberg MERGE) is the real answer at scale.
      val fs = tablePath("account").getFileSystem(hconf)
      val w = merged.write.mode("overwrite")
      (if (partitionByTenant) w.partitionBy("tenant") else w)
        .parquet(s"$warehouseDir/account_new")
      fs.rename(tablePath("account"), tablePath("account_old"))
      fs.rename(tablePath("account_new"), tablePath("account"))
      fs.delete(tablePath("account_old"), true)
    }
    // M10 at ingest, executed: the sync pass maintains the balance
    // pre-agg the BalanceMvRewrite optimizer rule serves from
    // (`$warehouseDir/balances`), so API sessions installing the rule
    // answer full-lake balance reports from |accounts| rows. The MV is
    // PUBLISHED through [[graft.operators.VersionedRoot]] — immutable
    // `v<N>` dirs plus one atomic CURRENT pointer — so a serving session
    // mid-scan on the previous version never has files yanked from under
    // it (the swap-while-serving contract CompactionSpec pins, now the
    // production write path); readers resolve CURRENT once per
    // plan/refresh (HttpEdge.installMvRule, BalanceMvRewrite.fromConf).
    // The vacuum horizon is a POLICY KNOB (spark.graft.balance
    // .mvKeepVersions, default 2): retire(keep=K) guarantees a reader
    // that pinned a version survives K-1 subsequent sync publishes, so
    // the deployment contract is "edges refresh() at least every K-1
    // syncs" — the default prices one missed refresh; size K to the
    // real refresh cadence (or to a time horizon) in production. At
    // 100 TB under a transactional table format the refresh becomes the
    // q_balance_mv_incr delta MERGE, whose cost is this pass's appended
    // transfers, not the lake.
    locally {
      import graft.operators.VersionedRoot
      val (mvStore, mvRoot) = Warehouse.balancesRoot(warehouseDir)
      if (nTransfers > 0 || !VersionedRoot.publishedAt(mvStore, mvRoot)) {
        // the refresh MUST NOT be answered by the very rule it feeds: on
        // a serving session the installed rewrite matches this exact
        // aggregate and would publish a copy of the OLD version
        graft.plans.BalanceMvRewrite.suppressed {
          VersionedRoot.publishAt(mvStore, mvRoot, vdir =>
            balancePreAgg(readOr("transfer", discovered.limit(0)))
              .write.mode("overwrite").parquet(vdir)): Unit
        }
        val keep = spark.conf
          .get("spark.graft.balance.mvKeepVersions", "2").toInt
        VersionedRoot.retireAt(mvStore, mvRoot, keep = keep)
      }
    }
    events.unpersist()
    // A2 transport: the observed counters leave the process in the
    // reference's statsd aspect names (PrimaryDataExplorationService
    // .scala:58, 92, 247 + memory gauge, asserted by
    // bbtest/features/metrics.feature:31-37)
    metrics.count("discovery.tenant", nTenants)
    metrics.count("discovery.account", nAccounts)
    metrics.count("discovery.transfer", nTransfers)
    val rt = Runtime.getRuntime
    metrics.gauge("memory.bytes", rt.totalMemory() - rt.freeMemory())
    SyncStats(nTenants, nAccounts, nTransfers)
  }
}
