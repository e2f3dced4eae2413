package graft

import graft.api.Api
import graft.warehouse.Warehouse
import org.apache.spark.sql.functions._

/** Plan-level assertions — the 100 TB posture checks that row counts can't
  * see: joins must not force-broadcast growing dimensions, filters and
  * projections must reach the parquet scan.
  */
class PlanSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("transfersResolved does not force-broadcast the account dimension") {
    // with the broadcast threshold off, nothing may broadcast: a forced
    // broadcast() hint would still produce BroadcastExchange and OOM at scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val transfers = Seq(("T", "tx1", "t1", 1, "T", "a", "T", "b",
        BigDecimal(1), "CZK", java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
        .toDF("tenant", "transaction", "transfer", "status", "credit_tenant",
          "credit_name", "debit_tenant", "debit_name", "amount", "currency", "value_date")
      val accounts = Seq(("T", "a", "CZK", "F"), ("T", "b", "CZK", "F"))
        .toDF("tenant", "name", "currency", "format")
      val balances = Warehouse.balances(Warehouse.balanceChanges(transfers))
      val plan = Api.transfersResolved(transfers, accounts, balances)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"account-dim join must respect the broadcast threshold:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("filter and projection push into the parquet scan") {
    val df = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_totalprice")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]"),
      s"equality filter must reach the scan:\n$scan")
    assert(scan.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>"),
      s"scan must prune to the referenced columns:\n$scan")
  }

  test("lmPerplexity: one train pass, one scoring pass, id-only rejoin") {
    // the corpus may be read exactly three times — the training bigram
    // explode, the scoring bigram explode, and the doc-universe rejoin —
    // and the rejoin must prune to doc_id alone (a full-row third scan of
    // a 100 TB lake just for the id universe is the regression this pins)
    val (out, c2) = graft.operators.TextOps.lmPerplexityLazy(spark, dir)
    val plan = out.queryExecution.executedPlan.toString
    c2.unpersist(blocking = false)
    assert(!plan.contains("CartesianProduct"),
      s"scoring joins must stay equi-joins:\n$plan")
    val ims = "InMemoryTableScan".r.findAllIn(plan).length
    assert(ims >= 3,
      s"c1/V/scoring must read the cached count table ($ims consumers):\n$plan")
    // each InMemoryTableScan renders its fill plan (one FileScan) inline;
    // the scans that actually run outside the one cache fill are the
    // scoring explode and the doc-universe rejoin
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans - ims <= 2,
      s"expected scoring + id-rejoin reads only, found $scans scans / $ims cached:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"the doc-universe rejoin must read doc_id only:\n$plan")
  }

  test("LM perplexity serving reads the stored counts — no training aggregation") {
    // the per-batch filter path: counts come off the lmidx artifact; the
    // only aggregate in the plan is the per-doc integer sum (one
    // partial+final pair) — a (w1, w2)-keyed count aggregation here would
    // mean the LM retrains per batch, the cost the split exists to remove
    val plan = graft.operators.TextOps.lmPerplexityServe(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("lmidx"),
      s"serving must read the stored count tables:\n$plan")
    // the per-doc n_bigrams count is a legitimate partial_count; what must
    // be ABSENT is any aggregate KEYED on the n-gram columns (a rebuild)
    assert("HashAggregate\\(keys=\\[w1".r.findFirstIn(plan).isEmpty,
      s"serving must not rebuild the count tables:\n$plan")
    assert(!plan.contains("InMemoryTableScan"),
      s"serving needs no cache — the stored tables ARE the reuse:\n$plan")
  }

  test("table profile reads the table once — every stat rides one scan") {
    // a profiler that scans per column (or per stat) turns the first
    // look at a 100 TB table into |columns| full reads
    val plan = graft.operators.Relational.queries("q_table_profile")(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected ONE table scan, found $scans:\n$plan")
  }

  test("snapshot diff joins fingerprints, not rows — unreconciled columns pruned") {
    // the diff carries (key, 32-byte hash) per side through ONE full-outer
    // sort-merge; a scan that still reads o_orderdate would mean the md5
    // fingerprint did not fold into the scan projection
    val plan = graft.operators.Compaction.queries("q_snapshot_diff")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      s"the diff must be one full-outer sort-merge join:\n$plan")
    assert(!plan.contains("o_orderdate"),
      s"unreconciled columns must stay on disk:\n$plan")
  }

  test("CDC apply folds through one key shuffle") {
    // highest-sequence-wins = one precedence window per key: exactly one
    // exchange keyed on k below the window; a second key shuffle would
    // mean ops are being applied in passes instead of one fold
    val plan = graft.operators.Compaction.queries("q_cdc_apply")(spark, dir)
      .queryExecution.executedPlan.toString
    val keyExchanges = "Exchange hashpartitioning\\(k#".r.findAllIn(plan).length
    assert(keyExchanges == 1,
      s"expected ONE key shuffle for the precedence fold, found $keyExchanges:\n$plan")
    assert(plan.contains("Window"), s"the fold must plan as a window:\n$plan")
  }

  test("epoch plan orders shard-locally — no global sort of the exploded corpus") {
    // the operator's whole reason to exist: E epochs of reproducible
    // ordering WITHOUT E global sorts. Below the (epoch, shard) aggregate
    // the only exchange may be the groupBy's hashpartitioning; the one
    // rangepartitioning allowed is the |epochs·shards|-row report edge
    // ABOVE the aggregate (plans print top-down, so "after the last
    // HashAggregate" in the string means "below it in the plan")
    val plan = graft.operators.TextOps.queries("q_epoch_plan")(spark, dir)
      .queryExecution.executedPlan.toString
    val belowAgg = plan.substring(plan.lastIndexOf("HashAggregate"))
    assert(!belowAgg.contains("rangepartitioning"),
      s"corpus-side global sort detected:\n$plan")
    assert("Exchange hashpartitioning\\(epoch#".r.findFirstIn(plan).nonEmpty,
      s"the one corpus shuffle must key on (epoch, shard):\n$plan")
  }

  test("DSIR serving reads the stored λ table — no model refit, heap top-k") {
    // the per-batch selection path: the importance model comes off the
    // dsiridx artifact as a ≤256-row broadcast build side; the only
    // aggregates allowed are the batch's (doc_id, source, b) bucket
    // counts and the per-doc score sum — an aggregate keyed on the bucket
    // ALONE is the λ refit the split exists to remove; the top-k must be
    // a TakeOrderedAndProject (per-partition heap + driver merge), never
    // a global sort of the scored batch
    val plan = graft.operators.TextOps.dsirServe(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dsiridx"),
      s"serving must read the stored importance table:\n$plan")
    assert("HashAggregate\\(keys=\\[b#".r.findFirstIn(plan).isEmpty,
      s"serving must not refit the per-bucket models:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the selection top-k must plan as a heap, not a global sort:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 2,
      s"expected the batch scan + the stored λ read only, found $scans:\n$plan")
  }

  test("unigram serving segments against the stored vocabulary — no refit") {
    // the apply path: the trained piece table comes off the ugidx
    // artifact and rides the unigram_dp kernel as expression literals
    // (r21 — the wordpiece vlit discipline; the stored read is the
    // bounded driver-side collect at plan build, so no ugidx scan node
    // remains in the executed plan). The only aggregates are the batch's
    // distinct-word count (keys=[wt]) and the per-doc sum
    // (keys=[doc_id]) — any aggregate keyed on `piece` is the
    // seed-count / usage / prune machinery the stored vocab exists to
    // remove from the serving plan. Serve-vs-refit equivalence itself is
    // behavioral (LlmOpsSpec's stored-vocab test + the DuckDB oracle).
    val qe = graft.operators.Unigram.unigramTokenize(spark, dir)
      .queryExecution
    val plan = qe.executedPlan.toString
    // the kernel projection collapses into the word aggregate's result
    // expressions, so the physical rendering shows only the output name —
    // witness the kernel on the analyzed plan, where expressions print
    assert(qe.analyzed.toString.contains("unigram_dp"),
      s"serving must segment through the native DP kernel:\n${qe.analyzed}")
    assert("HashAggregate\\(keys=\\[piece".r.findFirstIn(plan).isEmpty,
      s"serving must not refit the vocabulary:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 2,
      s"expected word-count scan + doc rejoin only, found $scans:\n$plan")
  }

  test("keyset cursor predicate reaches the transfer scan") {
    // the O(page) deep-scan contract, over a STORED transfer table (the
    // serving shape — the oracle gate's TPC-H mapping computes
    // `transaction` from o_orderkey, so nothing can push there): the
    // strictly-after disjunction must reach the parquet scan (row-group
    // skipping on transaction stats), and the page must plan as a
    // TakeOrderedAndProject, never a global sort past the cursor
    val tmp = java.nio.file.Files.createTempDirectory("ks").toString
    graft.operators.WarehouseQueries.transferShapeFor(spark, dir)
      .write.mode("overwrite").parquet(s"$tmp/transfer")
    val plan = graft.api.Api.transfersAfter(
        spark.read.parquet(s"$tmp/transfer"), "T",
        graft.api.Api.TransferArgs(status = Some(1)),
        after = Some(("20000", "20000")), limit = 50)
      .queryExecution.executedPlan.toString
    // plan rendering truncates long PushedFilters lists — match the
    // stable prefix of the pushed disjunction
    assert(plan.contains("Or(GreaterThan(trans"),
      s"the cursor bound must be PUSHED into the scan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the page must be a top-k, not a global sort:\n$plan")
  }

  test("tenant-partitioned layout prunes partitions for tenant-scoped queries") {
    val wh = java.nio.file.Files.createTempDirectory("whp").toString
    Seq(("A", "t1", "x1"), ("B", "t2", "x2"), ("C", "t3", "x3"))
      .toDF("tenant", "transaction", "transfer")
      .write.partitionBy("tenant").parquet(s"$wh/transfer")
    val df = spark.read.parquet(s"$wh/transfer").filter(col("tenant") === "A")
    val plan = df.queryExecution.executedPlan.toString
    // the tenant predicate lands in PartitionFilters (file-listing prune),
    // not DataFilters (post-read filter)
    assert(plan.contains("PartitionFilters: [isnotnull(tenant"), plan)
    assert(plan.replaceAll("#\\d+", "").contains("(tenant = A)"), plan)
    assert(df.count() == 1)
  }

  test("fingerprint plan is shuffle-free except the output order") {
    val tmp = java.nio.file.Files.createTempDirectory("fpdocs").toString
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val plan = graft.operators.TextOps.fingerprint(spark, tmp)
      .queryExecution.executedPlan.toString
    // the winnowing kernel is row-local: no window operator, no explode,
    // no hash exchange — only the gate's ORDER BY may range-exchange
    assert(!plan.contains("Window"), s"fingerprint must not window:\n$plan")
    assert(!plan.contains("Generate"), s"fingerprint must not explode:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"fingerprint must not hash-shuffle:\n$plan")
    // r13: the range exchange must sit BELOW the md5 kernel (it moves raw
    // rows, then every core winnows) — with the exchange above the kernel
    // parallelism is capped by the scan's split count, the measured cause
    // of the r11 11.3x decade ratio. In the top-down plan string the
    // winnow_fps Project must therefore print ABOVE the exchange.
    val kernelAt = plan.indexOf("winnow_fps")
    val exchangeAt = plan.indexOf("rangepartitioning")
    assert(kernelAt >= 0 && exchangeAt >= 0,
      s"fingerprint must keep the kernel and one range exchange:\n$plan")
    assert(kernelAt < exchangeAt,
      s"the range exchange must be below the winnow kernel:\n$plan")
  }

  test("semanticDedup broadcasts centroids and pairs only within a cell") {
    val tmp = java.nio.file.Files.createTempDirectory("semplan").toString
    (0 until 40).map(i => (i.toLong,
      Array.tabulate(64)(d => if (d == i % 5) 1.0f else 0.0f), i % 5))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    // the Lazy variant: the public gate localCheckpoints (an RDD-scan
    // plan) and releases the cache — the join shape lives in the inner plan
    val (out, assigned) = graft.operators.Similarity.semanticDedupLazy(spark, tmp)
    val plan = out.queryExecution.executedPlan.toString
    assigned.unpersist(blocking = false)
    // corpus x centroids must broadcast the k-row centroid side; the
    // candidate stage must be an equi-join co-located on cell (the
    // sum-of-occupancy^2 bound), never a loop over corpus^2
    assert(!plan.contains("CartesianProduct"), s"no corpus cartesian:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroids must broadcast:\n$plan")
    // keyed on cell either way: at fixture size AQE broadcasts the small
    // cached side (BroadcastHashJoin [cell], [cell]); at corpus scale the
    // same equi-join shuffles both sides on cell. What must NEVER appear
    // is a non-equi loop over corpus^2.
    assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[cell".r
      .findFirstIn(plan).isDefined,
      s"pair join must be keyed on cell:\n$plan")
  }

  test("annIvf broadcasts the codebook, never a cartesian product") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfemb").toString
    (0 to 20).map(i => (i.toLong, Array(i.toFloat, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.parquet(s"$tmp/embeddings.parquet")
    val plan = graft.operators.Similarity.annIvf(spark, tmp)
      .queryExecution.executedPlan.toString
    // corpus x codebook must be the tiny side broadcast; a cartesian or
    // sort-merge over the full corpus square would not survive scale
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"codebook side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"IVF must never plan a cartesian product:\n$plan")
  }

  test("ngramJaccard joins only on shingle buckets — no cartesian, no all-pairs") {
    val tmp = java.nio.file.Files.createTempDirectory("njdocs").toString
    Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g x"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val plan = graft.operators.TextOps.ngramJaccard(spark, tmp)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay an equi-join on the shingle key:\n$plan")
    // both sides of the prefix self-join and both verify branches must read
    // CACHED frames — an uncached branch re-executes the dfreq + re-sort
    // shuffles (4 scans: pref ×2, raw shingle sets ×2)
    assert("InMemoryTableScan".r.findAllIn(plan).size >= 4,
      s"prefix index and shingle sets must come from cache on every branch:\n$plan")
  }

  test("as-of and range joins never degrade to nested-loop plans") {
    import spark.implicits._
    val left = Seq((1L, 10L, 5L)).toDF("user_id", "ts", "click_id")
    val right = Seq((1L, 5L, 7L, 0.5)).toDF("user_id", "ts", "view_id", "value")
    val asof = graft.operators.AsofJoin
      .asofBackward(left, right.select("user_id", "ts", "view_id"),
        Seq("user_id"), "ts", Seq("view_id"))
      .queryExecution.executedPlan.toString
    // the as-of sweep is a union + ONE window — it must never plan a join
    assert(!asof.contains("Join"), s"as-of must be join-free:\n$asof")
    assert(asof.contains("Window"), s"as-of needs its running window:\n$asof")

    val range = graft.operators.RangeJoin
      .trailingWindow(left, right, Seq("user_id"), "ts", "click_id",
        3600L * 1000 * 1000, Seq(count(col("view_id")).as("n")))
      .queryExecution.executedPlan.toString
    // the bucket trick exists to keep this an equi-join: a nested-loop or
    // cartesian fallback would be the |L|x|R| comparison it avoids
    assert(!range.contains("CartesianProduct") && !range.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join on (keys, bucket):\n$range")
  }

  test("saltedJoin spreads the key over salt shards without broadcasting the big side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = Seq(("hot", 1L), ("hot", 2L)).toDF("k", "v")
      val right = Seq(("hot", "d")).toDF("k", "d")
      val plan = graft.operators.Skew.saltedJoin(left, right, Seq("k"), shards = 8)
        .queryExecution.executedPlan.toString
      // the replication explode must survive into the physical plan…
      assert(plan.contains("Generate explode"),
        s"salt replication must explode the right side:\n$plan")
      // …and the shuffle key must include the salt, or hot keys still
      // serialize through one reducer
      val exch = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
      assert(exch.nonEmpty && exch.forall(_.contains("__salt")),
        s"join exchanges must partition on (keys, __salt):\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"under a disabled threshold nothing may force-broadcast:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("vocab top-k plans a sort-limit, not a global vocabulary sort") {
    val tmp = java.nio.file.Files.createTempDirectory("vocdocs").toString
    Seq((1L, "a b c a"), (2L, "b c d")).toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val plan = graft.operators.TextOps.vocabTopK(spark, tmp)
      .queryExecution.executedPlan.toString
    // limit+order must fuse into TakeOrderedAndProject (per-partition heap
    // + driver merge of k rows) — a full Sort of the vocabulary would
    // shuffle every distinct token just to keep 100
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a sort-limit:\n$plan")
  }

  test("balance query is a partial+final hash aggregate over one scan") {
    val transfers = Tables.load(spark, dir, "orders").select(
      lit("T").as("tenant"), lit(1).as("status"),
      lit("T").as("credit_tenant"), col("o_custkey").cast("string").as("credit_name"),
      lit("T").as("debit_tenant"), lit("b").as("debit_name"),
      col("o_totalprice").cast("decimal(18,4)").as("amount"),
      col("o_orderdate").as("value_date"))
    val plan = Warehouse.balances(Warehouse.balanceChanges(transfers))
      .queryExecution.executedPlan.toString
    // stack-unpivot must not double-scan via self-union
    assert(!plan.contains("Union"), s"balance unpivot must not self-union:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
    // exactly one parquet scan feeds the aggregate
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
  }
  test("manifest readers partition-prune on entity kind") {
    val root = java.nio.file.Files.createTempDirectory("j")
    def put(rel: String, content: String): Unit = {
      val f = root.resolve(rel)
      java.nio.file.Files.createDirectories(f.getParent)
      java.nio.file.Files.writeString(f, content): Unit
    }
    put("t_T/account/A/snapshot/0000000000", "CZK F_T\n")
    put("t_T/account/A/events/0000000000/1_1_X", "1\n")
    put("t_T/transaction/X", "committed\ny T A T B 2020-01-01T00:00:00Z 1 CZK\n")
    val m = java.nio.file.Files.createTempDirectory("manifest").toString
    graft.sources.Journal.compact(spark, root.toString, m)

    val plan = graft.sources.Journal.transfersFromManifest(spark, m)
      .queryExecution.executedPlan.toString
    // the kind filter must prune manifest partitions at the scan, not
    // filter rows after reading all three entity kinds
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("kind")),
      s"kind must appear in PartitionFilters:\n$plan")
    assert(!plan.contains("Filter (kind"),
      s"kind must not survive as a post-scan row filter:\n$plan")
  }
  test("point-lookup balance pushes the credit/debit disjunction into the scan") {
    val transfers = Seq(("T", "tx1", "t1", 1, "T", "a", "T", "b",
      BigDecimal(1), "CZK", java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .toDF("tenant", "transaction", "transfer", "status", "credit_tenant",
        "credit_name", "debit_tenant", "debit_name", "amount", "currency", "value_date")
    val plan = Warehouse.balanceOf(transfers, "T", "a")
      .queryExecution.optimizedPlan.toString
    // the account-key disjunction must sit BELOW the stack() unpivot —
    // Catalyst cannot infer it through the generator, so without the
    // explicit prefilter a single balance reads every transfer
    val genIdx = plan.indexOf("Generate stack")
    val orIdx = plan.indexOf("credit_name")
    assert(genIdx >= 0 && orIdx > genIdx,
      s"credit/debit prefilter must appear below the unpivot:\n$plan")
  }
  test("bucketed co-located join: no shuffle exchange in the join subtree") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // broadcast off: the exchange-free property must come from the
      // bucketed layout, not from one side being small enough to ship
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // string-walk the plan: collect() does not descend into the
      // AdaptiveSparkPlan wrapper, but the join is the LOWEST multi-child
      // operator here, so everything printed after it is its subtree
      val plan = graft.operators.Bucketed.bucketedJoin(spark, dir)
        .queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join:\n$plan")
      val subtree = plan.substring(joinIdx)
      assert(!subtree.contains("Exchange"),
        s"bucket-aligned join must not re-shuffle either side:\n$plan")
      // both scans report the bucket layout, all buckets selected
      assert("Bucketed: true".r.findAllIn(subtree).size == 2,
        s"both join inputs must be bucketed scans:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("tpch q3/q5 broadcast only the bounded dimensions (nation, region)") {
    // With the size threshold off, only explicit broadcast() hints survive:
    // exactly nation + region in q5 (bounded at 25/5 rows at EVERY scale
    // factor), and NONE in q3 — customer and supplier grow linearly with
    // SF, so forcing them into broadcasts is an executor OOM at 100 TB.
    // While they ARE small, the normal size-threshold/AQE path still
    // broadcasts them at runtime; that's a decision, not a pin.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p5 = graft.operators.TpchQueries.q5(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p5.contains("CartesianProduct"), s"q5 must not go cartesian:\n$p5")
      assert("BroadcastExchange".r.findAllIn(p5).size == 2,
        s"q5 must broadcast exactly nation + region, shuffle the rest:\n$p5")
      assert(p5.contains("SortMergeJoin") || p5.contains("ShuffledHashJoin"),
        s"q5's growing-table joins must be shuffle joins under threshold -1:\n$p5")
      val p3 = graft.operators.TpchQueries.q3(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p3.contains("BroadcastExchange"),
        s"q3 must not force-broadcast the customer slice:\n$p3")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("tpch q4 compiles EXISTS to a semi join; q18 top-100 avoids a global sort") {
    val p4 = graft.operators.TpchQueries.q4(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p4.contains("LeftSemi"),
      s"q4's EXISTS must be a semi join (no row multiplication):\n$p4")
    val p18 = graft.operators.TpchQueries.q18(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p18.contains("TakeOrderedAndProject"),
      s"q18's LIMIT 100 must be top-k, not a global sort:\n$p18")
    assert(p18.contains("LeftSemi"),
      s"q18's IN-subquery must be a semi join:\n$p18")
  }

  test("tpch q17's correlated scalar subqueries decorrelate to one aggregate+join") {
    // The correlated threshold subquery must be REWRITTEN (aggregate over
    // lineitem grouped by the correlation key, joined back) — a surviving
    // per-outer-row subquery would re-scan the 100 TB fact once per row.
    val qe = graft.operators.TpchQueries.q17(spark, dir).queryExecution
    val opt = qe.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("scalar-subquery"),
      s"q17's correlated subqueries must be decorrelated out of the plan:\n$opt")
    // the two threshold subqueries (count + sum over the same correlated
    // group) must collapse into ONE aggregate over lineitem by partkey —
    // two separate decorrelated joins would scan the fact twice
    val groupedByPartkey = "Aggregate \\[l_partkey".r.findAllIn(opt).size
    assert(groupedByPartkey == 1,
      s"expected exactly one decorrelated per-partkey aggregate, got $groupedByPartkey:\n$opt")
    assert(qe.executedPlan.toString.contains("Join"),
      "the decorrelated aggregate joins back to the outer side")
  }

  test("tpch q21's EXISTS/NOT EXISTS decorrelate to semi+anti equi-joins") {
    // Both subqueries correlate on l_orderkey equality with an l_suppkey
    // inequality residual. The rewrite must yield ONE left_semi and ONE
    // left_anti join keyed on orderkey (shuffle-partitionable at 100 TB);
    // a nested-loop or cartesian fallback would re-scan the fact per row.
    val p = graft.operators.TpchQueries.q21(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"q21's EXISTS must be a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"q21's NOT EXISTS must be an anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"q21 must never fall back to nested-loop/cartesian:\n$p")
  }

  test("tpch q2's correlated MIN-in-WHERE decorrelates to one aggregate+join") {
    // The min-cost subquery is itself a 4-table join correlated on the
    // outer part key; the rewrite must produce ONE aggregate over the
    // region-sliced lineitem grouped by l_partkey joined back — a
    // surviving per-outer-row subquery re-runs a 4-table join per row.
    val qe = graft.operators.TpchQueries.q2(spark, dir).queryExecution
    val opt = qe.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("scalar-subquery"),
      s"q2's correlated MIN must be decorrelated out of the plan:\n$opt")
    val groupedByPartkey = "Aggregate \\[l_partkey".r.findAllIn(opt).size
    assert(groupedByPartkey == 1,
      s"expected exactly one decorrelated per-partkey MIN aggregate, got $groupedByPartkey:\n$opt")
    val p = qe.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"q2 must never fall back to nested-loop/cartesian:\n$p")
  }

  test("tpch q20's doubly-nested IN + correlated scalar decorrelate to equi-joins") {
    // Three stacked rewrites: outer IN → semi join on suppkey, inner IN →
    // semi join on partkey, two-key correlated sum → aggregate grouped by
    // (partkey, suppkey) joined back on both keys. All equi-joins —
    // shuffle-partitionable at 100 TB; any nested-loop fallback fails.
    val qe = graft.operators.TpchQueries.q20(spark, dir).queryExecution
    val opt = qe.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("scalar-subquery"),
      s"q20's correlated threshold must be decorrelated:\n$opt")
    val p = qe.executedPlan.toString
    val semis = "LeftSemi".r.findAllIn(p).size
    assert(semis >= 2,
      s"q20 needs both IN subqueries as semi joins (got $semis):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"q20 must never fall back to nested-loop/cartesian:\n$p")
  }

  test("lateral top-k decorrelates the correlated LIMIT into a window") {
    // The inner query's ORDER BY ... LIMIT 2 references the outer row; a
    // surviving per-outer-row subquery is a per-row re-scan. Catalyst must
    // rewrite it to a partitioned window (the q_topk_per_group shape) —
    // no lateral/nested-loop join may survive to the physical plan.
    Tables.load(spark, dir, "nation").createOrReplaceTempView("lat_plan_nation")
    Tables.load(spark, dir, "supplier").createOrReplaceTempView("lat_plan_supplier")
    val qe = spark.sql(
      """SELECT n_name, s_name, s_acctbal
        |FROM lat_plan_nation JOIN LATERAL (
        |  SELECT s_name, s_acctbal FROM lat_plan_supplier
        |  WHERE s_nationkey = n_nationkey
        |  ORDER BY s_acctbal DESC, s_name LIMIT 2) t
        |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin).queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("Window") || p.contains("WindowGroupLimit"),
      s"the correlated LIMIT must become a partitioned window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"lateral must not survive as a nested-loop join:\n$p")
  }

  test("typed top-k aggregator partially aggregates below the shuffle") {
    // The Aggregator formulation's whole point vs the window top-k: a
    // k-bounded buffer combines MAP-SIDE, so the exchange carries
    // k·|groups| buffers, not every input row. Plan order is root-first:
    // final ObjectHashAggregate, then the Exchange, then the partial
    // ObjectHashAggregate below it.
    val p = graft.operators.TypedAgg.topKAgg(spark, dir)
      .queryExecution.executedPlan.toString
    val aggs = "ObjectHashAggregate".r.findAllMatchIn(p).map(_.start).toSeq
    assert(aggs.size == 2, s"expected partial+final object hash aggregate:\n$p")
    val ex = p.indexOf("Exchange hashpartitioning(o_orderpriority")
    assert(ex > aggs.head && ex < aggs.last,
      s"the exchange must sit between final and partial aggregation:\n$p")
  }

  test("nested schema pruning keeps the payload column out of the scan") {
    val plan = graft.operators.PartitionedScan.nestedPrune(spark, dir)
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema:")).getOrElse(fail(s"no scan:\n$plan"))
    // only the touched subfields survive: meta.lang + meta.quality.n_chars;
    // text (the corpus bulk) and the untouched meta.source must be pruned
    assert(!readSchema.contains("text"),
      s"the payload column must not be read:\n$readSchema")
    assert(!readSchema.contains("source"),
      s"untouched struct fields must be pruned:\n$readSchema")
    assert(readSchema.contains("lang") && readSchema.contains("n_chars"),
      s"touched subfields must be read:\n$readSchema")
  }

  test("AQE splits the skewed shuffle partition at runtime (skew=true)") {
    // The runtime remedy the manual saltedJoin (X14) complements: for a
    // plain shuffled sort-merge join, AQE detects the oversized partition
    // AFTER the map stage's sizes are known and splits it into subtasks —
    // no plan rewrite, no replication. Thresholds are lowered to trigger
    // at test scale; the assertion is that OUR join shape is eligible
    // (an ineligible shape — e.g. a pre-broadcast or non-equi join —
    // would hot-spot one reducer at 100 TB with no runtime recourse).
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // the q_skew_join fixture shape: ~75% of fact rows on hot key 0.
      // The upstream repartition matters to the TEST (not the operator):
      // AQE splits a skewed reduce partition at MAP-OUTPUT-BLOCK
      // granularity, and the single-file sf0.001 scan is one map task —
      // one indivisible block. Multiple mappers (as any real cluster scan
      // has) give the splitter units to work with.
      val li = Tables.load(spark, dir, "lineitem").repartition(8).select(
        when(col("l_orderkey") % 4 < 3, lit(0L))
          .otherwise(col("l_partkey") % 1000).as("k"),
        col("l_orderkey"), col("l_quantity"))
      // plain projection, no aggregate: OptimizeSkewedJoin only matches
      // SMJ(Sort(shuffle), Sort(shuffle)) — an aggregate between either
      // shuffle and the join makes the split ineligible
      val dim = Tables.load(spark, dir, "part")
        .select((col("p_partkey") % 1000).as("k"), col("p_name").as("dim_name"))
      // NOTE no aggregate on top either: a downstream operator that
      // REQUIRES the join's hash partitioning makes the skew split illegal
      // (splitting un-co-partitions the output), and AQE silently
      // declines — the same reason q_skew_join's salted rewrite exists
      val joined = li.join(dim, "k")
      joined.queryExecution.toRdd.count() // AQE decides from RUN-time sizes
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the hot-key join side as skew-split:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("partition pruning: static filter and dynamic dim join prune the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // static: the literal lang filter must land in PartitionFilters (whole
    // directories never listed), NOT in the row-level data filters
    val prunedRoot = graft.operators.PartitionedScan.partitionPruned(spark, dir)
      .queryExecution.executedPlan
    val pruned = prunedRoot match {
      case a: AdaptiveSparkPlanExec => a.executedPlan // unwrap AQE
      case p => p
    }
    val scans = pruned.collectLeaves().collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, s"expected a file scan:\n$pruned")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
      s"lang predicate must be a partition filter:\n$pruned")
    assert(!scan.dataFilters.exists(_.references.exists(_.name == "lang")),
      s"lang predicate must never reach row evaluation:\n$pruned")
    assert(scan.relation.location.inputFiles.length >
      scan.selectedPartitions.totalNumberOfFiles,
      "pruning must select a strict subset of the table's files")

    // dynamic: the broadcast dim side must be reused as a runtime
    // partition filter on the fact scan (dynamicpruning expression)
    val dpp = graft.operators.PartitionedScan.dppJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(dpp.toLowerCase.contains("dynamicpruning"),
      s"the dim join must inject a dynamic partition filter:\n$dpp")
  }

  test("chunking stays row-local: no hash shuffle below the output order") {
    val tmp = java.nio.file.Files.createTempDirectory("chunkdocs").toString
    Seq((1L, ("tok " * 200).trim)).toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val plan = graft.operators.TextOps.chunkDocs(spark, tmp)
      .queryExecution.executedPlan.toString
    // the bounded explode (Generate) is the op; the only exchange is the
    // gate's ORDER BY range partitioning
    assert(plan.contains("Generate"), plan)
    assert(!plan.contains("hashpartitioning"),
      s"chunking must not hash-shuffle:\n$plan")
  }

  test("q19's disjunctive branches push into BOTH scans; the join stays equi") {
    // the TPC-H Q19 shape: three OR'd conjunctions spanning the join. The
    // classic failure is the OR swallowing the equi key (nested loop) or
    // the scans reading everything and filtering after the join. Catalyst's
    // PushExtraPredicateThroughJoin must derive each side's disjunction:
    // lineitem reads only rows in SOME quantity range, part only rows
    // matching SOME brand+size branch, and the full predicate re-applies
    // as the equi join's residual.
    val plan = graft.operators.TpchQueries.q19(spark, dir)
      .queryExecution.executedPlan.toString
    assert("\\(l_quantity#\\d+ >= 1\\.0\\) AND \\(l_quantity#\\d+ <= 11\\.0\\)".r
      .findFirstIn(plan).isDefined &&
      "\\(l_quantity#\\d+ >= 20\\.0\\) AND \\(l_quantity#\\d+ <= 30\\.0\\)".r
        .findFirstIn(plan).isDefined,
      s"lineitem side must carry the quantity disjunction below the join:\n$plan")
    assert("\\(p_brand#\\d+ = Brand#12\\) AND \\(p_size#\\d+ <= 5\\)".r
      .findFirstIn(plan).isDefined,
      s"part side must carry the brand+size disjunction below the join:\n$plan")
    assert(plan.contains("HashJoin") && !plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the OR must stay a residual on an equi hash join:\n$plan")
  }

  test("new TPC-H composites broadcast only constant-size dimensions") {
    // the r9 lesson, pinned for the r10 queries: with the size threshold
    // off, any surviving BroadcastExchange is a HINT — and a hint on an
    // sf-proportional table (customer/supplier/part/orders/lineitem) is
    // an OOM at 100×. q7 hints exactly its two nation branches (25 rows,
    // bounded by the data model); q14/q19 hint nothing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q7 = graft.operators.TpchQueries.q7(spark, dir)
        .queryExecution.executedPlan.toString
      assert("BroadcastExchange".r.findAllIn(q7).size == 2,
        s"q7 must broadcast exactly its two hinted nation branches:\n$q7")
      for ((name, df) <- Seq(
          "q14" -> graft.operators.TpchQueries.q14(spark, dir),
          "q19" -> graft.operators.TpchQueries.q19(spark, dir))) {
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastExchange"),
          s"$name joins only sf-proportional tables; with the threshold " +
            s"off nothing may broadcast:\n$p")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q22 computes its scalar average once and anti-joins on custkey") {
    val plan = graft.operators.TpchQueries.q22(spark, dir)
      .queryExecution.executedPlan.toString
    // NOT EXISTS → left_anti, never a per-row re-scan
    assert(plan.contains("LeftAnti") && !plan.contains("CartesianProduct") &&
      !plan.contains("NestedLoop"),
      s"NOT EXISTS must compile to a left_anti equi join:\n$plan")
    // the uncorrelated average is ONE subquery instance (computed once,
    // fed to every row's comparison), not re-planned per reference
    val ids = "Subquery subquery#(\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toSet
    assert(ids.size == 1,
      s"the scalar average must be a single shared subquery, got $ids:\n$plan")
    // and its result even reaches the parquet scan as a pushed filter —
    // at 100 TB the row-group stats prune on the runtime threshold
    assert(plan.contains("GreaterThan(c_acctbal,ScalarSubquery"),
      s"the scalar threshold should push into the customer scan:\n$plan")
  }

  test("selective dim join injects a bloom filter below the fact's shuffle") {
    // the third runtime scan-reduction lever (after static prune + DPP):
    // InjectRuntimeFilter must aggregate the dim's keys into a bloom
    // (one-row subquery) and plant might_contain on the fact side BELOW
    // its exchange, so non-matching fact rows never shuffle
    val prev = graft.operators.RuntimeFilter.bloomConfs
      .map { case (k, _) => k -> spark.conf.getOption(k) }
    graft.operators.RuntimeFilter.bloomConfs
      .foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val qe = graft.operators.RuntimeFilter.bloomJoinPlan(spark, dir)
        .queryExecution
      val opt = qe.optimizedPlan.toString
      assert(opt.contains("bloom_filter_agg") && opt.contains("might_contain"),
        s"runtime bloom filter must inject:\n$opt")
      val phys = qe.executedPlan.toString
      val exchange = phys.indexOf("Exchange hashpartitioning(l_orderkey")
      val might = phys.indexOf("might_contain")
      assert(exchange >= 0 && might > exchange,
        s"might_contain must sit BELOW the fact's shuffle (prune before " +
          s"serialize), not above it:\n$phys")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("page-scoped balances put the semi join below the aggregate") {
    val transfers = Seq(("T", "tx1", "t1", 1, "T", "a", "T", "b",
      BigDecimal(1), "CZK", java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .toDF("tenant", "transaction", "transfer", "status", "credit_tenant",
        "credit_name", "debit_tenant", "debit_name", "amount", "currency", "value_date")
    val page = Seq(("T", "a"), ("T", "b")).toDF("tenant", "name")
    val plan = Warehouse.balancesFor(transfers, page)
      .queryExecution.optimizedPlan.toString
    val aggIdx = plan.indexOf("Aggregate")
    val semiIdx = plan.indexOf("Join LeftSemi")
    assert(aggIdx >= 0 && semiIdx > aggIdx,
      s"semi join must restrict the aggregate's input, not its output:\n$plan")
  }

  test("r11 TPC-H composites broadcast only constant-size dimensions") {
    // the same inverse pin as the r10 batch, for q8/q9/q10/q12: with the
    // size threshold off, every surviving BroadcastExchange is a HINT, and
    // hints are allowed on bounded tables only (nation=25, region=5 rows
    // by the data model). q8 hints its two nation roles + region; q9/q10
    // hint nation once; q12 joins only sf-proportional tables and may
    // broadcast nothing.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val expected = Seq(
        ("q8", () => graft.operators.TpchQueries.q8(spark, dir), 3),
        ("q9", () => graft.operators.TpchQueries.q9(spark, dir), 1),
        ("q10", () => graft.operators.TpchQueries.q10(spark, dir), 1),
        ("q12", () => graft.operators.TpchQueries.q12(spark, dir), 0))
      for ((name, mk, n) <- expected) {
        val p = mk().queryExecution.executedPlan.toString
        val got = "BroadcastExchange".r.findAllIn(p).size
        assert(got == n,
          s"$name must broadcast exactly its $n bounded-dim hints, got $got:\n$p")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q10 top-20 avoids a global sort; q16's NOT EXISTS is a left_anti") {
    val q10 = graft.operators.TpchQueries.q10(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q10.contains("TakeOrderedAndProject"),
      s"orderBy+limit(20) must fuse to per-partition top-k + merge:\n$q10")
    val q16 = graft.operators.TpchQueries.q16(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q16.contains("LeftAnti") && !q16.contains("CartesianProduct") &&
      !q16.contains("NestedLoop"),
      s"NOT EXISTS must compile to a shuffleable left_anti equi join:\n$q16")
    assert(!q16.contains("BroadcastNestedLoop"),
      s"the exclusion must never be a broadcast-only null-aware join:\n$q16")
  }

  test("q11/q15 evaluate their uncorrelated scalar subqueries once") {
    // the HAVING-threshold (q11) and MAX-revenue (q15) scalars must be a
    // single shared subquery instance each — once-per-group/row re-plans
    // are the decorrelation failure the docstrings promise away
    for ((name, df) <- Seq(
        "q11" -> graft.operators.TpchQueries.q11(spark, dir),
        "q15" -> graft.operators.TpchQueries.q15(spark, dir))) {
      val plan = df.queryExecution.executedPlan.toString
      val ids = "Subquery subquery#(\\d+)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet
      assert(ids.size == 1,
        s"$name's scalar must be one shared subquery, got $ids:\n$plan")
    }
  }

  test("q6 pushes all four range predicates into the lineitem scan") {
    // treeString truncates PushedFilters at ~100 chars; formatted explain
    // prints the full list in the scan's detail block
    val plan = graft.operators.TpchQueries.q6(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
        "LessThan(l_quantity"))
      assert(plan.contains(f),
        s"q6's $f must reach PushedFilters (row-group pruning at scale):\n$plan")
  }

  test("embed decontamination broadcasts only the eval side") {
    // the asymmetry IS the design: eval signatures + eval embeddings are
    // bounded (the benchmark set) and ride the exactly-two hinted
    // broadcasts; the corpus side must never broadcast or the operator
    // OOMs at lake scale. Threshold off ⇒ survivors are hints only.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the Lazy variant: the public gate localCheckpoints (whose plan is
      // just an RDD scan) — the broadcast shape lives in the inner plan
      val (out, all) = graft.operators.Similarity.embedDecontaminateLazy(spark, dir)
      val plan = out.queryExecution.executedPlan.toString
      all.unpersist(blocking = false)
      assert("BroadcastExchange".r.findAllIn(plan).size == 2,
        s"exactly the two eval-side hints may broadcast:\n$plan")
      // the shape is eval-size independent: at the documented benchmark
      // scale (10^4-row eval set) the same two hints and nothing else
      // broadcast — the Scaling `decontam` probe measures the candidates
      val big = graft.operators.Similarity
        .embedDecontaminateSliced(spark, dir, 10000L, Long.MaxValue, 0.30)
      val bigPlan = big.result.queryExecution.executedPlan.toString
      big.corpus.unpersist(blocking = false)
      assert("BroadcastExchange".r.findAllIn(bigPlan).size == 2,
        s"10^4-eval slice must keep the two-broadcast shape:\n$bigPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("PQ serving reads the stored codes — no corpus re-encoding") {
    // the train/serve split, executed: the serving plan must scan the
    // persisted codes parquet and contain NO per-(vec_id, m) assignment
    // window over the corpus (alias `arank`) — re-encoding at query time
    // is the retrain-per-query cost the split exists to remove. (k-means
    // itself is a driver-side loop of separate jobs; its absence from the
    // ONE serving plan is exactly this pin.)
    val (out, corpus) = graft.operators.Similarity.annPqServeLazy(spark, dir)
    val plan = out.queryExecution.executedPlan.toString
    corpus.unpersist(blocking = false)
    assert(plan.contains("pqidx"),
      s"serving must read the stored PQ index:\n$plan")
    assert(!plan.contains("arank"),
      s"serving must not re-encode the corpus (no assignment window):\n$plan")
  }

  test("IVF-PQ serving prunes to probed cells off the stored index") {
    // the combined index: serving must scan the ivfpqidx artifact, never
    // re-encode (no arank window), and the codes scan must be keyed on the
    // cell PARTITION column — the nprobe-as-partition-pruning layout
    val (out, corpus) = graft.operators.Similarity.annIvfPqServeLazy(spark, dir)
    val plan = out.queryExecution.executedPlan.toString
    corpus.unpersist(blocking = false)
    assert(plan.contains("ivfpqidx"),
      s"serving must read the stored IVF-PQ index:\n$plan")
    assert(!plan.contains("arank"),
      s"serving must not re-encode the corpus:\n$plan")
    // the probes join against the codes scan is keyed on cell (the
    // partition column) — the equi-join AQE/DPP prunes by
    assert("BroadcastHashJoin \\[cell".r.findFirstIn(plan).isDefined ||
      "dynamicpruning".r.findFirstIn(plan).isDefined,
      s"codes must join/prune on the cell partition column:\n$plan")
  }

  test("BM25 serving reads the stored postings — no re-tokenization, term filter pushed") {
    val plan = graft.operators.TextOps.bm25Serve(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bm25idx"),
      s"serving must read the stored postings:\n$plan")
    assert(!plan.contains("Generate"),
      s"serving must not explode/re-tokenize the corpus:\n$plan")
    assert(plan.contains("In(term"),
      s"the literal query-term filter must reach the postings scan:\n$plan")
  }

  test("BM25 delete serves from the patched index — corpus never read, filter pushed") {
    // the retention contract's plan half: after the delta-only delete,
    // the SERVING plan must be indistinguishable in shape from
    // bm25Serve's — it reads only the swapped index directory (the
    // corpus text was touched exactly zero times: even the takedown list
    // was a (doc_id, source) metadata lookup, and that happened in the
    // eagerly-executed write phase, not in this plan), never
    // re-tokenizes, and pushes the literal query-term filter into the
    // patched postings scan
    val plan = graft.operators.TextOps.queries("q_bm25_index_delete")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bm25idx_del"),
      s"serving must read the patched index:\n$plan")
    assert(!plan.contains("documents.parquet") && !plan.contains("Generate"),
      s"the corpus must not appear in the serving plan:\n$plan")
    assert(plan.contains("In(term"),
      s"the literal query-term filter must reach the patched postings scan:\n$plan")
  }

  test("incremental dedup signs only the batch and probes the stored index") {
    // the per-crawl dedup serve path: history's bands AND shingle sets
    // come off the mhidx artifact; the batch side carries the plan's ONE
    // minhash_sig subtree (a pure map over the 20% slice). A second
    // minhash_sig — or any shingle build outside the cached batch fill —
    // would mean history is re-signed per crawl, the cost the stored
    // index exists to remove.
    val plan = graft.operators.TextOps.dedupIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("mhidx") && plan.contains("/bands") &&
        plan.contains("/sets"),
      s"probe must read the stored band and set tables:\n$plan")
    val sigs = "minhash_sig".r.findAllIn(plan).length
    assert(sigs == 1,
      s"exactly one batch-side minhash_sig subtree, found $sigs:\n$plan")
    // the batch shingles are cached once and reused by sign + verify; the
    // only documents scans are that cache's inline-rendered fill
    val ims = "InMemoryTableScan".r.findAllIn(plan).length
    val docScans = "Scan parquet".r.findAllIn(plan).length
    assert(docScans - ims <= 2,
      s"history must come off the index, not corpus re-scans " +
        s"($docScans scans / $ims cached):\n$plan")
  }

  test("decontamination serve shingles only the batch and broadcasts the stored eval index") {
    // the per-batch decontamination path: the eval set's n-grams come off
    // the ctidx artifact (benchmark-sized, so it BROADCASTS — the huge
    // batch side never shuffles for the probe join); the batch carries
    // the plan's ONE word_shingles subtree. A second word_shingles — or a
    // shuffle on gram_key — would mean the benchmarks are re-shingled or
    // the corpus is shuffled per batch, the costs the stored index and
    // the broadcast exist to remove.
    val (batch, raw) =
      graft.operators.TextOps.contaminationServeFrames(spark, dir)
    val plan = raw.queryExecution.executedPlan.toString
    assert(plan.contains("ctidx") && plan.contains("/grams"),
      s"probe must read the stored eval-gram table:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastExchange"),
      s"the eval-gram index must broadcast to the batch probe:\n$plan")
    // the batch shingles are cached once and reused by probe + size leg;
    // cached fills render inline at each consumer, so subtract them: the
    // only parquet scan beyond the fills is the ctidx grams read — any
    // more would be a corpus or eval re-scan
    val ims = "InMemoryTableScan".r.findAllIn(plan).length
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans - ims <= 1,
      s"eval side must come off the index, not corpus re-scans " +
        s"($scans scans / $ims cached):\n$plan")
    batch.unpersist(blocking = false): Unit
  }

  test("incremental image dedup decodes only the batch and probes the stored dhash bands") {
    // the per-crawl image serve path: history's cluster bands come off
    // the dhidx artifact; the batch side carries the plan's ONE GIF
    // decode+hash MapPartitions subtree. A second MapPartitions - or a
    // second documents scan - would mean the lake is re-decoded per
    // crawl, the cost the stored index exists to remove.
    val plan = graft.multimodal.Multimodal.imageDedupIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dhidx") && plan.contains("/bands"),
      s"probe must read the stored cluster-band table:\n$plan")
    val decodes = "MapPartitions".r.findAllIn(plan).length
    assert(decodes == 1,
      s"exactly one batch-side decode subtree, found $decodes:\n$plan")
    val docScans = "documents".r.findAllIn(plan).length
    assert(docScans <= 1,
      s"only the batch may scan documents ($docScans scans):\n$plan")
  }

  test("incremental audio dedup fingerprints only the batch and probes the stored fp bands") {
    // the audio mirror of the image pin: history's cluster bands come off
    // the afidx artifact; the batch side carries the plan's ONE WAV
    // round-trip MapPartitions subtree and the only documents scan.
    val plan = graft.multimodal.Multimodal.audioDedupIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("afidx") && plan.contains("/bands"),
      s"probe must read the stored cluster-band table:\n$plan")
    val decodes = "MapPartitions".r.findAllIn(plan).length
    assert(decodes == 1,
      s"exactly one batch-side decode subtree, found $decodes:\n$plan")
    val docScans = "documents".r.findAllIn(plan).length
    assert(docScans <= 1,
      s"only the batch may scan documents ($docScans scans):\n$plan")
  }

  test("incremental video dedup decodes only the batch and probes the stored composite keys") {
    // the temporal mirror of the image/audio pins: history's composite
    // candidate keys come off the vdidx artifact; the batch side carries
    // the plan's ONE multi-frame decode subtree and the only documents
    // scan.
    val plan = graft.multimodal.Multimodal.videoDedupIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("vdidx") && plan.contains("/keys"),
      s"probe must read the stored composite-key table:\n$plan")
    val decodes = "MapPartitions".r.findAllIn(plan).length
    assert(decodes == 1,
      s"exactly one batch-side decode subtree, found $decodes:\n$plan")
    val docScans = "documents".r.findAllIn(plan).length
    assert(docScans <= 1,
      s"only the batch may scan documents ($docScans scans):\n$plan")
  }

  test("curation serve pipeline reads every model off storage - batch-only signing, no training") {
    // the composed daily-batch path: the dedup leg reads the mhidx
    // band/set tables, the perplexity leg reads the lmidx count tables,
    // the quality weights and BPE vocab are broadcast literals - so the
    // only minhash_sig subtree is the batch's own signature map, the
    // trained-kernel call is the wordpiece fold, and no LM training
    // aggregation (corpus bigram groupBy) appears anywhere in the plan.
    val (out, flags, batch) =
      graft.operators.TextOps.curationPipelineServeLazy(spark, dir)
    val plan = out.queryExecution.executedPlan.toString
    // the flags frame is the single-rendered inner plan (the outer plan
    // inlines its cache fill once per consumer, double-counting subtrees)
    val flagsPlan = flags.queryExecution.executedPlan.toString
    flags.unpersist(blocking = false)
    batch.unpersist(blocking = false)
    assert(flagsPlan.contains("mhidx") && flagsPlan.contains("lmidx"),
      s"serve must read the stored dedup and LM indexes:\n$flagsPlan")
    val sigs = "minhash_sig".r.findAllIn(flagsPlan).length
    assert(sigs == 1,
      s"exactly one batch-side minhash_sig subtree, found $sigs:\n$flagsPlan")
    assert(plan.contains("wordpiece_toks"),
      s"survivor accounting must apply the trained vocab kernel:\n$plan")
    // every documents read is the batch cache's inline-rendered fill -
    // a corpus-side scan would mean history is re-processed per batch
    val docScans = "documents\\.parquet".r.findAllIn(flagsPlan).length
    val ims = "InMemoryTableScan".r.findAllIn(flagsPlan).length
    assert(ims >= 2 && docScans <= ims,
      s"documents must come off the batch cache " +
        s"($docScans doc scans / $ims cached):\n$plan")
  }

  test("semantic dedup serve assigns only the batch against the stored cell index") {
    // the SemDeDup serve split: centroids and history members come off
    // the semidx artifact; the only embeddings scan is the batch side's
    // own assignment (broadcast codebook + rank window). A second
    // embeddings scan or a k-means update aggregate would mean the lake
    // is re-trained or re-assigned per crawl.
    val plan = graft.operators.Similarity.semanticDedupServe(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("semidx") && plan.contains("/cents") &&
        plan.contains("/members"),
      s"serve must read the stored codebook and member tables:\n$plan")
    // the members read must be CELL-PRUNED by the batch's own cells (the
    // 100 TB read story: a batch touching k cells reads k partitions of
    // the lake, not the lake) - DPP renders the batch assignment a second
    // time as its pruning subquery, so allow that one extra scan
    assert(plan.contains("dynamicpruning"),
      s"members must be partition-pruned by the batch's cells:\n$plan")
    val embScans = "embeddings\\.parquet".r.findAllIn(plan).length
    assert(embScans <= 2,
      s"only the batch (+ its DPP subquery) may scan embeddings, " +
        s"found $embScans scans:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
        plan.contains("BroadcastNestedLoopJoin"),
      s"the stored codebook must broadcast to the batch side:\n$plan")
  }

  test("incremental embedding near-dup probes the stored SRP index — batch signed, history read") {
    // the vector twin of the minhash pin: history signatures AND vectors
    // come off the srpidx artifact; only the batch side computes
    // signatures (its `dots` projection over the literal plane family).
    // History re-signing would show as a second plane-projection subtree
    // feeding the join's right side instead of a parquet read.
    val plan = graft.operators.Similarity
      .embedNearDupIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("srpidx") && plan.contains("/sig") &&
        plan.contains("/vecs"),
      s"probe must read the stored signature and vector tables:\n$plan")
    // the batch embeddings are cached once (sign + verify share the
    // fill); the only embeddings.parquet scans are that inline fill
    val ims = "InMemoryTableScan".r.findAllIn(plan).length
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(ims >= 1 && scans - ims <= 2,
      s"history must come off the index ($scans scans / $ims cached):\n$plan")
  }

  test("indexed hybrid search serves BOTH legs from stored indexes") {
    // the serving-path capstone: the ONE fused plan must read the stored
    // BM25 postings AND the stored IVF-PQ codes; no corpus re-tokenization
    // (the only Generates allowed are the bounded subvector expansion of
    // the 3 query vectors for the ADC distance tables), no corpus
    // re-encoding (arank), and the dense leg must join the codes on the
    // cell partition column — the brute-force per-query corpus cosine
    // scan of q_hybrid_search must be GONE
    val (out, corpus) = graft.operators.TextOps
      .hybridSearchIndexedLazy(spark, dir)
    val plan = out.queryExecution.executedPlan.toString
    corpus.unpersist(blocking = false)
    assert(plan.contains("bm25idx"),
      s"the sparse leg must read the stored postings:\n$plan")
    assert(plan.contains("ivfpqidx"),
      s"the dense leg must read the stored IVF-PQ index:\n$plan")
    assert(!plan.contains("arank"),
      s"the dense leg must not re-encode the corpus:\n$plan")
    assert(plan.contains("In(term"),
      s"the literal query-term filter must reach the postings scan:\n$plan")
    assert("BroadcastHashJoin \\[cell".r.findFirstIn(plan).isDefined ||
      "dynamicpruning".r.findFirstIn(plan).isDefined,
      s"codes must join/prune on the cell partition column:\n$plan")
    // no corpus-wide dense scoring: q_hybrid_search's brute-force leg is a
    // per-query row_number window over cosine of the FULL corpus; here
    // cosine may only appear in the bounded shortlist re-rank (candidates
    // ≤ PqCand per query), which sits above the cell-pruned codes read —
    // pinned by the rerank window ordering on cosine appearing AFTER the
    // cell join in the plan tree rendering (children print below parents)
    val cosineWinAt = "cosine#\\d+L? DESC".r.findFirstMatchIn(plan)
      .map(_.start).getOrElse(-1)
    val cellJoinAt = plan.indexOf("cell")
    assert(cosineWinAt >= 0 && cellJoinAt > cosineWinAt,
      s"the cosine re-rank must sit ABOVE the cell-pruned read " +
        s"(bounded shortlist), not over the raw corpus:\n$plan")
  }

  test("stream-static cached: micro-batch broadcasts the materialized dim") {
    // the q_stream_static_join_cached shape (SCALING.md mitigation): the
    // static aggregate is cached+materialized before the stream starts, so
    // the MICRO-BATCH plan must (a) broadcast-join, (b) read the dim from
    // memory, and (c) contain NO aggregate at all — a HashAggregate here
    // would mean the lake-wide groupBy re-runs every batch, the exact
    // super-linearity SCALING.md measured (4.47x wall at 10x data)
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
    val dim = operators.EventWindows.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_total")).cache()
    try {
      dim.count()
      val schema = Tables.load(spark, dir, "events").schema
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val q = graft.streaming.EventStream.enrichWithDim(stream, dim, "user_id")
        .writeStream.format("memory").queryName("pin_static_cached")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val plan = q.asInstanceOf[StreamingQueryWrapper].streamingQuery
        .lastExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"static side must broadcast inside the micro-batch:\n$plan")
      assert(plan.contains("InMemoryTableScan"),
        s"static side must read the materialized cache, not the lake:\n$plan")
      // InMemoryRelation's stringification includes the ORIGINAL build plan
      // (with its HashAggregate) as cached lineage; executed-per-batch
      // operators all print ABOVE it. An aggregate before that marker would
      // be real per-batch work.
      val aggIdx = plan.indexOf("HashAggregate")
      val cacheIdx = plan.indexOf("InMemoryRelation")
      assert(aggIdx < 0 || aggIdx > cacheIdx,
        s"no per-batch re-aggregation of the static side:\n$plan")
    } finally { dim.unpersist(blocking = false); () }
  }

  test("balance MV rule swaps the lake aggregate for the pre-agg scan") {
    // the one custom Rule[LogicalPlan] in the engine (SURVEY §7's named
    // candidate): under the rule the SAME declarative balance query must
    // plan as a scan of the maintained pre-agg — no stack unpivot, no
    // aggregate over the transfer lake; without it, the normal aggregate.
    // Values must be indistinguishable (the oracle gate checks vs DuckDB;
    // here the two plans are compared row-for-row directly).
    val (planWith, rowsWith) =
      graft.operators.WarehouseQueries.withBalanceMv(spark, dir) { df =>
        (df.queryExecution.executedPlan.toString, df.collect().toSeq)
      }
    assert(planWith.contains("balmv"),
      s"under the rule the plan must read the materialized balances:\n$planWith")
    assert(!planWith.contains("HashAggregate"),
      s"the lake-wide aggregate must be gone:\n$planWith")
    assert(!planWith.contains("stack"),
      s"the unpivot must be gone:\n$planWith")
    val without = graft.warehouse.Warehouse.balances(
      graft.warehouse.Warehouse.balanceChanges(
        graft.operators.WarehouseQueries.transferShapeFor(spark, dir)))
      .withColumn("balance", col("balance").cast("double"))
      .orderBy("tenant", "name")
    assert(without.queryExecution.executedPlan.toString.contains("HashAggregate"),
      "without the rule the normal aggregate must plan")
    assert(rowsWith == without.collect().toSeq,
      "rewritten and direct plans must produce identical rows")
  }

  test("incremental MV maintenance aggregates only the delta slice") {
    // the stored base is |accounts| pre-aggregated rows; the lake is
    // scanned ONLY for transfers past the cut (bound pushed to the scan),
    // and the single aggregate pair in the plan is the delta's — at 100 TB
    // the maintenance cost is the delta, which is the point
    val plan = graft.operators.WarehouseQueries
      .balanceMvIncrement(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("balmvincr"),
      s"maintenance must read the stored base:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).length == 2,
      s"only the delta may aggregate (one partial+final pair):\n$plan")
    // the PUSHED predicate, not mere column presence (o_orderdate appears
    // in ReadSchema/Filter regardless): a blocked pushdown reads the lake
    // and filters above it — the exact 100 TB regression this pins
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") ||
      plan.contains("Or(GreaterThanOrEqual(o_orderdate"),
      s"the cut bound must be PUSHED into the lake scan:\n$plan")
  }

  test("balance MV rule is sound: sliced/joined/distinct variants stay unrewritten") {
    // the rewrite may fire ONLY on the full-lake plain-sum aggregate —
    // a wrong rewrite silently widens a scoped query to all-time
    // all-account totals, which is why each of these must keep its
    // HashAggregate and never touch the MV
    import graft.warehouse.Warehouse
    val shape = graft.operators.WarehouseQueries.transferShapeFor(spark, dir)
    graft.operators.WarehouseQueries.withBalanceMvScope(spark, dir) {
      // balanceOf: per-account Filter between Aggregate and the unpivot
      val one = Warehouse.balanceOf(shape, "T", "a1")
        .queryExecution.executedPlan.toString
      assert(one.contains("HashAggregate") && !one.contains("balmv"),
        s"a per-account slice must NOT read the full-lake MV:\n$one")
      // balancesFor: page-key semi join below the aggregate
      val page = Warehouse.balancesFor(shape,
        Seq(("T", "a1"), ("T", "a2")).toDF("tenant", "name"))
        .queryExecution.executedPlan.toString
      assert(page.contains("HashAggregate") && !page.contains("balmv"),
        s"a page-scoped aggregate must NOT read the full-lake MV:\n$page")
      // DISTINCT lives on the AggregateExpression wrapper — different sum
      val dist = Warehouse.balanceChanges(shape)
        .groupBy(col("tenant"), col("name"))
        .agg(sum_distinct(col("amount")).as("balance"))
        .queryExecution.executedPlan.toString
      assert(dist.contains("HashAggregate") && !dist.contains("balmv"),
        s"SUM(DISTINCT) must NOT be answered by the plain-sum MV:\n$dist")
      // a date-sliced lake below the unpivot fails the sameResult
      // fingerprint even though nothing sits between Aggregate and Generate
      val sliced = Warehouse.balances(Warehouse.balanceChanges(
        shape.filter(col("value_date") < lit("1995-01-01").cast("timestamp"))))
        .queryExecution.executedPlan.toString
      assert(sliced.contains("HashAggregate") && !sliced.contains("balmv"),
        s"a date-sliced aggregate must NOT read the all-time MV:\n$sliced")
      // a COMPUTING Project between Aggregate and Generate (-amount AS
      // amount) satisfies the name-only Sum check and the below-Generate
      // fingerprint, but aggregates a different expression — the
      // pass-through-Project guard must block it
      val negated = Warehouse.balanceChanges(shape)
        .withColumn("amount", -col("amount"))
        .groupBy(col("tenant"), col("name"))
        .agg(sum(col("amount")).as("balance"))
        .queryExecution.executedPlan.toString
      assert(negated.contains("HashAggregate") && !negated.contains("balmv"),
        s"a computing Project must NOT be answered by the MV:\n$negated")
      // a key-swapping rename keeps both names present but transposes the
      // grouping — equally blocked by the pass-through guard
      val swapped = Warehouse.balanceChanges(shape)
        .select(col("name").as("tenant"), col("tenant").as("name"),
          col("amount"))
        .groupBy(col("tenant"), col("name"))
        .agg(sum(col("amount")).as("balance"))
        .queryExecution.executedPlan.toString
      assert(swapped.contains("HashAggregate") && !swapped.contains("balmv"),
        s"a key-swapping rename must NOT be answered by the MV:\n$swapped")
      // POSITIVE: a GROUP-KEY filter commutes with the aggregate — the
      // tenant-scoped balance report (the /balances serving shape, whose
      // key filter Catalyst pushes below the Aggregate onto the Generate
      // output) must still rewrite, with the filter re-applied on (and
      // pushed into) the MV scan
      val keyed = Warehouse.balances(Warehouse.balanceChanges(shape))
        .filter(col("tenant") === "T")
      val keyedPlan = keyed.queryExecution.executedPlan.toString
      assert(keyedPlan.contains("balmv") && !keyedPlan.contains("HashAggregate"),
        s"a key-filtered report must be answered by the MV:\n$keyedPlan")
      assert(keyedPlan.contains("EqualTo(tenant,T)"),
        s"the key filter must reach the MV scan:\n$keyedPlan")
      // value parity of the keyed rewrite vs the unrewritten aggregate is
      // covered end-to-end by HttpEdgeSpec's /balances fixture assertions
    }
  }

  test("q1 partial-aggregates below its exchange; shipdate reaches the scan") {
    // the canonical scan-heavy aggregate: the map side must collapse each
    // partition to |groups| rows BEFORE the exchange (4 groups vs 6B rows
    // at 100 TB), and the date predicate must prune at the parquet scan
    val plan = graft.operators.TpchQueries.q1(spark, dir)
      .queryExecution.executedPlan.toString
    val partialAt = plan.indexOf("partial_sum")
    val exchangeAt = plan.indexOf("Exchange hashpartitioning")
    assert(partialAt >= 0 && exchangeAt >= 0 && partialAt > exchangeAt,
      s"partial aggregation must sit below the group exchange:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"the shipdate bound must reach the lineitem scan:\n$plan")
  }

  test("q7 broadcasts only the two nation slices; the fact joins shuffle") {
    // four growing tables (lineitem/orders/customer/supplier) + two 2-row
    // nation renames: with the size threshold off, exactly the two hinted
    // nation broadcasts may survive — anything more is a force-broadcast
    // of a growing table, an executor OOM at 100 TB
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = graft.operators.TpchQueries.q7(spark, dir)
        .queryExecution.executedPlan.toString
      assert("BroadcastExchange".r.findAllIn(plan).size == 2,
        s"exactly the two nation slices may broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"the growing-table joins must be shuffle joins:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"the cross-pair filter must not degrade the join to cartesian:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q13 keeps the outer join outer and pushes the priority filter") {
    // customers with zero orders must survive (left_outer), and the
    // o_orderpriority predicate must filter ORDERS before the join —
    // applied after it, it would silently turn the join inner
    val plan = graft.operators.TpchQueries.q13(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftOuter"),
      s"q13 must preserve order-less customers:\n$plan")
    val pushedAt = plan.indexOf("PushedFilters")
    assert(pushedAt >= 0, s"no PushedFilters in the q13 plan:\n$plan")
    assert(plan.indexOf("o_orderpriority", pushedAt) >= 0,
      s"the priority filter must reach the orders scan:\n$plan")
  }

  test("q14 computes both conditional sums in one aggregation pass") {
    // promo and total revenue are CASE branches of ONE aggregate over one
    // join — a second scan/join per sum doubles the lake read; the single
    // final+partial HashAggregate pair and exactly two scans pin that
    val plan = graft.operators.TpchQueries.q14(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 2,
      s"one lineitem + one part scan expected, found $scans:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).length == 2,
      s"both sums must share one partial+final aggregate pair:\n$plan")
  }

  test("dupSpans marks duplicates with one analytic window, never a self-join") {
    // the naive shape is windows ⋈ (windows groupBy hash having n>1) — a
    // second corpus explode + a join; the count-over-hash window does the
    // marking in ONE shuffle on a single scan
    val plan = graft.operators.TextOps.dupSpans(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"duplicate marking must be an analytic window, not a self-join:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1,
      s"the corpus must be scanned exactly once, found $scans scans:\n$plan")
    // the md5-window kernel (the Generate) must run ABOVE an exchange of
    // the raw doc rows — otherwise its parallelism is the scan's split
    // count (the fingerprint/M4 lesson, measured 6.3x at the decade step)
    val kernelAt = plan.indexOf("Generate")
    val rawExchangeAt = plan.lastIndexOf("Exchange hashpartitioning(doc_id")
    assert(kernelAt >= 0 && rawExchangeAt > kernelAt,
      s"the raw-row exchange must sit below the window-hash kernel:\n$plan")
  }

  test("qualityClassifier is a pure map: no shuffle but the output sort") {
    // model serving over 100 TB must not shuffle: literal weights, hashed
    // buckets, per-row fold — the only exchange is the gate's doc order,
    // and it must sit BELOW the md5-per-token kernel (the fingerprint/M4
    // idiom: move the cheap raw rows, then score on every core)
    val plan = graft.operators.TextOps.qualityClassifier(spark, dir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1 && plan.contains("rangepartitioning"),
      s"expected exactly the output-order range exchange, got $exchanges:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"scoring must fold per-row, not aggregate:\n$plan")
    val kernelAt = plan.indexOf("aggregate(")
    val exchangeAt = plan.indexOf("rangepartitioning")
    assert(kernelAt >= 0 && kernelAt < exchangeAt,
      s"the range exchange must sit below the scoring fold:\n$plan")
  }

  test("subwordTokenize is a pure map on the codegen'd kernel") {
    // vocab application at 100 TB must not shuffle: the segmentation is
    // row-local via the native expression, and the only exchange is the
    // gate's doc order, sitting BELOW the kernel (M4 idiom)
    val plan = graft.operators.TextOps.subwordTokenize(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("wordpiece_toks"),
      s"segmentation must run through the native kernel:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1 && plan.contains("rangepartitioning"),
      s"expected exactly the output-order range exchange, got $exchanges:\n$plan")
    val kernelAt = plan.indexOf("wordpiece_toks")
    val exchangeAt = plan.indexOf("rangepartitioning")
    assert(kernelAt >= 0 && kernelAt < exchangeAt,
      s"the range exchange must sit below the segmentation kernel:\n$plan")
  }

  test("hybridSearch fuses stored-index legs without re-tokenizing") {
    // both legs must come from their serving shapes: the sparse leg off
    // the stored postings (no Generate anywhere — tokenization happened
    // at index build), the dense leg off codegen'd vec_dot (no explode of
    // the embedding arrays either)
    val plan = graft.operators.TextOps.hybridSearch(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bm25idx"),
      s"the sparse leg must read the stored postings:\n$plan")
    assert(!plan.contains("Generate"),
      s"no leg may explode/re-tokenize at serve time:\n$plan")
    assert(plan.contains("vec_dot"),
      s"the dense leg must use the codegen'd dot-product kernel:\n$plan")
  }

  test("pagerank layouts: broadcast round broadcasts ranks, stationary round shuffles only ranks") {
    // the two gated fixpoint layouts (X86 + the r16 flip): the broadcast
    // form builds the rank frame into a BroadcastExchange each round;
    // the 100 TB form must NOT — its one edge shuffle happened at cache
    // fill, so the round plan may contain exactly the src partitioning
    // rendered inline by the cached edge fill plan and NO broadcast of
    // ranks (a broadcast that survives the flip means the layout dies
    // when |nodes| outgrows driver memory)
    // the prep-time broadcasts (degree table, lineitem⋈orders) render
    // inline via the cached edges' fill plan in BOTH layouts, so the pin
    // targets the RANK join itself: src ⋈ node
    val rankBhj = "BroadcastHashJoin \\[src#\\d+L\\], \\[node#".r
    val rankShj = "ShuffledHashJoin \\[src#\\d+L\\], \\[node#".r
    val bPlan = graft.operators.Graph.roundPlanFor(spark, dir, true)
    assert(rankBhj.findFirstIn(bPlan).isDefined,
      s"broadcast layout must broadcast the rank frame into the edges:\n$bPlan")
    val sPlan = graft.operators.Graph.roundPlanFor(spark, dir, false)
    assert(rankBhj.findFirstIn(sPlan).isEmpty,
      s"stationary layout must never broadcast ranks:\n$sPlan")
    val shjMatch = "ShuffledHashJoin \\[src#(\\d+)L\\], \\[node#".r
      .findFirstMatchIn(sPlan)
    assert(shjMatch.isDefined,
      s"stationary layout joins ranks into the partitioned edges:\n$sPlan")
    // the cached edges' ONE src shuffle is the REPARTITION_BY_COL at
    // cache fill; an ENSURE_REQUIREMENTS exchange on the JOIN's OWN src
    // attribute would mean the edge set re-shuffles every round (inline
    // fill plans legitimately contain prep-time src exchanges under
    // other exprIds — the degree aggregation — so the pin is id-scoped)
    val srcId = shjMatch.get.group(1)
    val srcReshuffles =
      s"Exchange hashpartitioning\\(src#${srcId}L, \\d+\\), ENSURE_REQUIREMENTS"
        .r.findAllIn(sPlan).length
    assert(srcReshuffles == 0,
      s"edges must keep their cache-fill partitioning ($srcReshuffles src re-shuffles):\n$sPlan")
  }

  test("bm25 takedown prunes postings partitions; serve plans no dlen-table scan") {
    import graft.operators.TextOps
    // r19 (the r18 verdict's #2): the delete/update df-shift derivation
    // reads the doomed docs' OWN rows through the doc_bucket partition
    // filter — a pruned file listing, not a full postings scan
    val root = TextOps.bm25BuildIndex(spark, dir)
    val purge = graft.Tables.load(spark, dir, "documents")
      .filter(col("source") === TextOps.PurgeSource).select(col("doc_id"))
    val plan = TextOps.prunedDoomedPostings(spark, root, purge)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("doc_bucket")),
      s"doc_bucket must appear in PartitionFilters:\n$plan")
    // r20 (the r19 ADVICE): the partition filter must be TYPE-EXACT —
    // bucket literals cast to the read schema's inferred type, so the
    // pruning never rides on cast-pushdown behavior
    assert(!pf.exists(_.contains("cast(doc_bucket")),
      s"partition filter must not cast the partition attribute:\n$pf")
    assert(!plan.contains("Filter (doc_bucket"),
      s"doc_bucket must not survive as a post-scan row filter:\n$plan")
    // r19 (the r18 verdict's #5): postings carry dlen, so a serve plan
    // scans exactly tf + df + stats — the corpus-sized per-doc dlen
    // table is never read at query time
    val servePlan = TextOps.bm25Serve(spark, dir)
      .queryExecution.executedPlan.toString
    val nScans = "Scan parquet".r.findAllIn(servePlan).length
    assert(nScans == 3,
      s"serve must scan tf/df/stats only, found $nScans scans:\n$servePlan")
  }
}
