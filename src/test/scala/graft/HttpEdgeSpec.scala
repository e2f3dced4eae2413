package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import graft.api.HttpEdge
import graft.warehouse.Warehouse

/** End-to-end edge tests reproducing the reference's black-box scenarios
  * (bbtest/features/graphql_api.feature) over real HTTP: journal fixture →
  * sync → HTTP query → JSON assertions.
  */
class HttpEdgeSpec extends SparkSpec {

  private def get(port: Int, pathAndQuery: String): (Int, String) = {
    val url = java.net.URI.create(s"http://localhost:$port$pathAndQuery").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val body = new String(is.readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, body)
  }

  private def fixture(): String = {
    val root = Files.createTempDirectory("journal")
    def put(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    put("t_TENANT/account/CREDIT/snapshot/0000000000", "CZK FORMAT_T\n")
    put("t_TENANT/account/DEBIT/snapshot/0000000000", "CZK FORMAT_T\n")
    put("t_TENANT/account/IDLE/snapshot/0000000000", "EUR FORMAT_T\n")
    put("t_TENANT/account/CREDIT/events/0000000000/1_1_TRN", "1\n")
    put("t_TENANT/account/DEBIT/events/0000000000/1_-1_TRN", "1\n")
    put("t_TENANT/transaction/TRN",
      "committed\nTRX TENANT CREDIT TENANT DEBIT 2020-01-01T00:00:00Z 1 CZK\n")
    root.toString
  }

  private def withEdge[A](f: Int => A): A = {
    val wh = Files.createTempDirectory("wh").toString
    Warehouse.sync(spark, fixture(), wh)
    val edge = new HttpEdge(spark, wh, port = 0).start()
    try f(edge.boundPort) finally edge.stop()
  }

  test("bbtest scenarios over HTTP: tenants, account balances, transfers") {
    withEdge { port =>
      // health probe = tenants(limit 1) through the full stack
      val (hc, health) = get(port, "/health")
      assert(hc == 200 && health.contains("\"healthy\":true"))

      // scenario 1: tenant discovery
      val (_, tenants) = get(port, "/tenants")
      assert(tenants.contains("\"name\":\"TENANT\""))
      val (_, one) = get(port, "/tenant?name=TENANT")
      assert(one == "[{\"name\":\"TENANT\"}]")

      // scenario 2: snapshot-parsed metadata; no transfers -> balance 0
      val (_, idle) = get(port, "/account?tenant=TENANT&name=IDLE")
      assert(idle.contains("\"currency\":\"EUR\"") && idle.contains("\"balance\":0.0"))

      // scenario 3: committed transfer -> +1/-1 balances, status word
      val (_, credit) = get(port, "/account?tenant=TENANT&name=CREDIT")
      assert(credit.contains("\"balance\":1.0"))
      val (_, transfers) = get(port, "/transfers?tenant=TENANT&status=committed&resolve=true")
      assert(transfers.contains("\"transaction\":\"TRN\""))
      assert(transfers.contains("\"status_word\":\"committed\""))
      assert(transfers.contains("\"credit_balance\":1.0"))
      assert(transfers.contains("\"debit_balance\":-1.0"))

      // accounts listing with filter + pagination surface
      val (_, accounts) = get(port, "/accounts?tenant=TENANT&currency=CZK&limit=10")
      assert(accounts.contains("CREDIT") && accounts.contains("DEBIT")
        && !accounts.contains("IDLE"))

      // keyset continuation: the page after TRN/TRX is empty (last row)
      val (_, keyset) = get(port, "/transfers?tenant=TENANT&after=TRN%2CTRX")
      assert(keyset == "[]")

      // accounts/tenants keyset: strictly-after page, filters compose
      val (_, accAfter) = get(port, "/accounts?tenant=TENANT&after=CREDIT&limit=10")
      assert(!accAfter.contains("CREDIT")
        && accAfter.contains("DEBIT") && accAfter.contains("IDLE"))
      val (_, tenAfter) = get(port, "/tenants?after=TENANT")
      assert(tenAfter == "[]")

      // a nonzero offset under a cursor is a 400 on EVERY edge (matching
      // GraphQL), never a silently ignored parameter
      for (path <- Seq("/accounts?tenant=TENANT&after=CREDIT&offset=5",
        "/tenants?after=A&offset=5",
        "/transfers?tenant=TENANT&after=TRN%2CTRX&offset=5")) {
        val (c, e) = get(port, path)
        assert(c == 400 && e.contains("offset must be 0"), s"$path -> $c $e")
      }

      // argument validation -> 400, not a stack trace
      val (code, err) = get(port, "/transfers?status=committed")
      assert(code == 400 && err.contains("missing arg: tenant"))
      val (c2, e2) = get(port, "/transfers?tenant=TENANT&after=TRN")
      assert(c2 == 400 && e2.contains("after must be"))
      val (c3, e3) = get(port, "/transfers?tenant=TENANT&value_date_gt=not-a-date")
      assert(c3 == 400 && e3.contains("bad value_date_gt"))
    }
  }
  test("balance MV serves the /balances report; scoped lookups stay unrewritten") {
    val wh = Files.createTempDirectory("wh").toString
    Warehouse.sync(spark, fixture(), wh)
    // the sync pass maintains the pre-agg the serving rule reads
    assert(new java.io.File(s"$wh/balances").exists,
      "sync must maintain the balance pre-agg artifact")
    val edge = new HttpEdge(spark, wh, port = 0).start()
    try {
      val port = edge.boundPort
      // REST report: the full per-tenant balance dump, MV-answered
      val (rc, rep) = get(port, "/balances?tenant=TENANT")
      assert(rc == 200 && rep.contains("\"name\":\"CREDIT\"") &&
        rep.contains("\"balance\":1.0") && rep.contains("\"balance\":-1.0"),
        s"/balances: $rep")
      // GraphQL root field over the same declarative aggregate
      val q = java.net.URLEncoder.encode(
        """{ balances(tenant: "TENANT") { name balance __typename } }""", "UTF-8")
      val (gc, g) = get(port, s"/graphql?query=$q")
      assert(gc == 200 && g.contains("\"name\":\"CREDIT\"") &&
        g.contains("\"balance\":1") && g.contains("\"balance\":-1") &&
        g.contains("\"__typename\":\"account_balance\""), s"/graphql: $g")
      // the rule is installed on the serving session while the edge runs:
      // a GraphQL balance request's compiled plan must SCAN the MV — no
      // lake-wide aggregate anywhere in it
      val exec = new graft.api.GraphQLExecutor(
        () => spark.read.parquet(s"$wh/tenant"),
        () => spark.read.parquet(s"$wh/account"),
        () => spark.read.parquet(s"$wh/transfer"))
      val plan = exec.plans("""{ balances(tenant: "TENANT") { name balance } }""")
        .head.df.queryExecution.executedPlan.toString
      assert(!plan.contains("HashAggregate") && plan.contains("balances"),
        s"the GraphQL balance report must scan the maintained MV:\n$plan")
      // scoped shapes keep their plans (the rule's soundness declines):
      // the point lookup still aggregates its scan-filtered slice
      val pointPlan = Warehouse
        .balanceOf(spark.read.parquet(s"$wh/transfer"), "TENANT", "CREDIT")
        .queryExecution.executedPlan.toString
      assert(pointPlan.contains("HashAggregate"),
        s"the point lookup must keep its scan-filter aggregate:\n$pointPlan")
    } finally edge.stop()
    // stop() uninstalls: the same declarative report now aggregates the lake
    val after = Warehouse.balances(Warehouse.balanceChanges(
      spark.read.parquet(s"$wh/transfer")))
      .queryExecution.executedPlan.toString
    assert(after.contains("HashAggregate"),
      s"after stop() the rule must be gone:\n$after")
  }

  test("the edge keeps serving its pinned MV version across a concurrent sync publish") {
    // the swap-while-serving contract ON THE PRODUCTION WRITE PATH:
    // Warehouse.sync publishes the balance MV through VersionedRoot, the
    // edge resolves CURRENT once at start()/refresh() — so a sync that
    // publishes a new version mid-serving must be invisible to the edge
    // (even for PLANS BUILT AFTER THE PUBLISH: the rule is bound to the
    // pinned immutable v1 directory, not to the pointer), and a refresh()
    // must pick the new version up
    import graft.operators.VersionedRoot
    val jr = java.nio.file.Paths.get(fixture())
    def put(rel: String, content: String): Unit = {
      val p = jr.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content): Unit
    }
    val wh = Files.createTempDirectory("wh").toString
    Warehouse.sync(spark, jr.toString, wh)
    val mvRoot = java.nio.file.Paths.get(wh, "balances")
    val v1 = VersionedRoot.resolve(mvRoot)
    val edge = new HttpEdge(spark, wh, port = 0).start() // pins v1
    try {
      val port = edge.boundPort
      val (c1, r1) = get(port, "/balances?tenant=TENANT")
      assert(c1 == 200 && r1.contains("\"balance\":1.0"), s"pass 1: $r1")
      // a second journal pass lands a new committed transfer (+2/−2) and
      // PUBLISHES MV v2 while the edge is serving
      // filename = {status}_{amount}_{transaction}; content line 1 = version
      put("t_TENANT/account/CREDIT/events/0000000000/1_2_TRN2", "2\n")
      put("t_TENANT/account/DEBIT/events/0000000000/1_-2_TRN2", "2\n")
      put("t_TENANT/transaction/TRN2",
        "committed\nTRX TENANT CREDIT TENANT DEBIT 2020-01-02T00:00:00Z 2 CZK\n")
      Warehouse.sync(spark, jr.toString, wh)
      assert(VersionedRoot.resolve(mvRoot).getFileName.toString != "v1",
        "the second sync must publish a new MV version")
      assert(java.nio.file.Files.exists(v1),
        "retire(keep=2) must preserve the version a serving session pinned")
      // a FRESH plan shape (different cache key) built after the publish
      // still answers from the pinned v1 — the rule holds the immutable
      // version directory, not the moving pointer. If the rule had
      // declined (or chased the pointer), the lake's new transfer would
      // surface balance 3.0 here
      val (c2, r2) = get(port, "/balances?tenant=TENANT&pin=probe")
      assert(c2 == 200 && r2.contains("\"balance\":1.0") &&
        !r2.contains("\"balance\":3.0"),
        s"mid-serving publish must be invisible until refresh: $r2")
      // refresh(): re-resolve CURRENT → the new version serves
      edge.refresh()
      val (c3, r3) = get(port, "/balances?tenant=TENANT")
      assert(c3 == 200 && r3.contains("\"balance\":3.0") &&
        r3.contains("\"balance\":-3.0"),
        s"refresh must serve the newly published version: $r3")
    } finally edge.stop()
  }

  test("a GraftExtensions session injects the functions AND the conf-bound rule") {
    // the actual cluster deployment path: the shared test session is BUILT
    // with spark.sql.extensions=graft.functions.GraftExtensions (see
    // SparkSpec — extensions are static conf, applied where the
    // SparkContext is created). newSession() rebuilds SessionState from
    // the same extensions with a FRESH function registry, so (a) the
    // injected functions must resolve there without any register() call
    // (the temp-function path other suites exercise would mask this on
    // the parent session), and (b) setting the two balance confs must
    // activate the injected optimizer rule for that session alone.
    val wh = Files.createTempDirectory("wh").toString
    Warehouse.sync(spark, fixture(), wh)
    val s2 = spark.newSession()
    assert(s2.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0) == 11.0,
      "extension-injected functions must resolve on a fresh session")
    s2.conf.set(graft.plans.BalanceMvRewrite.MvPathConf, s"$wh/balances")
    s2.conf.set(graft.plans.BalanceMvRewrite.LakePathConf, s"$wh/transfer")
    val plan = graft.warehouse.Warehouse.balances(
      graft.warehouse.Warehouse.balanceChanges(
        s2.read.parquet(s"$wh/transfer")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && plan.contains("balances"),
      s"the extension-injected rule must answer from the MV:\n$plan")
    // the confs are session-scoped: the SHARED session stays unrewritten
    val shared = graft.warehouse.Warehouse.balances(
      graft.warehouse.Warehouse.balanceChanges(
        spark.read.parquet(s"$wh/transfer")))
      .queryExecution.executedPlan.toString
    assert(shared.contains("HashAggregate"),
      s"the rule must not leak across sessions:\n$shared")
  }

  test("concurrent requests over the pooled edge; plan cache reuses shapes") {
    val wh = Files.createTempDirectory("wh").toString
    Warehouse.sync(spark, fixture(), wh)
    val edge = new HttpEdge(spark, wh, port = 0).start()
    try {
      val port = edge.boundPort
      val paths = Seq(
        "/tenants", "/tenant?name=TENANT",
        "/account?tenant=TENANT&name=CREDIT",
        "/accounts?tenant=TENANT&currency=CZK",
        "/transfers?tenant=TENANT&status=committed",
        "/health")
      import java.util.concurrent.Executors
      val exec = Executors.newFixedThreadPool(12)
      try {
        val futures = (1 to 48).map { i =>
          val path = paths(i % paths.size)
          exec.submit(new java.util.concurrent.Callable[(String, Int, String)] {
            def call() = { val (c, b) = get(port, path); (path, c, b) }
          })
        }
        val results = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
        results.foreach { case (path, code, body) =>
          assert(code == 200, s"$path -> $code: $body")
        }
        // identical requests must return identical bodies under concurrency
        results.groupBy(_._1).foreach { case (_, rs) =>
          assert(rs.map(_._3).distinct.size == 1)
        }
        val byPath = results.groupBy(_._1).map { case (k, v) => k -> v.head._3 }
        assert(byPath("/tenant?name=TENANT") == "[{\"name\":\"TENANT\"}]")
        assert(byPath("/account?tenant=TENANT&name=CREDIT").contains("\"balance\":1.0"))
        // 5 distinct cacheable shapes ran 8x each -> exactly 5 cached
        // plans; /health is uncached, and these routes use page-scoped
        // balances rather than the shared aggregate entry
        assert(edge.cachedPlans == 5, s"cachedPlans=${edge.cachedPlans}")
        edge.refresh()
        assert(edge.cachedPlans == 0)
        assert(get(port, "/tenants")._2.contains("TENANT")) // rebuilds fine
      } finally exec.shutdown()
    } finally edge.stop()
  }
}
