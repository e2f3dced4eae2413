package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.warehouse.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's user-facing query surface re-expressed as a thin HTTP/
  * JSON edge over the DataFrame builders — five root fields
  * (GraphQLService.scala:207-292) plus the health probe
  * (HealthCheckService.scala:8-18, probe = `tenants(limit 1)`).
  *
  * Transport is deliberately minimal (JDK HttpServer, GET + query params,
  * JSON out via Dataset.toJSON): the engine work — filters, pagination,
  * joins, balance aggregation — happens in the SAME Catalyst plans the
  * oracle gate checks; the edge only parses arguments and serializes rows.
  * Sangria's deferred-Fetcher waves (GraphQLService.scala:118-151) have no
  * analog here because nested fields are joins inside one plan.
  *
  * Routes:
  *   GET /health                             → {"healthy":bool,"graphql":bool}
  *   GET /tenants?limit=&offset=
  *   GET /tenant?name=
  *   GET /accounts?tenant=&currency=&format=&limit=&offset=
  *   GET /account?tenant=&name=               (includes computed balance)
  *   GET /transfers?tenant=&currency=&status=&amount_lt|lte|gt|gte=&
  *       value_date_lt|lte|gt|gte=&limit=&offset=&resolve=true|false
  *   GET /balances?tenant=                     (full per-tenant balance
  *       report — MV-answered when the sync-maintained pre-agg exists)
  *
  *   POST/GET /graphql                       → the GraphQL surface (see
  *       GraphQLExecutor; selection sets drive the plans)
  *
  * Requests are served by a small fixed pool over one shared
  * SparkSession, and built plans are memoized per (route, args) — see the
  * plan-cache note below.
  */
final class HttpEdge(spark: SparkSession, warehouseDir: String, port: Int) {

  private def table(name: String): DataFrame =
    spark.read.parquet(s"$warehouseDir/$name")

  // ---- plan cache ------------------------------------------------------
  //
  // Analysis + optimization of these small plans costs single-digit ms per
  // request — the analog of the reference preparing a statement per query
  // (GraphQLPersistence.scala:149-368). The LRU below memoizes the BUILT
  // DataFrame per normalized (route, args) key, so repeated request shapes
  // (point lookups, hot dashboards) skip plan construction entirely;
  // execution still runs per request. Caching a DataFrame pins its file
  // LISTING: the edge serves the warehouse snapshot it first read —
  // call refresh() (or construct a new edge) after a sync pass.
  private val planCache =
    new java.util.LinkedHashMap[String, DataFrame](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, DataFrame]): Boolean =
        size > 256
    }

  private def cached(key: String)(build: => DataFrame): DataFrame = {
    val hit = planCache.synchronized(planCache.get(key))
    if (hit != null) hit
    else {
      val df = build // build outside the lock: analysis may take ms
      planCache.synchronized(planCache.put(key, df))
      df
    }
  }

  /** Cached-plan count (bounded at 256) — exposed for tests/monitoring. */
  def cachedPlans: Int = planCache.synchronized(planCache.size)

  /** Drop all cached plans (and their pinned file listings) so subsequent
    * requests see the current warehouse state. The balance MV's CURRENT
    * pointer is re-resolved here and ONLY here (and at start()): between
    * refreshes the edge serves one pinned, immutable MV version, so a
    * sync publishing mid-request can never yank files from a running
    * scan — the swap-while-serving contract, deployed.
    */
  def refresh(): Unit = {
    planCache.synchronized(planCache.clear())
    gqlCache.synchronized(gqlCache.clear())
    installMvRule() // re-resolve CURRENT + re-bind to the fresh lake listing
  }

  // ---- balance-MV rewrite on the serving path --------------------------
  //
  // M10 deployed: when the sync pass maintained `$warehouseDir/balances`
  // (Warehouse.sync does on every transfer-appending pass), the edge
  // installs BalanceMvRewrite on its session, so the declarative full-lake
  // balance report (`/balances`, GraphQL `balances`) plans as a scan of
  // |accounts| pre-aggregated rows instead of aggregating the transfer
  // lake per request. extraOptimizations is the runtime form of the
  // cluster deployment (`spark.sql.extensions=graft.functions
  // .GraftExtensions` + the spark.graft.balance.{mv,lake}Path confs —
  // GraftExtensions injects the same conf-bound rule at session build).
  // Scoped point lookups and pages keep their balanceOf/balancesFor plans:
  // the rule's soundness checks decline subset aggregates by design.
  private var mvRule: Option[graft.plans.BalanceMvRewrite] = None

  private def installMvRule(): Unit = synchronized {
    mvRule.foreach { r =>
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq r)
    }
    mvRule = None
    // the sync pass publishes the MV through VersionedRoot: resolve the
    // CURRENT pointer ONCE per install — the resolved v<N> directory is
    // immutable, so every plan built until the next refresh() reads one
    // consistent MV version regardless of concurrent publishes. The
    // root helper dispatches the storage backend by scheme (r19): local
    // warehouseDirs read through java.nio, hdfs://-style ones through
    // the Hadoop FileSystem — same protocol, same pointer; copy-rename
    // object stores still fail fast (VStore.forRoot). Deployment
    // contract: refresh() at least every mvKeepVersions-1 sync passes,
    // or the pinned version can be vacuumed mid-serve (Warehouse.sync's
    // retire knob).
    val (mvStore, mvRoot) =
      graft.warehouse.Warehouse.balancesRoot(warehouseDir)
    if (graft.operators.VersionedRoot.publishedAt(mvStore, mvRoot)) {
      val pinned = graft.operators.VersionedRoot.resolveAt(mvStore, mvRoot)
      val rule = graft.plans.BalanceMvRewrite.forSource(spark, pinned,
        Warehouse.balances(Warehouse.balanceChanges(table("transfer"))))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
      mvRule = Some(rule)
    }
  }

  private def uninstallMvRule(): Unit = synchronized {
    mvRule.foreach { r =>
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq r)
    }
    mvRule = None
  }

  /** The full per-tenant balance report — the declarative lake aggregate
    * the MV rule answers from the pre-agg when installed. The tenant
    * filter sits ABOVE the aggregate (on its grouping key), so the
    * rewritten plan is a filtered MV scan.
    */
  private def balancesDf(tenant: String): DataFrame =
    Warehouse.balances(Warehouse.balanceChanges(table("transfer")))
      .filter(col("tenant") === lit(tenant))
      .withColumn("balance", col("balance").cast("double"))
      .orderBy("name")

  /** Injective key: components are re-encoded so decoded values containing
    * '&'/'=' cannot collide with genuinely distinct parameter sets.
    */
  private def cacheKey(path: String, p: Map[String, String]): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    p.toSeq.sorted.map { case (k, v) => s"${enc(k)}=${enc(v)}" }
      .mkString(s"$path?", "&", "")
  }


  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  /** Small fixed pool — the analog of the reference's bounded DB
    * connection pool. Each request runs read-only plans against a shared
    * SparkSession (thread-safe); the pool bounds how many Spark jobs the
    * edge can have in flight, backpressuring HTTP instead of flooding the
    * scheduler.
    */
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(
    math.min(8, Runtime.getRuntime.availableProcessors()))

  /** Bound port (useful when constructed with port 0 in tests). */
  def boundPort: Int = server.getAddress.getPort

  private def params(ex: HttpExchange): Map[String, String] = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    q.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def json(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  private def handle(path: String)(f: Map[String, String] => String): Unit =
    server.createContext(path, (ex: HttpExchange) =>
      try respond(ex, 200, f(params(ex)))
      catch {
        case e: IllegalArgumentException =>
          respond(ex, 400, s"""{"error":${quote(e.getMessage)}}""")
        case e: Throwable =>
          respond(ex, 500, s"""{"error":${quote(e.toString)}}""")
      })

  private def quote(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def required(p: Map[String, String], k: String): String =
    p.getOrElse(k, throw new IllegalArgumentException(s"missing arg: $k"))

  /** Cursor pagination contract, same as the GraphQL edge: a nonzero
    * offset next to `after` is a 400, never a silently-ignored parameter.
    */
  private def noOffsetWithAfter(p: Map[String, String]): Unit =
    if (p.get("offset").exists(_ != "0"))
      throw new IllegalArgumentException("offset must be 0 (or absent) when after is set")

  /** Status accepts the GraphQL enum word or the numeric code
    * (GraphQLService.scala:38-59). */
  private def parseStatus(s: String): Int = s match {
    case "committed" => 1
    case "rollbacked" => 2
    case "promised" => 0
    case n => n.toInt
  }

  /** GraphQL endpoint (GraphQLRouter.scala:14-64): POST /graphql with a
    * JSON body {query, operationName, variables} (array-wrapped bodies
    * accepted, :38-44) and GET /graphql?query=&operation=. Error mapping
    * follows RootRouter.scala:22-41 — syntax errors and query-analysis
    * errors are 400s carrying the source position.
    */
  private lazy val graphql = new GraphQLExecutor(
    () => table("tenant"), () => table("account"), () => table("transfer"))

  /** Compiled GraphQL root plans per (document, operation, variables) —
    * same LRU/snapshot semantics as the REST plan cache.
    */
  private val gqlCache =
    new java.util.LinkedHashMap[String, List[graphql.RootPlan]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, List[graphql.RootPlan]]): Boolean = size > 256
    }

  private def handleGraphql(ex: HttpExchange): Unit =
    try {
      val (query, opName, vars) = ex.getRequestMethod match {
        case "POST" =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          parseGraphqlBody(body)
        case "GET" =>
          val p = params(ex)
          (p.getOrElse("query", throw new IllegalArgumentException("missing arg: query")),
            p.get("operation"), Map.empty[String, Any])
        case m =>
          throw new IllegalArgumentException(s"unsupported method $m")
      }
      // injective key: encoded components so variable values containing
      // the delimiters cannot collide across distinct requests
      val key = {
        def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
        "graphql:" + enc(query) + " " + enc(opName.getOrElse("")) + " " +
          vars.toSeq.sortBy(_._1)
            .map { case (k, v) => s"${enc(k)}=${enc(String.valueOf(v))}" }
            .mkString(",")
      }
      val compiled = {
        val hit = gqlCache.synchronized(gqlCache.get(key))
        if (hit != null) hit
        else {
          val p = graphql.plans(query, opName, vars)
          gqlCache.synchronized(gqlCache.put(key, p))
          p
        }
      }
      respond(ex, 200, graphql.renderResponse(compiled))
    } catch {
      case GraphQL.SyntaxError(msg, line, col) =>
        respond(ex, 400,
          s"""{"syntaxError":${quote(s"Syntax error while parsing GraphQL query. Invalid input, $msg")},""" +
            s""""locations":[{"line":$line,"column":$col}]}""")
      case GraphQL.AnalysisError(msg, line, col) =>
        respond(ex, 400,
          s"""{"errors":[{"message":${quote(msg)},"locations":[{"line":$line,"column":$col}]}]}""")
      case e: IllegalArgumentException =>
        respond(ex, 400, s"""{"error":${quote(e.getMessage)}}""")
      case e: Throwable =>
        respond(ex, 500, s"""{"error":${quote(e.toString)}}""")
    }

  /** {query, operationName, variables} out of the POST body; a JSON array
    * body contributes its first element (GraphQLRouter.scala:38-44).
    */
  private def parseGraphqlBody(body: String): (String, Option[String], Map[String, Any]) = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val root =
      try new ObjectMapper().readTree(body)
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"request body is not JSON: ${e.getMessage}") }
    val obj = if (root != null && root.isArray && root.size > 0) root.get(0) else root
    if (obj == null || !obj.isObject)
      throw new IllegalArgumentException("request body must be a JSON object")
    val query = Option(obj.get("query")).filter(_.isTextual).map(_.asText)
      .getOrElse(throw new IllegalArgumentException("missing field: query"))
    val opName = Option(obj.get("operationName")).filter(_.isTextual).map(_.asText)
    val vars: Map[String, Any] = Option(obj.get("variables")).filter(_.isObject) match {
      case None => Map.empty
      case Some(v) =>
        val it = v.fields()
        val b = Map.newBuilder[String, Any]
        while (it.hasNext) {
          val e = it.next()
          val value: Any = e.getValue match {
            case n: JsonNode if n.isNull => null
            case n: JsonNode if n.isTextual => n.asText
            case n: JsonNode if n.isIntegralNumber => n.asLong
            case n: JsonNode if n.isNumber => BigDecimal(n.decimalValue)
            case n: JsonNode if n.isBoolean => n.asBoolean
            case n: JsonNode => n.toString
          }
          b += e.getKey -> value
        }
        b.result()
    }
    (query, opName, vars)
  }

  private def transferArgs(p: Map[String, String]): Api.TransferArgs = {
    // malformed user input must surface as a 400, not a 500
    def arg[T](k: String)(parse: String => T): Option[T] =
      p.get(k).map { v =>
        try parse(v)
        catch {
          case e: Exception =>
            throw new IllegalArgumentException(s"bad $k: ${e.getMessage}")
        }
      }
    def dec(k: String) = arg(k)(BigDecimal(_))
    def ts(k: String) = arg(k)(v =>
      java.sql.Timestamp.from(java.time.Instant.parse(v)))
    Api.TransferArgs(
      currency = p.get("currency"),
      status = p.get("status").map(parseStatus),
      amountLt = dec("amount_lt"), amountLte = dec("amount_lte"),
      amountGt = dec("amount_gt"), amountGte = dec("amount_gte"),
      valueDateLt = ts("value_date_lt"), valueDateLte = ts("value_date_lte"),
      valueDateGt = ts("value_date_gt"), valueDateGte = ts("value_date_gte"))
  }

  def start(): HttpEdge = {
    handle("/health") { _ =>
      val ok =
        try Api.tenants(table("tenant"), limit = 1, offset = 0).count() >= 0
        catch { case _: Throwable => false }
      s"""{"healthy":$ok,"graphql":$ok}"""
    }
    handle("/tenants") { p =>
      // `after=<name>` switches to keyset pagination (O(page) deep scans)
      json(cached(cacheKey("/tenants", p))(p.get("after") match {
        case a @ Some(_) =>
          noOffsetWithAfter(p)
          Api.tenantsAfter(table("tenant"), a,
            p.getOrElse("limit", "100").toLong)
        case None => Api.tenants(table("tenant"),
          p.getOrElse("limit", "100").toLong, p.getOrElse("offset", "0").toLong)
      }))
    }
    handle("/tenant") { p =>
      json(cached(cacheKey("/tenant", p))(Api.tenant(table("tenant"), required(p, "name"))))
    }
    handle("/accounts") { p =>
      // page on the raw account table, join balances ONCE on the page
      // (feeding the balance join into the filter input would compute the
      // full aggregation twice per request)
      json(cached(cacheKey("/accounts", p))({
        // `after=<name>` switches to keyset pagination, like /transfers
        val page = p.get("after") match {
          case a @ Some(_) =>
            noOffsetWithAfter(p)
            Api.accountsAfter(table("account"), required(p, "tenant"),
              currency = p.get("currency"), format = p.get("format"),
              after = a, limit = p.getOrElse("limit", "100").toLong)
          case None => Api.accounts(table("account"), required(p, "tenant"),
            currency = p.get("currency"), format = p.get("format"),
            limit = p.getOrElse("limit", "100").toLong,
            offset = p.getOrElse("offset", "0").toLong)
        }
        // balancesFor scopes the aggregate to the page's accounts
        page.join(Warehouse.balancesFor(table("transfer"), page),
          Seq("tenant", "name"), "left")
          .withColumn("balance",
            coalesce(col("balance"), lit(0).cast("decimal(38,18)")).cast("double"))
          .orderBy("name")
      }))
    }
    handle("/account") { p =>
      val t = required(p, "tenant"); val n = required(p, "name")
      // point lookup: Warehouse.balanceOf pushes the credit/debit
      // disjunction into the transfer scan (the page route's shared
      // balance aggregate would scan every transfer for one account)
      json(cached(cacheKey("/account", p))(
        Api.account(
          table("account")
            .join(Warehouse.balanceOf(table("transfer"), t, n),
              Seq("tenant", "name"), "left")
            .withColumn("balance",
              coalesce(col("balance"), lit(0).cast("decimal(38,18)")).cast("double"))
            .select("tenant", "name", "currency", "format", "balance"),
          t, n)))
    }
    handle("/transfers") { p => json(cached(cacheKey("/transfers", p))(transfersDf(p))) }
    // the full per-tenant balance report (extension §2x): the declarative
    // lake aggregate, answered from the maintained MV when the rule is
    // installed (see installMvRule) — the one route that would otherwise
    // aggregate the whole transfer lake per request
    handle("/balances") { p =>
      json(cached(cacheKey("/balances", p))(balancesDf(required(p, "tenant"))))
    }
    server.createContext("/graphql", (ex: HttpExchange) => handleGraphql(ex))
    // the reference serves a GraphiQL UI next to the endpoint
    // (GraphQLRouter.scala:66-73); self-contained equivalent, no CDN assets
    server.createContext("/graphiql", (ex: HttpExchange) => {
      val bytes = HttpEdge.GraphiqlHtml.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    // a small pool instead of serial dispatch: plans are read-only and
    // SparkSession actions are thread-safe; concurrent requests become
    // concurrent Spark jobs (FIFO-scheduled). Pool ≈ the reference's DB
    // connection pool, not one-thread-per-request.
    server.setExecutor(pool)
    installMvRule()
    server.start()
    this
  }

  private def transfersDf(p: Map[String, String]): DataFrame = {
    // `after=<transaction>,<transfer>` switches to keyset pagination —
    // the O(page) path for deep scans (offset stays for parity with the
    // reference's drop/take)
    val page = p.get("after") match {
        case Some(cursor) =>
          noOffsetWithAfter(p)
          val cur = cursor.split(",", 2) match {
            case Array(tx, tr) => (tx, tr)
            case _ => throw new IllegalArgumentException(
              "after must be <transaction>,<transfer>")
          }
          Api.transfersAfter(table("transfer"), required(p, "tenant"),
            transferArgs(p), after = Some(cur),
            limit = p.getOrElse("limit", "100").toLong)
        case None =>
          Api.transfers(table("transfer"), required(p, "tenant"),
            transferArgs(p),
            limit = p.getOrElse("limit", "100").toLong,
            offset = p.getOrElse("offset", "0").toLong)
      }
    val out =
      if (p.get("resolve").contains("true")) {
        // balance aggregation scoped to the page's credit/debit accounts
        val keys = page
          .select(col("credit_tenant").as("tenant"), col("credit_name").as("name"))
          .unionByName(page
            .select(col("debit_tenant").as("tenant"), col("debit_name").as("name")))
        Api.transfersResolved(page, table("account"),
          Warehouse.balancesFor(table("transfer"), keys))
          .withColumn("credit_balance", col("credit_balance").cast("double"))
          .withColumn("debit_balance", col("debit_balance").cast("double"))
      }
      else page.withColumn("status_word", Api.statusWord(col("status")))
    // joins do not preserve the page's sort order — reassert it so the
    // last JSON row is a valid keyset cursor for the next page
    out.withColumn("amount", col("amount").cast("double"))
      .orderBy("transaction", "transfer")
  }

  def stop(): Unit = {
    uninstallMvRule()
    server.stop(0)
    pool.shutdown()
  }
}

object HttpEdge {
  /** Minimal self-contained query console (the reference ships GraphiQL,
    * GraphQLRouter.scala:66-73; this needs no bundled JS assets).
    */
  private[api] val GraphiqlHtml: String =
    """<!doctype html>
      |<html><head><meta charset="utf-8"><title>graft graphql</title><style>
      |body{font-family:monospace;margin:1rem;display:flex;gap:1rem;height:90vh}
      |textarea,pre{flex:1;padding:.5rem;border:1px solid #888;overflow:auto}
      |button{position:fixed;top:.3rem;right:1rem}
      |</style></head><body>
      |<textarea id="q">query {
      |  tenants(limit: 10, offset: 0) { name }
      |}</textarea>
      |<pre id="out">ctrl-enter or Run</pre>
      |<button onclick="run()">Run</button>
      |<script>
      |async function run(){
      |  const r = await fetch('/graphql', {method:'POST',
      |    headers:{'Content-Type':'application/json'},
      |    body: JSON.stringify({query: document.getElementById('q').value,
      |                          variables: null, operationName: null})});
      |  const t = await r.text();
      |  let out = t;
      |  try { out = JSON.stringify(JSON.parse(t), null, 2) } catch (e) {}
      |  document.getElementById('out').textContent = r.status + '\n' + out;
      |}
      |document.getElementById('q').addEventListener('keydown', e => {
      |  if (e.ctrlKey && e.key === 'Enter') run();
      |});
      |</script></body></html>""".stripMargin
}
