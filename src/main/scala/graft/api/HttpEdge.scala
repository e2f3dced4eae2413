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
  *
  * Each request re-analyzes a small plan (ms-scale) — the analog of the
  * reference's per-request prepared statements; at scale a plan cache per
  * query template drops even that.
  */
final class HttpEdge(spark: SparkSession, warehouseDir: String, port: Int) {

  private def table(name: String): DataFrame =
    spark.read.parquet(s"$warehouseDir/$name")

  private def balances: DataFrame =
    Warehouse.balances(Warehouse.balanceChanges(table("transfer")))

  /** Accounts with their computed balance (A1) joined in-plan. */
  private def accountsWithBalance: DataFrame =
    table("account")
      .join(balances, Seq("tenant", "name"), "left")
      .withColumn("balance",
        coalesce(col("balance"), lit(0).cast("decimal(38,18)")).cast("double"))
      .select("tenant", "name", "currency", "format", "balance")

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

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
    () => table("tenant"), () => table("account"), () => table("transfer"),
    () => balances)

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
      respond(ex, 200, graphql.execute(query, opName, vars))
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
      json(Api.tenants(table("tenant"),
        p.getOrElse("limit", "100").toLong, p.getOrElse("offset", "0").toLong))
    }
    handle("/tenant") { p => json(Api.tenant(table("tenant"), required(p, "name"))) }
    handle("/accounts") { p =>
      // page on the raw account table, join balances ONCE on the page
      // (feeding the balance join into the filter input would compute the
      // full aggregation twice per request)
      json(Api.accounts(table("account"), required(p, "tenant"),
        currency = p.get("currency"), format = p.get("format"),
        limit = p.getOrElse("limit", "100").toLong,
        offset = p.getOrElse("offset", "0").toLong)
        .join(balances, Seq("tenant", "name"), "left")
        .withColumn("balance",
          coalesce(col("balance"), lit(0).cast("decimal(38,18)")).cast("double"))
        .orderBy("name"))
    }
    handle("/account") { p =>
      json(Api.account(accountsWithBalance, required(p, "tenant"), required(p, "name")))
    }
    handle("/transfers") { p =>
      // `after=<transaction>,<transfer>` switches to keyset pagination —
      // the O(page) path for deep scans (offset stays for parity with the
      // reference's drop/take)
      val page = p.get("after") match {
        case Some(cursor) =>
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
        if (p.get("resolve").contains("true"))
          Api.transfersResolved(page, table("account"), balances)
            .withColumn("credit_balance", col("credit_balance").cast("double"))
            .withColumn("debit_balance", col("debit_balance").cast("double"))
        else page.withColumn("status_word", Api.statusWord(col("status")))
      // joins do not preserve the page's sort order — reassert it so the
      // last JSON row is a valid keyset cursor for the next page
      json(out.withColumn("amount", col("amount").cast("double"))
        .orderBy("transaction", "transfer"))
    }
    server.createContext("/graphql", (ex: HttpExchange) => handleGraphql(ex))
    server.setExecutor(null) // serial dispatch ≡ reference's single DB pool
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)
}
