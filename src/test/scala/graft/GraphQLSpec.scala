package graft

import java.nio.file.Files

import graft.api.{GraphQL, GraphQLExecutor, HttpEdge}
import graft.warehouse.Warehouse
import org.apache.spark.sql.DataFrame

/** GraphQL endpoint tests: the reference's three black-box scenarios
  * (bbtest/features/graphql_api.feature:3-142) executed verbatim as
  * GraphQL documents, plus parser/validation 400s
  * (routers/RootRouter.scala:22-41) and the selection-set guarantee that
  * `balance` only aggregates when requested.
  */
class GraphQLSpec extends SparkSpec {

  // journal fixture ≡ the bbtest Given steps (snapshot + events + tx)
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

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("wh").toString
    Warehouse.sync(spark, fixture(), dir)
    dir
  }

  private def table(name: String): DataFrame = spark.read.parquet(s"$wh/$name")

  private lazy val exec = new GraphQLExecutor(
    () => table("tenant"), () => table("account"), () => table("transfer"))

  test("bbtest scenario 1: tenants query") {
    val out = exec.execute(
      """query {
        |  tenants(limit: 1000, offset: 0) {
        |    name
        |  }
        |}""".stripMargin)
    assert(out == """{"data":{"tenants":[{"name":"TENANT"}]}}""")
  }

  test("__typename renders at root and on every object type; misuse is a 400") {
    val out = exec.execute(
      """query {
        |  __typename
        |  account(tenant: "TENANT", name: "CREDIT") {
        |    __typename
        |    name
        |    tenant { __typename name }
        |  }
        |  transfers(tenant: "TENANT", limit: 10, offset: 0) {
        |    __typename
        |    transfer
        |  }
        |}""".stripMargin)
    assert(out.contains(""""__typename":"Query""""))
    assert(out.contains(""""__typename":"account""""))
    assert(out.contains(""""__typename":"tenant""""))
    assert(out.contains(""""__typename":"transfer""""))
    // aliasing works like any field
    val aliased = exec.execute(
      """query { t: __typename }""")
    assert(aliased == """{"data":{"t":"Query"}}""")
    // a selection or an argument on __typename is an analysis error
    val selErr = intercept[GraphQL.AnalysisError](
      exec.execute("query { account(tenant: \"T\", name: \"A\") { __typename { x } } }"))
    assert(selErr.getMessage.contains("__typename"))
    val argErr = intercept[GraphQL.AnalysisError](
      exec.execute("query { __typename(x: 1) }"))
    assert(argErr.getMessage.contains("Unknown argument"))
  }

  test("accounts cursor pagination: after skips to the next page; offset must be 0") {
    val out = exec.execute(
      """query {
        |  accounts(tenant: "TENANT", limit: 2, offset: 0, after: "CREDIT") {
        |    name
        |  }
        |}""".stripMargin)
    assert(out == """{"data":{"accounts":[{"name":"DEBIT"},{"name":"IDLE"}]}}""")

    val err = intercept[GraphQL.AnalysisError](exec.execute(
      """query {
        |  accounts(tenant: "TENANT", limit: 2, offset: 1, after: "CREDIT") { name }
        |}""".stripMargin))
    assert(err.getMessage.contains("'offset' must be 0 when 'after' is set"))

    val t = exec.execute(
      """query { tenants(limit: 10, offset: 0, after: "A") { name } }""")
    assert(t == """{"data":{"tenants":[{"name":"TENANT"}]}}""")
  }

  test("directives under an unknown field are evaluated and stripped at every depth") {
    // the executor's invariant is that it NEVER sees Directive nodes; a
    // grandchild directive under an unknown field used to slip through
    val doc = GraphQL.parse(
      """query {
        |  nope { child { grand @skip(if: true) } kept @include(if: true) }
        |}""".stripMargin)
    val op = doc.operations.head
    val resolved = GraphQL.resolveFragments(doc, op,
      GraphQL.directiveFilter(op, Map.empty))
    def noDirectives(f: GraphQL.Field): Unit = {
      assert(f.directives.isEmpty, s"directive survived on '${f.name}'")
      f.selection.foreach {
        case c: GraphQL.Field => noDirectives(c)
        case other => fail(s"non-field selection survived: $other")
      }
    }
    resolved.selection.foreach { case f: GraphQL.Field => noDirectives(f) }
    // and the @skip'd grandchild is gone while its sibling stays
    val nope = resolved.selection.collectFirst {
      case f: GraphQL.Field if f.name == "nope" => f }.get
    val child = nope.fields.find(_.name == "child").get
    assert(child.fields.isEmpty, "skipped grandchild must be removed")
    assert(nope.fields.exists(_.name == "kept"))
  }

  test("bbtest scenario 2: accounts query with balance") {
    val out = exec.execute(
      """query {
        |  accounts(tenant: "TENANT", limit: 1000, offset: 0) {
        |    name,
        |    currency,
        |    balance
        |  }
        |}""".stripMargin)
    // name order; committed 1 CZK transfer ⇒ +1 / -1; idle account ⇒ 0,
    // and the zero renders as the JSON integer 0 (bbtest is type-strict)
    assert(out == """{"data":{"accounts":[""" +
      """{"name":"CREDIT","currency":"CZK","balance":1},""" +
      """{"name":"DEBIT","currency":"CZK","balance":-1},""" +
      """{"name":"IDLE","currency":"EUR","balance":0}]}}""")
  }

  test("bbtest scenario 3: combined accounts + transfers document") {
    val out = exec.execute(
      """query {
        |  accounts(tenant: "TENANT", limit: 1000, offset: 0) {
        |    name,
        |    currency,
        |    balance
        |  }
        |  transfers(tenant: "TENANT", limit: 1000, offset: 0) {
        |    transaction,
        |    status
        |    transfer
        |  }
        |}""".stripMargin)
    assert(out.contains(""""accounts":[{"name":"CREDIT","currency":"CZK","balance":1}"""))
    assert(out.contains(
      """"transfers":[{"transaction":"TRN","status":"committed","transfer":"TRX"}]"""))
  }

  test("balance is only computed when the selection asks for it") {
    val without = exec.plans(
      """{ accounts(tenant: "TENANT", limit: 10, offset: 0) { name currency } }""")
      .head.df.queryExecution.optimizedPlan.toString
    val withBal = exec.plans(
      """{ accounts(tenant: "TENANT", limit: 10, offset: 0) { name balance } }""")
      .head.df.queryExecution.optimizedPlan.toString
    assert(!without.contains("Aggregate") && !without.contains("transfer"),
      s"balance-free selection must not touch the transfer table:\n$without")
    assert(withBal.contains("Aggregate"),
      s"balance selection must aggregate balance changes:\n$withBal")
  }

  test("nested selection sets: transfer → credit/debit accounts with balances") {
    val out = exec.execute(
      """query {
        |  transfers(tenant: "TENANT", limit: 10, offset: 0) {
        |    transaction
        |    amount
        |    valueDate
        |    tenant { name }
        |    credit { name balance tenant { name } }
        |    debit { name balance }
        |  }
        |}""".stripMargin)
    assert(out.contains(""""transaction":"TRN""""))
    assert(out.contains(""""amount":1"""))
    assert(out.contains(""""valueDate":"2020-01-01T00:00:00""""))
    assert(out.contains(""""credit":{"name":"CREDIT","balance":1,"tenant":{"name":"TENANT"}}"""))
    assert(out.contains(""""debit":{"name":"DEBIT","balance":-1}"""))
  }

  test("status filter coerces enum words; point lookups; aliases; variables") {
    val committed = exec.execute(
      """query ($t: String!) {
        |  moved: transfers(tenant: $t, status: "committed", limit: 10, offset: 0) {
        |    transfer
        |  }
        |}""".stripMargin, None, Map("t" -> "TENANT"))
    assert(committed == """{"data":{"moved":[{"transfer":"TRX"}]}}""")

    val none = exec.execute(
      """{ transfers(tenant: "TENANT", status: "rollbacked", limit: 10, offset: 0) { transfer } }""")
    assert(none == """{"data":{"transfers":[]}}""")

    assert(exec.execute("""{ tenant(name: "TENANT") { name } }""") ==
      """{"data":{"tenant":{"name":"TENANT"}}}""")
    assert(exec.execute("""{ tenant(name: "NOPE") { name } }""") ==
      """{"data":{"tenant":null}}""")
    assert(exec.execute("""{ account(tenant: "TENANT", name: "IDLE") { currency } }""") ==
      """{"data":{"account":{"currency":"EUR"}}}""")
  }

  test("operationName selects among multiple operations") {
    val doc =
      """query A { tenants(limit: 1, offset: 0) { name } }
        |query B { tenant(name: "TENANT") { name } }""".stripMargin
    assert(exec.execute(doc, Some("B")) == """{"data":{"tenant":{"name":"TENANT"}}}""")
    intercept[GraphQL.AnalysisError](exec.execute(doc, None))
  }

  test("syntax and analysis errors carry source positions") {
    val syn = intercept[GraphQL.SyntaxError](exec.execute("query { tenants(limit: }"))
    assert(syn.line == 1 && syn.column == 24)
    val unknownRoot = intercept[GraphQL.AnalysisError](exec.execute("{ nope { x } }"))
    assert(unknownRoot.msg.contains("'nope'") && unknownRoot.line == 1)
    val unknownField = intercept[GraphQL.AnalysisError](
      exec.execute("""{ tenants(limit: 1, offset: 0) { name, nope } }"""))
    assert(unknownField.msg.contains("'nope'"))
    val missingArg = intercept[GraphQL.AnalysisError](
      exec.execute("""{ tenants(limit: 1) { name } }"""))
    assert(missingArg.msg.contains("offset"))
    val badStatus = intercept[GraphQL.AnalysisError](
      exec.execute("""{ transfers(tenant: "T", status: "nope", limit: 1, offset: 0) { transfer } }"""))
    assert(badStatus.msg.contains("Status"))
    // numeric-literal robustness: positioned errors, not raw NFEs
    intercept[GraphQL.SyntaxError](
      exec.execute("{ tenants(limit: -, offset: 0) { name } }"))
    intercept[GraphQL.SyntaxError](
      exec.execute("{ tenants(limit: 99999999999999999999999, offset: 0) { name } }"))
    intercept[GraphQL.SyntaxError](
      exec.execute("{ transfers(tenant: \"T\", amount_gte: 1e, limit: 1, offset: 0) { transfer } }"))
    // NaturalNumber caps at Int.MaxValue (pagination is Int-typed)
    val tooBig = intercept[GraphQL.AnalysisError](
      exec.execute("{ tenants(limit: 2147483648, offset: 0) { name } }"))
    assert(tooBig.msg.contains("NaturalNumber"))
    intercept[GraphQL.AnalysisError](exec.execute("mutation { x }"))
  }

  test("fragments: named spreads, inline fragments, and their error cases") {
    // named fragment reused at two nesting sites of the same type
    val named = exec.execute(
      """query {
        |  transfers(tenant: "TENANT", limit: 10, offset: 0) {
        |    transaction
        |    credit { ...acct }
        |    debit { ...acct }
        |  }
        |}
        |fragment acct on account { name currency balance }""".stripMargin)
    assert(named.contains(""""credit":{"name":"CREDIT","currency":"CZK","balance":1}"""))
    assert(named.contains(""""debit":{"name":"DEBIT","currency":"CZK","balance":-1}"""))

    // inline fragment + fragment-in-fragment at the root
    val inline = exec.execute(
      """query {
        |  accounts(tenant: "TENANT", limit: 10, offset: 0) {
        |    ... on account { name ...ccy }
        |  }
        |}
        |fragment ccy on account { currency }""".stripMargin)
    assert(inline.contains(""""accounts":[{"name":"CREDIT","currency":"CZK"}"""))

    // fragments must not re-trigger the balance aggregate when unused
    val plan = exec.plans(
      """query { accounts(tenant: "TENANT", limit: 1, offset: 0) { ...noBal } }
        |fragment noBal on account { name }""".stripMargin)
      .head.df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Aggregate"))

    val unknown = intercept[GraphQL.AnalysisError](
      exec.execute("""{ tenants(limit: 1, offset: 0) { ...frag } }"""))
    assert(unknown.msg.contains("Unknown fragment"))
    val mismatch = intercept[GraphQL.AnalysisError](exec.execute(
      """query { tenants(limit: 1, offset: 0) { ...acct } }
        |fragment acct on account { name }""".stripMargin))
    assert(mismatch.msg.contains("cannot be spread"))
    val cycle = intercept[GraphQL.AnalysisError](exec.execute(
      """query { tenants(limit: 1, offset: 0) { ...a } }
        |fragment a on tenant { ...b }
        |fragment b on tenant { ...a }""".stripMargin))
    assert(cycle.msg.contains("cycle"))
    val dup = intercept[GraphQL.AnalysisError](exec.execute(
      """query { tenants(limit: 1, offset: 0) { name } }
        |fragment a on tenant { name }
        |fragment a on tenant { name }""".stripMargin))
    assert(dup.msg.contains("defined twice"))

    // overlapping spreads MERGE into one field (CollectFields), not
    // duplicate JSON keys
    val merged = exec.execute(
      """query {
        |  transfers(tenant: "TENANT", limit: 10, offset: 0) { ...a ...b }
        |}
        |fragment a on transfer { credit { name } }
        |fragment b on transfer { credit { currency } }""".stripMargin)
    assert(merged.contains(""""credit":{"name":"CREDIT","currency":"CZK"}"""))
    assert(merged.indexOf("\"credit\":") == merged.lastIndexOf("\"credit\":"))

    // spreads cannot apply inside scalar fields
    val scalar = intercept[GraphQL.AnalysisError](exec.execute(
      """query { tenants(limit: 1, offset: 0) { name { ...a } } }
        |fragment a on tenant { name }""".stripMargin))
    assert(scalar.msg.contains("cannot be applied"))

    // one or two dots is a syntax error, not a spread
    intercept[GraphQL.SyntaxError](exec.execute(
      """query { tenants(limit: 1, offset: 0) { .a } }
        |fragment a on tenant { name }""".stripMargin))

    // a fragment no operation references is an error...
    val unused = intercept[GraphQL.AnalysisError](exec.execute(
      """query { tenants(limit: 1, offset: 0) { name } }
        |fragment lone on tenant { name }""".stripMargin))
    assert(unused.msg.contains("never used"))
    // ...but one referenced by ANOTHER operation in the document is fine
    val other = exec.execute(
      """query A { tenants(limit: 1, offset: 0) { name } }
        |query B { tenant(name: "TENANT") { ...t } }
        |fragment t on tenant { name }""".stripMargin, Some("A"))
    assert(other == """{"data":{"tenants":[{"name":"TENANT"}]}}""")
    // unreached fragments still get validated
    val badBody = intercept[GraphQL.AnalysisError](exec.execute(
      """query A { tenants(limit: 1, offset: 0) { name } }
        |query B { tenant(name: "TENANT") { ...t } }
        |fragment t on tenant { ...missing }""".stripMargin, Some("A")))
    assert(badBody.msg.contains("Unknown fragment"))
  }

  test("@skip/@include: literals, variables, defaults, and spread exclusion") {
    // literal skip drops the field from the result entirely
    assert(exec.execute(
      """query { tenants(limit: 10, offset: 0) { name @skip(if: true) } }""")
      == """{"data":{"tenants":[{}]}}""")
    // include via variable; false drops the whole root field
    assert(exec.execute(
      """query($v: Boolean!) {
        |  tenants(limit: 10, offset: 0) @include(if: $v) { name }
        |}""".stripMargin, variables = Map("v" -> false))
      == """{"data":{}}""")
    assert(exec.execute(
      """query($v: Boolean!) {
        |  tenants(limit: 10, offset: 0) @include(if: $v) { name }
        |}""".stripMargin, variables = Map("v" -> true))
      == """{"data":{"tenants":[{"name":"TENANT"}]}}""")
    // variable default feeds the condition when no value is supplied
    assert(exec.execute(
      """query($v: Boolean = true) {
        |  tenants(limit: 10, offset: 0) { name @skip(if: $v) }
        |}""".stripMargin)
      == """{"data":{"tenants":[{}]}}""")
    // a @skip'd spread is excluded from execution but still counts as the
    // fragment's reference — NOT an unused-fragment error
    assert(exec.execute(
      """query { tenants(limit: 10, offset: 0) { ...f @skip(if: true) } }
        |fragment f on tenant { name }""".stripMargin)
      == """{"data":{"tenants":[{}]}}""")
    // both directives on one selection: all must agree to keep it
    assert(exec.execute(
      """query { tenants(limit: 10, offset: 0) {
        |  name @include(if: true) @skip(if: false) } }""".stripMargin)
      == """{"data":{"tenants":[{"name":"TENANT"}]}}""")
  }

  test("@directive spec edges: other ops' fragments, null vars, bare inlines, repeats") {
    // a fragment used only by ANOTHER operation may reference that op's
    // variables in its directives; executing THIS op must not resolve them
    assert(exec.execute(
      """query A($v: Boolean!) { tenants(limit: 1, offset: 0) { ...g } }
        |query B { tenants(limit: 1, offset: 0) { name } }
        |fragment g on tenant { name @skip(if: $v) }""".stripMargin,
      operationName = Some("B"))
      == """{"data":{"tenants":[{"name":"TENANT"}]}}""")
    // JSON null variable → positioned 400, not an NPE/500
    assert(intercept[GraphQL.AnalysisError](exec.execute(
      """query($v: Boolean!) { tenants(limit: 1, offset: 0) @skip(if: $v) { name } }""",
      variables = Map("v" -> null))).getMessage.contains("expects a Boolean"))
    // bare inline fragment (no type condition) is a valid directive position
    assert(exec.execute(
      """query { tenants(limit: 1, offset: 0) { ... @include(if: false) { name } } }""")
      == """{"data":{"tenants":[{}]}}""")
    assert(exec.execute(
      """query { tenants(limit: 1, offset: 0) { ... { name } } }""")
      == """{"data":{"tenants":[{"name":"TENANT"}]}}""")
    // DirectivesAreUniquePerLocation: repeating @skip is a 400
    assert(intercept[GraphQL.AnalysisError](exec.execute(
      """query { tenants(limit: 1, offset: 0) { name @skip(if: false) @skip(if: true) } }"""))
      .getMessage.contains("can only be used once"))
  }

  test("@directive error cases: unknown name, bad argument, non-boolean") {
    def analysisError(q: String, vars: Map[String, Any] = Map.empty): String =
      intercept[GraphQL.AnalysisError](exec.execute(q, variables = vars)).getMessage
    assert(analysisError(
      "query { tenants(limit: 10, offset: 0) @deprecated { name } }")
      .contains("Unknown directive '@deprecated'"))
    assert(analysisError(
      "query { tenants(limit: 10, offset: 0) @skip { name } }")
      .contains("requires exactly one argument 'if'"))
    assert(analysisError(
      "query { tenants(limit: 10, offset: 0) @skip(unless: true) { name } }")
      .contains("requires exactly one argument 'if'"))
    assert(analysisError(
      """query { tenants(limit: 10, offset: 0) @skip(if: "yes") { name } }""")
      .contains("expects a Boolean"))
    assert(analysisError(
      """query($v: Boolean!) {
        |  tenants(limit: 10, offset: 0) @skip(if: $v) { name }
        |}""".stripMargin)
      .contains("expected value of type 'Boolean!'"))
  }

  test("graphql over HTTP: POST (bbtest body shape), GET, and 400 mapping") {
    val edge = new HttpEdge(spark, wh, port = 0).start()
    try {
      val port = edge.boundPort
      def post(body: String): (Int, String) = {
        val url = java.net.URI.create(s"http://localhost:$port/graphql").toURL
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/json")
        conn.getOutputStream.write(body.getBytes("UTF-8"))
        val code = conn.getResponseCode
        val is = if (code < 400) conn.getInputStream else conn.getErrorStream
        val out = new String(is.readAllBytes(), "UTF-8")
        conn.disconnect()
        (code, out)
      }
      // bbtest posts {"query":…,"variables":null,"operationName":null}
      val q = """query { tenants(limit: 1000, offset: 0) { name } }"""
      val (c1, b1) = post(
        s"""{"query":${ujson(q)},"variables":null,"operationName":null}""")
      assert(c1 == 200 && b1 == """{"data":{"tenants":[{"name":"TENANT"}]}}""")

      // GET form (GraphQLRouter.scala:57-63)
      val enc = java.net.URLEncoder.encode("{ tenant(name: \"TENANT\") { name } }", "UTF-8")
      val url = java.net.URI.create(s"http://localhost:$port/graphql?query=$enc").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      assert(new String(conn.getInputStream.readAllBytes(), "UTF-8") ==
        """{"data":{"tenant":{"name":"TENANT"}}}""")

      // syntax error → 400 {"syntaxError":…,"locations":[…]} (RootRouter.scala:28-38)
      val (c2, b2) = post("""{"query":"query { tenants(limit: }"}""")
      assert(c2 == 400 && b2.contains("syntaxError") && b2.contains("\"line\":1"))

      // analysis error → 400 {"errors":[…]} (RootRouter.scala:24-25)
      val (c3, b3) = post("""{"query":"{ nope { x } }"}""")
      assert(c3 == 400 && b3.contains("\"errors\"") && b3.contains("nope"))

      // non-JSON body → 400
      val (c4, _) = post("not json")
      assert(c4 == 400)

      // the GraphiQL console is served next to the endpoint
      val ui = java.net.URI.create(s"http://localhost:$port/graphiql").toURL
      val uiConn = ui.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(uiConn.getResponseCode == 200)
      val uiBody = new String(uiConn.getInputStream.readAllBytes(), "UTF-8")
      assert(uiBody.contains("<!doctype html") && uiBody.contains("/graphql"))
    } finally edge.stop()
  }

  private def ujson(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
