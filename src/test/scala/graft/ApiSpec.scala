package graft

import graft.api.Api
import org.apache.spark.sql.functions._

/** Pagination algebra: keyset pages chain to exactly the offset-paginated
  * sequence, and the union of all pages is the unpaginated result.
  */
class ApiSpec extends SparkSpec {

  import spark.implicits._

  private lazy val transfers =
    (1 to 23).map { i =>
      ("T", f"tx$i%03d", s"t$i", 1, "T", "a", "T", "b",
        BigDecimal(i), "CZK", java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
    }.toDF("tenant", "transaction", "transfer", "status", "credit_tenant",
      "credit_name", "debit_tenant", "debit_name", "amount", "currency", "value_date")

  test("keyset pagination chains through the same sequence as offset pages") {
    val byOffset = (0 until 23 by 5).flatMap { off =>
      Api.transfers(transfers, "T", limit = 5, offset = off)
        .select("transaction", "transfer").collect()
        .map(r => (r.getString(0), r.getString(1)))
    }

    var cursor: Option[(String, String)] = None
    val byKeyset = Iterator.continually {
      val page = Api.transfersAfter(transfers, "T", after = cursor, limit = 5)
        .select("transaction", "transfer").collect()
        .map(r => (r.getString(0), r.getString(1)))
      cursor = page.lastOption
      page
    }.takeWhile(_.nonEmpty).flatten.toSeq

    assert(byKeyset == byOffset)
    assert(byKeyset.size == 23 && byKeyset.distinct.size == 23)
  }

  test("accounts/tenants keyset pages chain to the offset sequence") {
    val accounts = (1 to 17).map(i => ("T", f"a$i%03d", "CZK", "F1"))
      .toDF("tenant", "name", "currency", "format")

    val byOffset = (0 until 17 by 4).flatMap { off =>
      Api.accounts(accounts, "T", limit = 4, offset = off)
        .collect().map(_.getAs[String]("name"))
    }
    var cursor: Option[String] = None
    val byKeyset = Iterator.continually {
      val page = Api.accountsAfter(accounts, "T", after = cursor, limit = 4)
        .collect().map(_.getAs[String]("name"))
      cursor = page.lastOption
      page
    }.takeWhile(_.nonEmpty).flatten.toSeq
    assert(byKeyset == byOffset)
    assert(byKeyset.size == 17 && byKeyset.distinct.size == 17)

    // the currency/format filters compose with the cursor
    val filtered = Api.accountsAfter(
      accounts.withColumn("currency", when(col("name") < "a009", "EUR").otherwise("CZK")),
      "T", currency = Some("EUR"), after = Some("a003"), limit = 100)
      .collect().map(_.getAs[String]("name")).toSeq
    assert(filtered == (4 to 8).map(i => f"a$i%03d"))

    val tenantsDf = (1 to 9).map(i => Tuple1(s"t$i")).toDF("name")
    var tc: Option[String] = None
    val tKeyset = Iterator.continually {
      val page = Api.tenantsAfter(tenantsDf, tc, limit = 2)
        .collect().map(_.getString(0))
      tc = page.lastOption
      page
    }.takeWhile(_.nonEmpty).flatten.toSeq
    assert(tKeyset == (1 to 9).map(i => s"t$i"))
  }

  test("balance MV purge: counting rule drops dead groups, shifts counterparties") {
    // the double-entry consequences of the takedown, pinned as set algebra
    // (the oracle owns cell values): the purged account is gone, at least
    // one counterparty group DIED (count hit zero — the reason the MV
    // stores a COUNT at all), and every surviving account that transacted
    // with the purged one shifted its balance
    val dir = "/root/testdata/sf0.001"
    val before = graft.operators.WarehouseQueries
      .queries("q_balance")(spark, dir).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Double]("balance")).toMap
    val after = graft.operators.WarehouseQueries
      .queries("q_balance_mv_purge")(spark, dir).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Double]("balance")).toMap
    assert(!after.contains("b3"), "purged account survived the MV delete")
    val died = before.keySet - "b3" -- after.keySet
    assert(died.nonEmpty, "fixture must exercise the count-to-zero group drop")
    assert(died.forall(_.startsWith("c")), s"only counterparties may die: $died")
    val shifted = after.keySet.count(n => before(n) != after(n))
    assert(shifted > 0, "counterparty balances must shift when shared legs die")
  }
}
