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
}
