package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's GraphQL query surface re-expressed as pure DataFrame
  * builders (GraphQLService.scala:207-292 root fields; Slick queries in
  * GraphQLPersistence.scala).
  *
  * Each root field is a function `(tables, args) => DataFrame`; nested
  * fields (tenant, credit/debit account, balance) are joins computed inside
  * the same Catalyst plan instead of the reference's deferred Fetcher waves
  * (GraphQLService.scala:118-151) — the N+1 batching problem disappears.
  *
  * Filter semantics: the reference INVERTS its range comparators (its
  * `amount_gte` runs `<=`, etc. — GraphQLPersistence.scala:277-316, bug Q1,
  * and `currency >=` for accounts, Q2). We implement the documented
  * meaning; `bugCompat = true` replicates the reference bit-for-bit.
  */
object Api {

  /** Optional (null-skipped) filter: apply `f` only when the arg is present.
    * Ref pattern: `opt.isEmpty || row.col op opt` (GraphQLPersistence.scala:197-204).
    */
  private def optFilter[T](df: DataFrame, opt: Option[T])(f: T => Column): DataFrame =
    opt.map(v => df.filter(f(v))).getOrElse(df)

  /** Deterministic keyset pagination: total order on `keys`, then
    * offset/limit (Dataset.offset — Spark ≥ 3.4 native Offset operator).
    * Ref: `sortBy(..).drop(offset).take(limit)` (GraphQLPersistence.scala:149-165).
    */
  private def paginate(df: DataFrame, keys: Seq[String], limit: Long, offset: Long): DataFrame =
    df.orderBy(keys.map(col): _*).offset(offset.toInt).limit(limit.toInt)

  /** `tenants(limit, offset)` — GraphQLPersistence.scala:149-165. */
  def tenants(tenant: DataFrame, limit: Long, offset: Long): DataFrame =
    paginate(tenant.select(col("name")), Seq("name"), limit, offset)

  /** Keyset continuation of `tenants`: the page strictly after cursor
    * `name`. Same O(page) rationale as [[transfersAfter]] — the cursor
    * predicate pushes into the scan; a deep offset page scans everything
    * before it.
    */
  def tenantsAfter(tenant: DataFrame, after: Option[String], limit: Long): DataFrame = {
    val base = tenant.select(col("name"))
    val continued = after.map(n => base.filter(col("name") > lit(n))).getOrElse(base)
    continued.orderBy(col("name")).limit(limit.toInt)
  }

  /** `tenant(name)` point lookup — GraphQLPersistence.scala:167-182. */
  def tenant(tenantDf: DataFrame, name: String): DataFrame =
    tenantDf.filter(col("name") === lit(name)).limit(1)

  /** `accounts(tenant, currency?, format?, limit, offset)` —
    * GraphQLPersistence.scala:184-224.
    */
  def accounts(account: DataFrame, tenant: String,
               currency: Option[String] = None, format: Option[String] = None,
               limit: Long = 100, offset: Long = 0,
               bugCompat: Boolean = false): DataFrame =
    paginate(accountsFiltered(account, tenant, currency, format, bugCompat),
      Seq("name"), limit, offset)

  private def accountsFiltered(account: DataFrame, tenant: String,
                               currency: Option[String], format: Option[String],
                               bugCompat: Boolean): DataFrame = {
    var df = account.filter(col("tenant") === lit(tenant))
    df = optFilter(df, format)(v => col("format") === lit(v))
    df = optFilter(df, currency) { v =>
      if (bugCompat) col("currency") >= lit(v) else col("currency") === lit(v) // Q2
    }
    df.select("tenant", "name", "currency", "format")
  }

  /** Keyset continuation of `accounts`: the page strictly after cursor
    * `name` (unique per tenant). Same O(page) rationale as
    * [[transfersAfter]].
    */
  def accountsAfter(account: DataFrame, tenant: String,
                    currency: Option[String] = None, format: Option[String] = None,
                    after: Option[String] = None, limit: Long = 100,
                    bugCompat: Boolean = false): DataFrame = {
    val filtered = accountsFiltered(account, tenant, currency, format, bugCompat)
    val continued = after.map(n => filtered.filter(col("name") > lit(n))).getOrElse(filtered)
    continued.orderBy(col("name")).limit(limit.toInt)
  }

  /** `account(tenant, name)` point lookup — GraphQLPersistence.scala:226-242. */
  def account(accountDf: DataFrame, tenant: String, name: String): DataFrame =
    accountDf.filter(col("tenant") === lit(tenant) && col("name") === lit(name)).limit(1)

  /** Range/equality argument set of `transfers(...)` — GraphQLService.scala:91-106. */
  final case class TransferArgs(
      currency: Option[String] = None,
      status: Option[Int] = None,
      amountLt: Option[BigDecimal] = None,
      amountLte: Option[BigDecimal] = None,
      amountGt: Option[BigDecimal] = None,
      amountGte: Option[BigDecimal] = None,
      valueDateLt: Option[Timestamp] = None,
      valueDateLte: Option[Timestamp] = None,
      valueDateGt: Option[Timestamp] = None,
      valueDateGte: Option[Timestamp] = None)

  /** `transfers(tenant, filters…, limit, offset)` —
    * GraphQLPersistence.scala:244-368. Documented comparator semantics by
    * default; `bugCompat` reproduces the reference's inverted operators (Q1).
    */
  def transfers(transfer: DataFrame, tenant: String, args: TransferArgs = TransferArgs(),
                limit: Long = 100, offset: Long = 0,
                bugCompat: Boolean = false): DataFrame =
    paginate(transfersFiltered(transfer, tenant, args, bugCompat),
      Seq("transaction", "transfer"), limit, offset)

  private def transfersFiltered(transfer: DataFrame, tenant: String,
                                args: TransferArgs, bugCompat: Boolean): DataFrame = {
    var df = transfer.filter(col("tenant") === lit(tenant))
    df = optFilter(df, args.currency)(v => col("currency") === lit(v))
    df = optFilter(df, args.status)(v => col("status") === lit(v))

    // Reference bug Q1 (GraphQLPersistence.scala:277-316): the inversion is
    // PER COLUMN, not uniform. amount: gte→`<=`, gt→`<` (strict), lte→`>=`,
    // lt→`>` (strict). value_date: gte→`<=`, gt→`<=`, lte→`>=`, lt→`>=`
    // (gt/lt degrade to the non-strict comparator, :302-306 and :313-316).
    def rng(c: String, strictInverse: Boolean,
            lt: Option[Any], lte: Option[Any], gt: Option[Any], gte: Option[Any]): Unit = {
      df = optFilter(df, gte)(v => if (bugCompat) col(c) <= lit(v) else col(c) >= lit(v))
      df = optFilter(df, gt)(v =>
        if (bugCompat) { if (strictInverse) col(c) < lit(v) else col(c) <= lit(v) }
        else col(c) > lit(v))
      df = optFilter(df, lte)(v => if (bugCompat) col(c) >= lit(v) else col(c) <= lit(v))
      df = optFilter(df, lt)(v =>
        if (bugCompat) { if (strictInverse) col(c) > lit(v) else col(c) >= lit(v) }
        else col(c) < lit(v))
    }
    rng("amount", strictInverse = true,
      args.amountLt, args.amountLte, args.amountGt, args.amountGte)
    rng("value_date", strictInverse = false,
      args.valueDateLt, args.valueDateLte, args.valueDateGt, args.valueDateGte)
    df
  }

  /** Keyset (cursor) continuation of `transfers`: the page strictly after
    * cursor `(transaction, transfer)` in the total order. Offset pagination
    * (the reference's drop/take, GraphQLPersistence.scala:327-329) costs
    * O(offset) per page — at 100 TB a deep page scans everything before it;
    * the keyset predicate pushes into the scan and every page costs O(page).
    */
  def transfersAfter(transfer: DataFrame, tenant: String,
                     args: TransferArgs = TransferArgs(),
                     after: Option[(String, String)] = None,
                     limit: Long = 100,
                     bugCompat: Boolean = false): DataFrame = {
    val filtered = transfersFiltered(transfer, tenant, args, bugCompat)
    val continued = after match {
      case Some((tx, tr)) =>
        filtered.filter(col("transaction") > lit(tx) ||
          (col("transaction") === lit(tx) && col("transfer") > lit(tr)))
      case None => filtered
    }
    continued.orderBy(col("transaction"), col("transfer")).limit(limit.toInt)
  }

  /** Status code ↔ GraphQL enum word, applied at the API edge only
    * (GraphQLService.scala:38-59).
    */
  def statusWord(c: Column): Column =
    when(c === 1, "committed").when(c === 2, "rollbacked").otherwise("promised")

  /** Nested-field resolution for a transfers page: tenant + credit/debit
    * accounts (with balances) joined in-plan — the Spark analog of the
    * reference's batched Fetchers (J1/J2).
    *
    * No broadcast hint: the account dimension grows with the data (every
    * account ever seen), so a forced broadcast OOMs at scale. Spark's
    * size-based broadcast threshold + AQE pick broadcast when the dim is
    * actually small and a shuffled hash join on (tenant, name) otherwise.
    */
  def transfersResolved(transferPage: DataFrame, account: DataFrame,
                        balances: DataFrame): DataFrame = {
    val acct = account
      .join(balances, Seq("tenant", "name"), "left")
      .withColumn("balance", coalesce(col("balance"), lit(0).cast("decimal(38,18)")))
      .select(col("tenant"), col("name"), col("currency"), col("format"), col("balance"))
    val credit = acct.toDF(acct.columns.map("credit_" + _): _*)
    val debit  = acct.toDF(acct.columns.map("debit_" + _): _*)
    transferPage
      .join(credit, Seq("credit_tenant", "credit_name"), "left")
      .join(debit, Seq("debit_tenant", "debit_name"), "left")
      .withColumn("status_word", statusWord(col("status")))
  }
}
