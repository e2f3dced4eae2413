package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, Expression, If, IsNull, Literal, Pmod}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-free modular membership sum, `(Σ child) mod m`, as a native
  * declarative aggregate — the overflow-proof hashsum the class-membership
  * gates fingerprint sets with (X110/X111 and the lifecycle witnesses).
  *
  * Why an aggregate Expression and not a spelling of `sum`:
  *   - `sum(pmod(h, m))` bounds the ADDENDS: a BIGINT buffer overflows at
  *     ~2^23 rows per group with m = 2^40 — the 'unchanged' diff class is
  *     ~the whole lake, far past that at 100 TB;
  *   - `pmod(sum(cast(h as decimal(38,0))), m)` is exact past 1e19 rows
  *     but prices every update through Java Decimal — the r18 cross-commit
  *     A/B measured q_rfm_segments 1.83× and q_cdc_apply 1.49× slower on
  *     exactly this spelling;
  *   - this aggregate keeps the BUFFER reduced: update is
  *     `(acc + (h mod m)) mod m` (both operands < 2^41 before the reduce,
  *     since m ≤ 2^40), merge is the same on two partials — BIGINT
  *     arithmetic end to end, exact at ANY group size, and the update
  *     expressions are plain Pmod/Add so HashAggregate codegen fuses them
  *     into the stage (a UDAF would box; an imperative buffer would not
  *     codegen).
  *
  * (Σh) mod m == (Σ(h mod m)) mod m == ((a mod m)+(b mod m)) mod m folded
  * in any order — so on every NON-EMPTY group the value is identical to
  * both rejected spellings and to the DuckDB oracle's
  * `CAST(SUM(CAST(h AS HUGEINT)) % m AS BIGINT)`; no oracle changes when
  * swapping spellings. Null children are skipped (SUM semantics). ONE
  * deliberate divergence: an all-null or EMPTY group evaluates to 0
  * (nullable=false), where SUM — and therefore the pmod(sum(...)) and
  * hashSumSql spellings — returns NULL. Unobservable at every current
  * call site (each aggregates groups that exist because a row produced
  * them), but a GLOBAL aggregate over a possibly-empty frame must wrap
  * the oracle side in coalesce(..., 0) or not use mod_sum.
  *
  * Reference analog: none — §2j UDF/UDAF extension surface.
  */
case class ModSum(child: Expression, modulus: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child, modulus)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "mod_sum"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType || modulus.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"mod_sum expects (BIGINT, BIGINT), got " +
          s"(${child.dataType.sql}, ${modulus.dataType.sql})")
    else if (!modulus.foldable || modulus.eval() == null ||
      modulus.eval().asInstanceOf[Long] <= 0)
      TypeCheckResult.TypeCheckFailure(
        "mod_sum modulus must be a positive BIGINT literal")
    else if (modulus.eval().asInstanceOf[Long] > (1L << 40))
      // (acc + pmod(h, m)) must stay under 2^63: with m ≤ 2^40 the sum
      // is < 2^41 — headroom of 2^22×. Larger moduli would need a wider
      // buffer, which is exactly what this aggregate exists to avoid.
      TypeCheckResult.TypeCheckFailure(
        "mod_sum modulus must be ≤ 2^40 (the BIGINT-safe bound)")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val acc =
    AttributeReference("mod_sum_acc", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(acc)

  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), acc, Pmod(Add(acc, Pmod(child, modulus)), modulus)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Pmod(Add(acc.left, acc.right), modulus))

  override lazy val evaluateExpression: Expression = acc

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ModSum =
    copy(child = newChildren(0), modulus = newChildren(1))
}

object ModSum {
  private[functions] val builder: Seq[Expression] => Expression = {
    case Seq(c, m) => ModSum(c, m)
    case exprs => throw new IllegalArgumentException(
      s"mod_sum expects (value, modulus), got ${exprs.length} args")
  }
}
