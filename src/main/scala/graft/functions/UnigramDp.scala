package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The unigram-LM integer Viterbi DP (Unigram.dpFrames) as one native
  * kernel call per word — forward min-plus fold, backward fold, and the
  * all-optimal-paths piece marking in a single pass over code points.
  *
  * The higher-order-function spelling (two nested
  * `aggregate(slice(sequence(...)))` folds whose step is a `transform`
  * rebuilding the whole DP array per slot, against a broadcast map
  * probed with `element_at`) is NOT codegen'd: Spark evaluates HOF
  * lambdas interpretively, the per-step `transform` allocates a fresh
  * 13-slot array per character, and `element_at` on an
  * ArrayBasedMapData is a LINEAR scan of the ~200-entry vocabulary —
  * ~10⁸ UTF8String comparisons per corpus pass, plus the allocation
  * churn that made the gate's bench reps swing 2.7–15.6 s (r21
  * baseline). This kernel compiles the vocabulary ONCE per expression
  * instance into a hash map and runs the whole per-word DP as primitive
  * long-array loops — identical integer arithmetic, so results are
  * bit-for-bit the HOF form's (min and + on BIGINTs; pinned by the
  * AlgebraProps naive-DP property and the unchanged DuckDB oracle).
  *
  * Semantics replicated exactly (Inf = 10^15, piece length 1..4):
  *   dpf[0] = 0, dpf[i] = min over l of dpf[i−l] + cost(wt[i−l..i));
  *   dpb[n] = 0, dpb[i] = min over l of dpb[i+l] + cost(wt[i..i+l));
  *   total = dpf[n];
  *   pieces = every in-vocabulary candidate slot (j, l) with
  *     dpf[j] + cost + dpb[j+l] = total, one element PER SLOT (the
  *     usage fold sums occurrence weight per qualifying slot).
  * Indexing is by CODE POINT, matching Spark's `substring`/`length`
  * semantics on any input (ASCII and beyond).
  */
final class UnigramDpTable(pieces: Array[String], costs: Array[Long])
    extends Serializable {
  require(pieces.length == costs.length,
    s"unigram_dp vocab arrays differ: ${pieces.length} pieces, " +
      s"${costs.length} costs")
  private val map = new java.util.HashMap[String, java.lang.Long](
    pieces.length * 2)
  locally {
    var i = 0
    while (i < pieces.length) { map.put(pieces(i), costs(i)); i += 1 }
  }
  private val Inf = 1000000000000000L
  private val MaxPiece = 4

  /** Callable from generated Java (codegen reference obj). */
  def dp(wt: UTF8String): InternalRow = {
    val cp = wt.toString.codePoints().toArray
    val n = cp.length
    val dpf = new Array[Long](n + 1)
    val dpb = new Array[Long](n + 1)
    java.util.Arrays.fill(dpf, Inf)
    java.util.Arrays.fill(dpb, Inf)
    dpf(0) = 0L
    dpb(n) = 0L
    // candidate substrings by code point: sub(j, l) = wt[j .. j+l)
    def sub(j: Int, l: Int): String = new String(cp, j, l)
    var i = 1
    while (i <= n) {
      var best = Inf
      var l = 1
      val lmax = math.min(MaxPiece, i)
      while (l <= lmax) {
        val c = map.get(sub(i - l, l))
        val v = dpf(i - l) + (if (c == null) Inf else c.longValue())
        if (v < best) best = v
        l += 1
      }
      dpf(i) = best
      i += 1
    }
    i = n - 1
    while (i >= 0) {
      var best = Inf
      var l = 1
      val lmax = math.min(MaxPiece, n - i)
      while (l <= lmax) {
        val c = map.get(sub(i, l))
        val v = dpb(i + l) + (if (c == null) Inf else c.longValue())
        if (v < best) best = v
        l += 1
      }
      dpb(i) = best
      i -= 1
    }
    val total = dpf(n)
    val out = new java.util.ArrayList[AnyRef]()
    var j = 0
    while (j < n) {
      var l = 1
      val lmax = math.min(MaxPiece, n - j)
      while (l <= lmax) {
        val piece = sub(j, l)
        val c = map.get(piece)
        if (c != null && dpf(j) + c.longValue() + dpb(j + l) == total)
          out.add(UTF8String.fromString(piece))
        l += 1
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](total, dpb(0),
      new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))))
  }
}

/** Native Catalyst expression running the whole per-word unigram DP (see
  * [[UnigramDpTable]]): struct(total, b0, pieces) where `total` is the
  * optimal segmentation cost, `b0` the backward fold's origin value
  * (= total by the min-plus identity — kept as the AlgebraProps witness),
  * and `pieces` the vocabulary pieces on ANY optimal path, one element
  * per qualifying (position, length) slot.
  *
  * Expression > UDF: one kernel call per word inside whole-stage codegen
  * with the compiled vocab map shared across rows; a Scala UDF would box
  * the struct and break the stage. The vocabulary rides the expression
  * as literals (the wordpiece_toks discipline — a tokenizer vocabulary
  * is driver-held model grain, bounded by |alphabet| + the multi-char
  * seed cap).
  */
case class UnigramDp(child: Expression, pieces: Seq[String],
                     costs: Seq[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_dp requires a string word, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("b0", LongType, nullable = false),
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "unigram_dp"

  @transient private lazy val table =
    new UnigramDpTable(pieces.toArray, costs.toArray)

  override protected def withNewChildInternal(newChild: Expression): UnigramDp =
    copy(child = newChild)

  override def nullSafeEval(w: Any): Any =
    table.dp(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugTable", table,
      classOf[UnigramDpTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.dp($c);")
  }
}
