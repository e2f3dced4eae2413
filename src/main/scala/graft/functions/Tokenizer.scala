package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword segmentation table — the WordPiece /
  * BPE-vocab APPLICATION step (training a vocab is a corpus aggregation;
  * applying one is this row-local kernel). At each position of a word the
  * longest vocab entry matching the remaining prefix is consumed; if none
  * matches, the single character is emitted (every character is implicitly
  * in-vocabulary — the no-<unk> convention, so segmentation is total and
  * deterministic for any input).
  *
  * The vocabulary is compiled ONCE per expression instance into a hash
  * set + max-entry-length bound, so the inner loop probes at most
  * maxLen set lookups per emitted token. Matching is by Java chars ==
  * ASCII bytes for the normalized corpus; the DuckDB oracle's recursive
  * CTE (character-based substring) segments identically on ASCII input.
  */
final class WordPieceTable(vocab: Array[String]) extends Serializable {
  private val set = new java.util.HashSet[String](vocab.length * 2)
  vocab.foreach(v => set.add(v))
  private val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max

  /** Segment every word of `words` greedily, flattening the sub-tokens in
    * word order. Null elements (the input array type may carry
    * containsNull) contribute no tokens — the output stays null-free,
    * matching the declared `containsNull = false`. The no-match fallback
    * consumes a full CODE POINT, so a non-BMP character is emitted as its
    * intact surrogate pair (valid UTF-8), never split. Callable from
    * generated Java (codegen reference obj). */
  def segmentAll(words: ArrayData): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i).toString
        var p = 0
        while (p < w.length) {
          var l = math.min(maxLen, w.length - p)
          var tok: String = null
          while (l > 1 && tok == null) {
            val cand = w.substring(p, p + l)
            if (set.contains(cand)) tok = cand
            l -= 1
          }
          // length-1 vocab hits and the single-char fallback coincide on
          // BMP input; beyond the BMP the fallback takes the whole pair
          if (tok == null) tok = w.substring(p, p + Character.charCount(w.codePointAt(p)))
          out.add(UTF8String.fromString(tok))
          p += tok.length
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

/** Native Catalyst expression applying greedy longest-match subword
  * segmentation to a token array (see [[WordPieceTable]]).
  *
  * Expression > UDF: the per-word scan loop runs as a single kernel call
  * inside whole-stage codegen with the compiled vocab table shared across
  * rows; a Scala UDF would box every array element and break the stage.
  * SQL has no natural spelling for iterated longest-prefix consumption —
  * this is exactly the "built-ins can't express it, drop to a custom
  * Expression" case (the DuckDB oracle needs a recursive CTE for the
  * same semantics).
  */
case class WordPieceTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_toks requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_toks"

  @transient private lazy val table = new WordPieceTable(vocab.toArray)

  override protected def withNewChildInternal(newChild: Expression): WordPieceTokens =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any =
    table.segmentAll(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpTable", table,
      classOf[WordPieceTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segmentAll($c);")
  }
}
