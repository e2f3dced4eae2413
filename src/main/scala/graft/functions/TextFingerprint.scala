package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static winnowing kernel, called from both the interpreted and the
  * generated path of [[WinnowFingerprints]].
  *
  * Plain object (no companion class) so Scala emits static forwarders —
  * the generated Java can call `graft.functions.Winnow.fingerprints(...)`
  * directly.
  */
object Winnow {

  private val md5 = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Distinct winnowing fingerprints (Schleimer et al.) of a string:
    * 60-bit md5-prefix hash of every `gramLen` char-gram, minimum of each
    * `winLen` sliding window, distinct, ascending.
    *
    * The 60-bit hash is the first 15 hex chars of the md5 digest — exactly
    * `conv(substring(md5(g),1,15),16,10)` (Spark) and
    * `CAST('0x'||substring(md5(g),1,15) AS UBIGINT)` (DuckDB), so results
    * stay oracle-comparable bit-for-bit.
    */
  def fingerprints(s: UTF8String, gramLen: Int, winLen: Int): ArrayData = {
    val bytes = s.getBytes
    val nChars = s.numChars()
    val nGrams = nChars - gramLen + 1
    if (nGrams < winLen) return new GenericArrayData(Array.empty[Long])

    // one pass over the UTF-8 bytes records each char's byte offset, so a
    // gram's bytes are a slice — no per-gram substring re-scan
    val offs = new Array[Int](nChars + 1)
    var i = 0
    var c = 0
    while (i < bytes.length) {
      offs(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(c) = bytes.length

    val digest = md5.get()
    val hs = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      digest.reset()
      digest.update(bytes, offs(g), offs(g + gramLen) - offs(g))
      val d = digest.digest()
      // big-endian first 8 digest bytes >>> 4 == first 15 hex chars as uint
      hs(g) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      g += 1
    }

    val set = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    val nWin = nGrams - winLen + 1
    while (j < nWin) {
      var m = hs(j)
      var k = j + 1
      while (k < j + winLen) {
        if (hs(k) < m) m = hs(k)
        k += 1
      }
      set.add(m)
      j += 1
    }

    val out = new Array[Long](set.size())
    val it = set.iterator()
    var idx = 0
    while (it.hasNext) {
      out(idx) = it.next()
      idx += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Static word-shingling kernel — see [[WordShingles]]. Plain object for
  * static forwarders callable from generated Java.
  */
object Shingler {

  /** Word n-gram shingles of a whitespace-NORMALIZED string (single spaces
    * guaranteed by the caller's normalization — multi-space inputs would
    * shift token boundaries). Because separators are single spaces, an
    * n-word shingle is a CONTIGUOUS slice of the input: the kernel scans
    * the UTF-8 bytes once for space positions (0x20 never occurs inside a
    * multi-byte sequence, so byte scanning is UTF-8-safe) and emits
    * zero-copy slices — no split, no per-shingle concat. `unique` keeps
    * first occurrences only, matching `array_distinct` order semantics.
    * Fewer than n tokens → empty array.
    */
  def shingles(s: UTF8String, n: Int, unique: Boolean): ArrayData = {
    val bytes = s.getBytes
    // token start offsets; token i spans [starts(i), starts(i+1) - 2].
    // An empty input is ONE empty token, matching split('', ' ') = ['']
    var nToks = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) nToks += 1
      i += 1
    }
    if (nToks < n) return new GenericArrayData(Array.empty[AnyRef])
    val starts = new Array[Int](nToks + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nToks) = bytes.length + 1

    val nSh = nToks - n + 1
    if (unique) {
      val seen = new java.util.LinkedHashSet[UTF8String](nSh * 2)
      var j = 0
      while (j < nSh) {
        val from = starts(j)
        val until = starts(j + n) - 1
        seen.add(UTF8String.fromBytes(bytes, from, until - from)): Unit
        j += 1
      }
      val out = new Array[AnyRef](seen.size())
      val it = seen.iterator()
      var idx = 0
      while (it.hasNext) { out(idx) = it.next(); idx += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[AnyRef](nSh)
      var j = 0
      while (j < nSh) {
        val from = starts(j)
        val until = starts(j + n) - 1
        out(j) = UTF8String.fromBytes(bytes, from, until - from)
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Static MinHash-signature kernel — see [[MinHashSig]]. Plain object for
  * static forwarders callable from generated Java.
  */
object MinHasher {

  val NumHashes = 128
  private val MersennePrime = 2147483647L // 2^31 - 1

  /** Carter-Wegman affine coefficients, IDENTICAL generation (seed 42) to
    * the explode+groupBy pipeline this kernel replaces: the shingle string
    * is hashed ONCE (xxhash64 seed 42, reduced to 32 bits), each family
    * member is `(a*h + b) mod p`. `a < 2^30` keeps `a*h < 2^62` inside
    * Long range. Fixed seed ⇒ signatures bit-identical to every earlier
    * round's.
    */
  val coefs: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumHashes)(
      (rnd.nextInt(1 << 29).toLong * 2 + 1, rnd.nextInt(1 << 30).toLong))
  }
  private val as = coefs.map(_._1)
  private val bs = coefs.map(_._2)

  /** All 128 signature components of one document's shingle set in one
    * row-local pass: hash each shingle once, fold the 128 affine mins.
    * O(|shingles| × 128) register-resident multiply-adds — no explode, no
    * shuffle, no 128-column aggregate. An empty array yields all-MaxValue
    * sentinels; callers must filter empty shingle sets BEFORE banding
    * (the exploded formulation dropped those docs implicitly).
    */
  def sig(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Long](NumHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(s, StringType, 42L) & 0xffffffffL
      var k = 0
      while (k < NumHashes) {
        val v = (h * as(k) + bs(k)) % MersennePrime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** Native Catalyst expression computing the full 128-component MinHash
  * signature of a shingle array ROW-LOCALLY.
  *
  * The compositional formulation (explode every shingle to a row, hash,
  * `groupBy(doc).agg(min₀…min₁₂₇)`) shuffles the ENTIRE exploded shingle
  * corpus just to bring each document's shingles together — but each
  * document's shingles start on one row; the aggregation is row-local by
  * construction. At 100 TB that explode+shuffle (tens of shingles × every
  * document) is the dominant cost of the MinHash pipeline; this expression
  * deletes it outright — signatures become a pure map stage and the only
  * remaining shuffle is the narrow (doc_id, band, sig) LSH bucket join.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any =
    MinHasher.sig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHasher.sig($c);")
}

/** Native Catalyst expression for word n-gram shingling — the front end of
  * every set-similarity operator here (MinHash, exact Jaccard, near-dup
  * clustering, contamination, repetition). The compositional form
  * (`transform(sequence(0, size(t)-n), i -> concat_ws(' ', t[i], ...))` +
  * `array_distinct`) runs as interpreted higher-order lambdas that
  * filter-pushdown happily clones; this expression is ONE codegen-resident
  * kernel call doing a single byte scan with zero-copy slices. Semantics
  * are identical (incl. array_distinct's first-occurrence order), pinned
  * by LlmOpsSpec parity tests.
  */
case class WordShingles(child: Expression, n: Int, unique: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"word_shingles n must be >= 1, got $n")
    } else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def nullSafeEval(s: Any): Any =
    Shingler.shingles(s.asInstanceOf[UTF8String], n, unique)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingler.shingles($c, $n, $unique);")
}

/** Native Catalyst expression computing a document's winnowing fingerprint
  * set in one codegen'd kernel call.
  *
  * The compositional formulation (posexplode every char-gram to a row,
  * md5 per row, 4-row min window over `partitionBy(doc) orderBy(pos)`,
  * distinct, re-aggregate) round-trips the whole corpus through an
  * exchange+sort that exists only because the window operator demands
  * co-located rows — but every gram derives from ONE input row, so the
  * computation is row-local by construction. This expression keeps it
  * row-local: no explode, no shuffle, no window. Ref semantics: winnowing
  * fingerprints as the document-fingerprint operator family (reference has
  * no native analog; SURVEY.md §2 X7).
  */
case class WinnowFingerprints(child: Expression, gramLen: Int, winLen: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (gramLen >= 1 && winLen >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"winnow_fps gram/window lengths must be >= 1, got ($gramLen, $winLen)")
    } else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def nullSafeEval(s: Any): Any =
    Winnow.fingerprints(s.asInstanceOf[UTF8String], gramLen, winLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Winnow.fingerprints($c, $gramLen, $winLen);")
}
