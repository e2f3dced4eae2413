package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}
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

/** Static SimHash-signature kernel — see [[SimHashSig]]. Plain object for
  * static forwarders callable from generated Java.
  */
object SimHasher {

  private val md5 = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** 60-bit SimHash of a token array in ONE pass: per token the 60-bit
    * md5-prefix hash (the engine-portable family — identical to Spark's
    * `conv(substring(md5(t),1,15),16,10)` and DuckDB's
    * `CAST('0x'||substring(md5(t),1,15) AS UBIGINT)`), then the per-bit
    * majority across the set. Callers pass the DISTINCT token set (the
    * dedup is part of the operator's definition, left outside the kernel
    * where `array_distinct` is already a native expression). Majority is
    * strict (2·ones > n), matching the compositional form bit-for-bit;
    * an empty array yields signature 0.
    */
  def sig(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](60)
    val digestBuf = md5.get()
    var i = 0
    while (i < n) {
      digestBuf.reset()
      val d = digestBuf.digest(toks.getUTF8String(i).getBytes)
      // big-endian first 8 digest bytes >>> 4 == first 15 hex chars as uint
      val h = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      var b = 0
      while (b < 60) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (2 * counts(b) > n) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** Native Catalyst expression for the 60-bit SimHash signature of a token
  * set. The compositional form ran 60 interpreted lambda passes per
  * document (`transform(sequence(0,59), b -> filter(hs, ...))` — each bit
  * materializing a filtered array just to count it) plus a per-token
  * md5→hex→conv string round-trip; this kernel hashes each token once
  * (binary md5, no hex detour) and accumulates all 60 bit-counters in the
  * same pass, inside whole-stage codegen. Signature bits are identical
  * (parity-pinned in LlmOpsSpec); only the evaluation strategy changes.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any =
    SimHasher.sig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHasher.sig($c);")
}

/** Precompiled multi-needle overlapping-trigram counter — the lookup side
  * of [[TrigramCounts]]. Built once per expression instance from the
  * literal needle list (each needle EXACTLY 3 code points); `count` scans
  * a document in one code-point pass with a rolling 63-bit packed key
  * (3 × 21-bit code points) probed against an open-addressed table.
  * Duplicate needles (the same gram in two language profiles) share a
  * slot and report the same count.
  */
final class TrigramCountTable(needles: Array[String]) extends Serializable {
  require(needles.nonEmpty, "trigram_counts needs at least one needle")
  require(needles.forall(n => n.codePointCount(0, n.length) == 3),
    "every trigram_counts needle must be exactly 3 code points")

  private val Mask63 = (1L << 63) - 1

  private def packKey(n: String): Long = {
    var key = 0L
    var i = 0
    while (i < n.length) {
      val cp = n.codePointAt(i)
      key = ((key << 21) | cp.toLong) & Mask63
      i += Character.charCount(cp)
    }
    key
  }

  // distinct keys -> dense slot ids; per-needle slot for output expansion
  private val needleSlots = new Array[Int](needles.length)
  private val (tableKeys, tableSlots, nSlots) = {
    val keyToSlot = new java.util.HashMap[java.lang.Long, Integer]()
    var next = 0
    var i = 0
    while (i < needles.length) {
      val k = packKey(needles(i))
      val existing = keyToSlot.get(k)
      val slot = if (existing != null) existing.intValue()
      else { val s = next; keyToSlot.put(k, s); next += 1; s }
      needleSlots(i) = slot
      i += 1
    }
    var cap = 8
    while (cap < next * 4) cap <<= 1
    val ks = Array.fill(cap)(-1L)
    val ss = new Array[Int](cap)
    keyToSlot.forEach { (k, s) =>
      var idx = (scramble(k) & (cap - 1)).toInt
      while (ks(idx) != -1L) idx = (idx + 1) & (cap - 1)
      ks(idx) = k
      ss(idx) = s
    }
    (ks, ss, next)
  }
  private val capMask = tableKeys.length - 1

  private def scramble(k: Long): Long = {
    val h = k * 0x9E3779B97F4A7C15L
    h ^ (h >>> 32)
  }

  /** Per-needle overlapping occurrence counts over the text's code-point
    * trigram stream (identical to counting positions i with
    * `substring(text, i, 3) = needle` — Spark and DuckDB substring are
    * both code-point based). Texts under 3 code points yield all zeros.
    */
  def count(s: UTF8String): ArrayData = {
    val counts = new Array[Long](nSlots)
    val str = s.toString
    val len = str.length
    if (str.codePointCount(0, len) >= 3) {
      var key = 0L
      var seen = 0
      var i = 0
      while (i < len) {
        val cp = str.codePointAt(i)
        key = ((key << 21) | cp.toLong) & Mask63
        seen += 1
        if (seen >= 3) {
          var idx = (scramble(key) & capMask).toInt
          while (tableKeys(idx) != -1L && tableKeys(idx) != key)
            idx = (idx + 1) & capMask
          if (tableKeys(idx) == key) counts(tableSlots(idx)) += 1
        }
        i += Character.charCount(cp)
      }
    }
    val out = new Array[Long](needleSlots.length)
    var n = 0
    while (n < needleSlots.length) {
      out(n) = counts(needleSlots(n))
      n += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native Catalyst expression counting OVERLAPPING occurrences of a fixed
  * list of 3-code-point needles in one scan of the text — the profile-hit
  * front end of n-gram language ID. The compositional form materialized
  * every trigram of every document (`transform(sequence(...), substring)`
  * + explode), shuffled the whole gram stream into a broadcast join +
  * per-doc hash aggregate, and re-joined zero-hit docs; this expression
  * makes profile scoring a PURE MAP — one rolling-key pass per document,
  * no explode, no shuffle — and scales in profile size O(1) per position
  * (hash probe), where the explode+join form paid per-gram row traffic.
  * Needle counts come back positionally aligned with the literal array.
  */
case class TrigramCounts(child: Expression, needles: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"trigram_counts requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_counts"

  @transient private lazy val table = new TrigramCountTable(needles.toArray)

  override protected def withNewChildInternal(newChild: Expression): TrigramCounts =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any =
    table.count(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tgTable", table,
      classOf[TrigramCountTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }
}

/** Query side of the Count-Min sketch: estimate an item's frequency from
  * the serialized sketch produced by Spark's `count_min_sketch` aggregate.
  * Spark ships the BUILD side (the aggregate) but no SQL surface to READ
  * the sketch back — without this, the bounded-memory frequency path dead-
  * ends at a binary blob.
  *
  * Deliberately `CodegenFallback`: the expression evaluates once per
  * PROBE row (a handful of heavy-hitter candidates against one sketch
  * scalar), never per corpus row — the build side is where the data
  * volume lives, and that is Spark's own codegen'd aggregate. The
  * deserialized sketch is cached per-instance keyed on the blob reference,
  * so repeated probes against the same sketch pay one parse.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires (binary sketch, string item), got $other")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)

  // single-entry cache: all rows of a probe frame carry the SAME sketch
  // scalar, so reference equality hits after the first row
  @transient private var cachedBlob: Array[Byte] = _
  @transient private var cachedSketch: org.apache.spark.util.sketch.CountMinSketch = _

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val blob = sketchBytes.asInstanceOf[Array[Byte]]
    if (cachedSketch == null || (cachedBlob ne blob)) {
      cachedSketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(blob)
      cachedBlob = blob
    }
    cachedSketch.estimateCount(item.asInstanceOf[UTF8String].toString)
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
