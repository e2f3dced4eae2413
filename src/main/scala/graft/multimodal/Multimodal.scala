package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: images/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * resize / frame-sample operators a training-data pipeline runs on them.
  *
  * Two modalities decode for REAL — WAV/PCM audio (`decodeWav` /
  * `wavFeatures`; RIFF needs no codec) and raster images
  * (`imageFeatures`): PPM/BMP (codec-free), PNG (zlib is in the JDK),
  * and JPEG (the JDK SHIPS a JPEG codec — `javax.imageio`; decode is
  * bit-deterministic within a JVM, but JPEG being lossy means features
  * carry tolerance-band tests, never bit-exact cross-encoder pins).
  * Only H.264 remains STUBBED (`decodeFeatures` — genuinely no JDK
  * video codec). Everything around the stub — the media
  * schema, the columnar metadata ops, the per-partition batch shape of the
  * decoder, the fixed-dim float feature output — is real, tested Spark
  * plumbing that a codec-backed implementation would drop into.
  *
  * Scale: metadata ops (resize math, frame sampling) are pure columnar
  * expressions on the scan; the decoder is a `mapPartitions` whose unit of
  * work is one partition of binary blobs — the layout knob at 100 TB is
  * simply partition sizing (`maxPartitionBytes` against blob size), and the
  * feature output is a narrow (id, vector) table that feeds the similarity
  * operators (graft.operators.Similarity).
  */
object Multimodal {

  /** Synthesized media table over the documents testdata: text bytes stand
    * in for encoded frames; metadata is derived deterministically. Columns:
    * media_id, bytes BINARY, mime STRING, width, height, duration_ms.
    */
  def media(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("bytes"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      (lit(320) + (col("doc_id") % 4) * 160).cast("int").as("width"),
      (lit(200) + (col("doc_id") % 5) * 120).cast("int").as("height"),
      (col("n_chars") * 40).cast("int").as("duration_ms"))

  /** Aspect-preserving resize of the metadata (integer floor arithmetic —
    * exact on any engine). The byte payload is untouched: a real pipeline
    * resizes at decode time; the plan-level contract is the (w, h) math.
    */
  def resized(media: DataFrame, maxWidth: Int): DataFrame =
    media
      .withColumn("out_w", least(col("width"), lit(maxWidth)))
      // floor(h·w'/w) clamped to ≥1: an extreme-aspect banner (1000×3 at
      // maxWidth 100) would otherwise target zero rows — a degenerate
      // raster the pixel kernel rightly refuses
      .withColumn("out_h",
        greatest(expr("CAST(height * out_w AS BIGINT) div width").cast("int"),
          lit(1)))

  /** One row per sampled frame timestamp (every `everyMs` through the
    * duration, inclusive) — the frame-extraction fan-out as a columnar
    * explode; the decoder then maps each (media_id, frame_ts) batch.
    */
  def frameSample(media: DataFrame, everyMs: Int): DataFrame =
    media.select(col("media_id"), col("mime"),
      posexplode(sequence(lit(0), col("duration_ms"), lit(everyMs)))
        .as(Seq("frame_idx", "frame_ts")))

  /** STUB decoder for the one genuinely codec-bound modality left (H.264
    * video — the JDK ships no video codec): the "decode" is a
    * deterministic byte histogram folded into a fixed-dim float feature.
    * The REAL parts — binary input column, per-partition batch iteration,
    * fixed-dim `array<float>` output feeding the ANN operators — are what
    * a codec implementation would inherit unchanged (as the WAV, PPM/BMP,
    * PNG, and JPEG paths below demonstrate).
    */
  def decodeFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val f = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) {
            f(i % dim) += (bytes(i) & 0xff) / 255f
            i += 1
          }
          (id, f)
        }
      }
      .toDF("media_id", "feature")
  }

  // ---- real audio decode (WAV/PCM) -------------------------------------
  //
  // Unlike image/video, RIFF/WAVE PCM needs no native codec — the decode
  // below is REAL: chunk walk, fmt parse, 8/16/24/32-bit int + 32-bit
  // float samples, multi-channel mix-down. It drops into the exact
  // mapPartitions batch shape the stub documents, proving the plumbing.

  /** Decoded audio: mono samples in [-1, 1]. */
  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Float])

  /** RIFF/WAVE PCM decoder (pure JVM). Supports PCM (format 1) at
    * 8/16/24/32 bits and IEEE float (format 3) at 32 bits; multi-channel
    * input is averaged to mono. Truncated data chunks decode the bytes
    * present (streaming-friendly).
    */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, "too short for a RIFF header")
    require(bb.getInt(0) == 0x46464952, "not a RIFF container") // "RIFF"
    require(bb.getInt(8) == 0x45564157, "not a WAVE file") // "WAVE"
    // the walk uses Long arithmetic and rejects negative sizes: a corrupt
    // chunk header must fail the require contract, not loop forever or
    // overflow into an IndexOutOfBounds inside a Spark task
    var pos = 12L
    var format = 0; var channels = 0; var rate = 0; var bits = 0
    var fmtSeen = false
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= bytes.length) {
      val p = pos.toInt
      val id = bb.getInt(p); val sz = bb.getInt(p + 4)
      require(sz >= 0, s"negative chunk size $sz at offset $pos")
      id match {
        case 0x20746d66 => // "fmt "
          require(sz >= 16 && p + 8 + 16 <= bytes.length, "truncated fmt chunk")
          format = bb.getShort(p + 8) & 0xffff
          channels = bb.getShort(p + 10) & 0xffff
          rate = bb.getInt(p + 12)
          bits = bb.getShort(p + 22) & 0xffff
          fmtSeen = true
        case 0x61746164 => // "data"
          dataOff = p + 8
          dataLen = math.min(sz, bytes.length - dataOff)
        case _ => () // LIST/INFO/fact/… chunks are skipped
      }
      pos += 8L + sz + (sz & 1) // chunks are 16-bit aligned
    }
    require(fmtSeen, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    require(channels > 0, "zero channels")
    val bytesPerSample = bits / 8
    require((format == 1 && (bits == 8 || bits == 16 || bits == 24 || bits == 32)) ||
      (format == 3 && bits == 32), s"unsupported format=$format bits=$bits")
    val frameSize = bytesPerSample * channels
    val frames = dataLen / frameSize
    val mono = new Array[Float](frames)
    var f = 0
    while (f < frames) {
      var acc = 0f
      var c = 0
      while (c < channels) {
        val o = dataOff + f * frameSize + c * bytesPerSample
        acc += (if (format == 3) bb.getFloat(o)
        else bits match {
          case 8 => ((bytes(o) & 0xff) - 128) / 128f
          case 16 => bb.getShort(o) / 32768f
          case 24 =>
            val v = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o + 2) << 16)
            v / 8388608f
          case 32 => bb.getInt(o) / 2147483648f
        })
        c += 1
      }
      mono(f) = acc / channels
      f += 1
    }
    WavAudio(rate, channels, mono)
  }

  /** Real audio feature extraction: decode each WAV blob and emit the RMS
    * energy of `dim` equal time windows — a fixed-dim `array<float>` that
    * feeds the similarity operators exactly like the stubbed features.
    * Same distributed shape as `decodeFeatures`: one partition of blobs
    * per task, no driver involvement.
    */
  def wavFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.filter(col("mime") === "audio/wav").select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, blob) =>
          val wav = decodeWav(blob)
          val n = wav.samples.length
          val sumSq = new Array[Double](dim)
          val cnt = new Array[Int](dim)
          var i = 0
          while (i < n) {
            val w = (i.toLong * dim / n).toInt
            val x = wav.samples(i)
            sumSq(w) += x.toDouble * x
            cnt(w) += 1
            i += 1
          }
          val feat = Array.tabulate(dim)(w =>
            if (cnt(w) == 0) 0f else math.sqrt(sumSq(w) / cnt(w)).toFloat)
          (id, wav.sampleRate, n, feat)
        }
      }
      .toDF("media_id", "sample_rate", "n_samples", "feature")
  }

  // ---- real image decode (PPM / BMP / PNG / JPEG) ----------------------
  //
  // Codec-free raster formats make a SECOND real modality: binary PPM (P6)
  // is a text header + raw RGB, and uncompressed 24-bit BMP is a fixed
  // little-endian header + padded BGR rows. Both decode in pure JVM code,
  // in the same mapPartitions batch shape as the WAV path. PNG decodes via
  // hand-rolled chunk walk + JDK zlib; JPEG via the JDK's own ImageIO
  // codec. The stub now covers only H.264 (no JDK video codec).

  /** Decoded raster: interleaved RGB, row-major, top-down. */
  final case class RgbImage(width: Int, height: Int, pixels: Array[Byte])

  /** Container sniff: P6 PPM, BMP, PNG, or JPEG by magic bytes. */
  def decodeImage(bytes: Array[Byte]): RgbImage = {
    require(bytes.length >= 2, "too short for an image header")
    if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') decodePng(bytes)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      decodeJpeg(bytes)
    else throw new IllegalArgumentException(
      "unsupported image container (PPM, uncompressed BMP, 8-bit " +
        "non-interlaced PNG, and JPEG decode here)")
  }

  /** Real JPEG decode via the JDK's OWN codec (`javax.imageio` — present
    * in every JDK since 1.4; an earlier revision stubbed JPEG claiming
    * "no codec in the JDK", which was simply wrong). Decode is
    * bit-deterministic WITHIN a JVM (same decoder, same IDCT), which is
    * what the per-partition feature discipline needs; what a lossy codec
    * cannot give is bit-exactness across ENCODERS — round-tripping
    * pixels→JPEG→pixels perturbs values — so JPEG features get
    * tolerance-band assertions (MultimodalSpec), never the PNG path's
    * exact-pixel pins. Grayscale JPEGs replicate to RGB like PNG gray.
    */
  def decodeJpeg(bytes: Array[Byte]): RgbImage = {
    // hand ImageIO a MemoryCache stream: the InputStream overload wraps in
    // a FileCache stream (disk temp file per decode) when useCache is on
    val img = javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
    require(img != null, "ImageIO could not decode the JPEG stream")
    val w = img.getWidth; val h = img.getHeight
    require(w > 0 && h > 0, s"bad JPEG dimensions ${w}x$h")
    require(w.toLong * h * 3 <= Int.MaxValue, "JPEG dimensions overflow")
    val out = new Array[Byte](w * h * 3)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val argb = row(x)
        val d = (y * w + x) * 3
        out(d) = ((argb >> 16) & 0xff).toByte
        out(d + 1) = ((argb >> 8) & 0xff).toByte
        out(d + 2) = (argb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    RgbImage(w, h, out)
  }

  /** Real PNG decode in pure JVM code — the compression side is zlib
    * (`java.util.zip.Inflater`, in the JDK), so PNG is NOT codec-bound the
    * way JPEG/H.264 are: chunk walk (CRC-checked), IDAT inflate, and the
    * five per-scanline filters (None/Sub/Up/Average/Paeth) reversed
    * byte-exactly per the spec. Supports 8-bit depth, non-interlaced,
    * color types 0 (gray → replicated to RGB), 2 (RGB), 6 (RGBA — alpha
    * dropped; features read color, not coverage). Every step is integer
    * arithmetic ⇒ bit-deterministic on any JVM.
    */
  def decodePng(bytes: Array[Byte]): RgbImage = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    require(bytes.length > 8, "truncated PNG")
    bb.position(8) // signature checked by the sniff
    var w = 0; var h = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    val crc = new java.util.zip.CRC32()
    while (!sawEnd) {
      require(bb.remaining() >= 8, "truncated PNG chunk header")
      val len = bb.getInt
      // compare in Long: a crafted len near Int.MaxValue would overflow
      // `len + 8` to negative and slip past the remaining() check, then
      // blow up on array allocation instead of this clean error
      require(len >= 0 && bb.remaining().toLong >= len.toLong + 8, "bad PNG chunk length")
      val tagAndData = new Array[Byte](4 + len)
      bb.get(tagAndData)
      crc.reset(); crc.update(tagAndData)
      require(bb.getInt == crc.getValue.toInt, "PNG chunk CRC mismatch")
      val tag = new String(tagAndData, 0, 4, "US-ASCII")
      tag match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          val d = java.nio.ByteBuffer.wrap(tagAndData, 4, 13)
            .order(java.nio.ByteOrder.BIG_ENDIAN)
          w = d.getInt; h = d.getInt
          val bitDepth = d.get() & 0xff
          colorType = d.get() & 0xff
          val compression = d.get() & 0xff
          val filterMethod = d.get() & 0xff
          val interlace = d.get() & 0xff
          require(w > 0 && h > 0, s"bad PNG dimensions ${w}x$h")
          require(bitDepth == 8, s"only 8-bit PNG supported, depth=$bitDepth")
          require(colorType == 0 || colorType == 2 || colorType == 6,
            s"unsupported PNG color type $colorType (gray/RGB/RGBA decode here)")
          require(compression == 0 && filterMethod == 0, "nonstandard PNG")
          require(interlace == 0, "interlaced PNG not supported")
        case "IDAT" => idat.write(tagAndData, 4, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks carry no pixel data
      }
    }
    require(colorType >= 0, "PNG missing IHDR")
    val bpp = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, off, raw.length - off)
      require(n > 0 || inf.finished() || !inf.needsInput, "truncated PNG IDAT")
      off += n
    }
    inf.end()
    require(off == raw.length, s"PNG pixel data short: $off of ${raw.length}")

    // reverse the per-scanline filter in place; `prev` tracks the
    // reconstructed prior scanline
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val base = y * (stride + 1)
      val filter = raw(base) & 0xff
      var x = 0
      while (x < stride) {
        val v = raw(base + 1 + x) & 0xff
        val a = if (x >= bpp) cur(x - bpp) else 0
        val b = prev(x)
        val c = if (x >= bpp) prev(x - bpp) else 0
        cur(x) = filter match {
          case 0 => v
          case 1 => (v + a) & 0xff
          case 2 => (v + b) & 0xff
          case 3 => (v + ((a + b) >> 1)) & 0xff
          case 4 => (v + paeth(a, b, c)) & 0xff
          case other => throw new IllegalArgumentException(
            s"bad PNG filter type $other at row $y")
        }
        x += 1
      }
      // emit RGB for this row
      var px = 0
      while (px < w) {
        val o = (y * w + px) * 3
        colorType match {
          case 0 =>
            val g = cur(px)
            out(o) = g.toByte; out(o + 1) = g.toByte; out(o + 2) = g.toByte
          case _ =>
            out(o) = cur(px * bpp).toByte
            out(o + 1) = cur(px * bpp + 1).toByte
            out(o + 2) = cur(px * bpp + 2).toByte
        }
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    RgbImage(w, h, out)
  }

  /** Binary PPM (P6): `P6 <w> <h> <maxval>` in ASCII (with `#` comments),
    * one whitespace byte, then raw interleaved RGB. 8-bit depth only.
    */
  def decodePpm(bytes: Array[Byte]): RgbImage = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    var pos = 2
    def nextInt(): Int = {
      while (pos < bytes.length &&
        (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') // comment runs to end of line
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      var v = 0
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) {
        val d = bytes(pos) - '0'
        require(d >= 0 && d <= 9, s"non-numeric PPM header byte at offset $pos")
        require(v <= (Int.MaxValue - d) / 10, "PPM header value overflows Int")
        v = v * 10 + d
        pos += 1
      }
      require(pos > start, "truncated PPM header")
      v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    require(w > 0 && h > 0, s"bad PPM dimensions ${w}x$h")
    require(maxv == 255, s"only 8-bit PPM supported, maxval=$maxv")
    pos += 1 // exactly one whitespace byte separates header from pixels
    val need = w.toLong * h * 3
    require(need <= Int.MaxValue && bytes.length - pos >= need,
      "truncated PPM pixel data")
    RgbImage(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + need.toInt))
  }

  /** Uncompressed 24-bit BMP: 14-byte file header + BITMAPINFOHEADER,
    * 4-byte-padded BGR rows, bottom-up unless height is negative. Rows are
    * flipped and channels swapped so the output matches the PPM contract.
    */
  def decodeBmp(bytes: Array[Byte]): RgbImage = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val dataOff = bb.getInt(10)
    require(bb.getInt(14) >= 40, "BITMAPCOREHEADER not supported")
    val w = bb.getInt(18); val hRaw = bb.getInt(22)
    val bits = bb.getShort(28) & 0xffff
    val compression = bb.getInt(30)
    require(w > 0 && hRaw != 0, s"bad BMP dimensions ${w}x$hRaw")
    require(bits == 24 && compression == 0,
      s"only uncompressed 24-bit BMP supported, bits=$bits compression=$compression")
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val rowSize = ((w * 3 + 3) / 4) * 4
    require(dataOff >= 54 && dataOff.toLong + rowSize.toLong * h <= bytes.length,
      "truncated BMP pixel data")
    require(w.toLong * h * 3 <= Int.MaxValue, "BMP dimensions overflow")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var x = 0
      while (x < w) {
        val so = dataOff + srcRow * rowSize + x * 3
        val d = (y * w + x) * 3
        out(d) = bytes(so + 2)     // BMP stores BGR
        out(d + 1) = bytes(so + 1)
        out(d + 2) = bytes(so)
        x += 1
      }
      y += 1
    }
    RgbImage(w, h, out)
  }

  /** Real image feature extraction: decode each PPM/BMP blob and emit
    * per-channel mean + variance (6 floats) followed by a `grid`×`grid`
    * per-channel downsampled mean grid (3·grid² floats) — a fixed-dim
    * `array<float>` for the similarity operators. Accumulation is a
    * sequential double fold per image, so features are bit-deterministic.
    * Same distributed shape as the WAV path: one partition of blobs per
    * task, no driver involvement.
    */
  def imageFeatures(media: DataFrame, grid: Int = 2): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    // filter to exactly the formats this decoder handles (as wavFeatures
    // filters 'audio/wav'): a blanket image/* would route rows of a format
    // decodeImage does NOT handle (a webp/avif in a mixed corpus) into it
    // and crash the job on the first such payload instead of skipping it
    media.filter(col("mime").isin(
      "image/ppm", "image/bmp", "image/png", "image/jpeg"))
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, blob) =>
          val img = decodeImage(blob)
          (id, img.width, img.height, imageFeatureVector(img, grid))
        }
      }
      .toDF("media_id", "width", "height", "feature")
  }

  /** Real PIXEL-level resize: nearest-neighbor with the floor source map
    * `src = dst · srcDim / outDim` (pure integer arithmetic — the same
    * exactness discipline as the metadata math in [[resized]]; no
    * sub-pixel filtering means no float accumulation and bit-identical
    * output on any JVM). Nearest-neighbor is the honest baseline kernel:
    * area/bilinear filters change downstream features by design and would
    * need tolerance-band gates; this one is exact-pinnable.
    */
  def resizePixels(img: RgbImage, outW: Int, outH: Int): RgbImage = {
    require(outW > 0 && outH > 0, s"bad resize target ${outW}x$outH")
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * img.height / outH).toInt
      var x = 0
      while (x < outW) {
        val so = (sy * img.width + (x.toLong * img.width / outW).toInt) * 3
        val d = (y * outW + x) * 3
        out(d) = img.pixels(so)
        out(d + 1) = img.pixels(so + 1)
        out(d + 2) = img.pixels(so + 2)
        x += 1
      }
      y += 1
    }
    RgbImage(outW, outH, out)
  }

  /** Distributed decode→resize→featurize stage: each image decodes, maps
    * through [[resizePixels]] to the SAME aspect-preserving target the
    * metadata operator computes (out_w = min(width, maxWidth), out_h =
    * floor(height·out_w/width) — one shared formula, so the plan-level
    * resize math and the pixel kernel cannot drift), then re-extracts the
    * fixed-dim feature at the new size. Same mapPartitions batch shape as
    * [[imageFeatures]]: one partition of blobs per task, no driver. At
    * 100 TB this is the standard normalize-resolution preprocessing pass
    * before any vision-encoder batch.
    */
  def resizedImageFeatures(media: DataFrame, maxWidth: Int,
                           grid: Int = 2): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.filter(col("mime").isin(
      "image/ppm", "image/bmp", "image/png", "image/jpeg"))
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, blob) =>
          val img = decodeImage(blob)
          val outW = math.min(img.width, maxWidth)
          // the same ≥1 clamp as the metadata operator (see resized)
          val outH = math.max(((img.height.toLong * outW) / img.width).toInt, 1)
          val small = resizePixels(img, outW, outH)
          (id, small.width, small.height, imageFeatureVector(small, grid))
        }
      }
      .toDF("media_id", "out_w", "out_h", "feature")
  }

  /** The per-image feature fold of [[imageFeatures]], factored out so the
    * resize stage featurizes identically (mean+var per channel, then the
    * grid of per-cell channel means).
    */
  private[graft] def imageFeatureVector(img: RgbImage, grid: Int): Array[Float] = {
    val n = img.width * img.height
    val sum = new Array[Double](3); val sumSq = new Array[Double](3)
    val cellSum = Array.ofDim[Double](grid * grid, 3)
    val cellCnt = new Array[Int](grid * grid)
    var i = 0
    while (i < n) {
      val y = i / img.width; val x = i % img.width
      val cell = (y.toLong * grid / img.height).toInt * grid +
        (x.toLong * grid / img.width).toInt
      cellCnt(cell) += 1
      var c = 0
      while (c < 3) {
        val v = (img.pixels(i * 3 + c) & 0xff) / 255.0
        sum(c) += v; sumSq(c) += v * v; cellSum(cell)(c) += v
        c += 1
      }
      i += 1
    }
    val feat = new Array[Float](6 + 3 * grid * grid)
    var c = 0
    while (c < 3) {
      val mean = sum(c) / n
      feat(c) = mean.toFloat
      feat(3 + c) = (sumSq(c) / n - mean * mean).toFloat
      c += 1
    }
    var g = 0
    while (g < grid * grid) {
      var ch = 0
      while (ch < 3) {
        feat(6 + g * 3 + ch) =
          (if (cellCnt(g) == 0) 0.0 else cellSum(g)(ch) / cellCnt(g)).toFloat
        ch += 1
      }
      g += 1
    }
    feat
  }

  // ---- real multi-frame decode (animated GIF) --------------------------
  //
  // GIF is the one multi-frame container the JDK decodes natively
  // (javax.imageio ships a GIF reader AND writer), which upgrades the
  // frame-sampling family from metadata-only to REAL frames: encode N
  // frames into one animated blob, read the frame count back from the
  // container, decode each frame. GIF stores an indexed palette losslessly,
  // so with a 256-gray palette the byte→pixel→byte round trip is EXACT —
  // unlike JPEG, gates on decoded GIF pixels can be bit-exact.

  /** Encode same-size 8-bit gray frames as one animated GIF via the JDK's
    * own writer (`prepareWriteSequence`/`writeToSequence`). Each frame is
    * TYPE_BYTE_INDEXED over an identity gray palette (index i → rgb
    * (i,i,i)), so the stored color table maps every input byte to itself.
    */
  // per-document codec cost hoisted out of the mapPartitions hot loop:
  // the identity palette is immutable and shared; writer/reader instances
  // are NOT thread-safe but ARE reusable after reset(), so each executor
  // thread keeps one (bounded by thread count) instead of paying the SPI
  // registry lookup + allocation once per document
  private val GrayIcm = {
    val gray = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
  }
  private val GifWriterTl =
    ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next())
  private val GifReaderTl =
    ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
      javax.imageio.ImageIO.getImageReadersByFormatName("gif").next())

  def encodeGifGray(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    require(frames.nonEmpty, "no frames to encode")
    // measured JDK codec quirk (jshell probe, JDK 17): any GIF written at
    // height <= 4 round-trips with every row after row 0 corrupted —
    // height >= 5 is always exact. Interlace-pass bookkeeping in the
    // javax.imageio GIF plugin; refuse the degenerate sizes rather than
    // silently emit frames this JVM cannot read back.
    require(h >= 5, s"JDK GIF codec corrupts images under 5 rows (h=$h)")
    frames.foreach(f => require(f.length == w * h,
      s"frame length ${f.length} != ${w}x$h"))
    val bos = new java.io.ByteArrayOutputStream()
    val writer = GifWriterTl.get()
    // MemoryCache stream, NOT ImageIO.createImageOutputStream: the factory
    // honors ImageIO.getUseCache() (true by default) and backs every call
    // with a disk temp file — measured ~3 ms/image of create/delete churn
    // that dominated the dhash decade probe. In-heap cache for an 8×8 GIF.
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { px =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, GrayIcm)
        img.getRaster.setDataElements(0, 0, w, h, px)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.reset(); ios.close() }
    bos.toByteArray
  }

  /** Decode EVERY frame of an animated GIF with the JDK reader: frame
    * count from the container (`getNumImages(true)`), each frame read
    * independently and expanded through its palette to interleaved RGB —
    * the same [[RgbImage]] the single-frame decoders emit, so decoded
    * frames flow into [[imageFeatureVector]]/[[resizePixels]] unchanged.
    */
  def decodeGifFrames(bytes: Array[Byte]): Seq[RgbImage] = {
    val reader = GifReaderTl.get()
    // MemoryCache stream for the same reason as the writer side: the
    // ImageIO factory's default FileCache backing costs a disk temp file
    // per decode call.
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      require(n > 0, "GIF stream holds no frames")
      (0 until n).map { i =>
        val img = reader.read(i)
        val w = img.getWidth; val h = img.getHeight
        val out = new Array[Byte](w * h * 3)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val argb = row(x)
            val d = (y * w + x) * 3
            out(d) = ((argb >> 16) & 0xff).toByte
            out(d + 1) = ((argb >> 8) & 0xff).toByte
            out(d + 2) = (argb & 0xff).toByte
            x += 1
          }
          y += 1
        }
        RgbImage(w, h, out)
      }
    } finally { reader.reset(); iis.close() }
  }

  private val GifFrameW = 8
  private val GifFrameH = 8
  private val GifMaxFrames = 4

  /** Gated ENCODE→DECODE round trip over the corpus: each document's
    * printable-ASCII text becomes up to [[GifMaxFrames]] 8×8 gray frames
    * (pixel = char code), the frames encode into ONE animated GIF, the GIF
    * decodes back through the real multi-frame reader, and the gate emits
    * per-frame dimensions + the decoded pixel sum. Because the gray
    * palette round-trips exactly, DuckDB can recompute every pixel sum
    * from the text chars alone — a bit-exact cross-engine oracle over a
    * REAL container decode (the property JPEG's lossy path can never
    * give). The ASCII filter is load-bearing twice: char code = UTF-8
    * byte = palette index ≤ 127 < 256, and ord() agrees across engines.
    *
    * Shape: encode+decode both live in one mapPartitions batch over
    * document rows — no driver, no shuffle except the gate's ORDER BY.
    */
  def gifFrameTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frameLen = GifFrameW * GifFrameH
    Tables.load(s, dir, "documents")
      // \A..\z, not ^..$: Java's $ matches BEFORE a final line terminator,
      // so "abc\n" would pass here yet fail the oracle's RE2 '^..$' (which
      // is \A..\z-strict) — a cross-engine row-count flap on any document
      // with a trailing newline
      .filter(col("text").rlike("\\A[ -~]*\\z") && length(col("text")) >= frameLen)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val bytes = text.getBytes("US-ASCII")
          val n = math.min(bytes.length / frameLen, GifMaxFrames)
          val frames = (0 until n).map(f =>
            java.util.Arrays.copyOfRange(bytes, f * frameLen, (f + 1) * frameLen))
          val gif = encodeGifGray(frames, GifFrameW, GifFrameH)
          decodeGifFrames(gif).iterator.zipWithIndex.map { case (img, idx) =>
            var sum = 0L
            var i = 0
            while (i < img.pixels.length) { sum += img.pixels(i) & 0xff; i += 3 }
            (id, idx, img.width, img.height, sum)
          }
        }
      }
      .toDF("media_id", "frame_idx", "width", "height", "pix_sum")
      .withColumn("frame_idx", col("frame_idx").cast("int"))
      .orderBy("media_id", "frame_idx")
  }

  private val gifFrameTableSql =
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |    least(length(text) // ${GifFrameW * GifFrameH}, $GifMaxFrames) AS nf
       |  FROM documents
       |  WHERE regexp_matches(text, '^[ -~]*$$')
       |    AND length(text) >= ${GifFrameW * GifFrameH}),
       |f AS (
       |  SELECT doc_id, unnest(range(nf)) AS frame_idx, text FROM d)
       |SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
       |  $GifFrameW AS width, $GifFrameH AS height,
       |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(range(${GifFrameW * GifFrameH}),
       |      i -> ord(substring(text, CAST(frame_idx * ${GifFrameW * GifFrameH} + i + 1 AS INT), 1)))),
       |    (a, b) -> a + b) AS BIGINT) AS pix_sum
       |FROM f ORDER BY media_id, frame_idx""".stripMargin

  /** Gated metadata query: per-frame rows with byte sizes and resize math
    * (decode stays out — it has no cross-engine oracle by design).
    */
  def frameTable(s: SparkSession, dir: String): DataFrame = {
    val m = resized(media(s, dir), maxWidth = 640)
      // BIGINT: DuckDB octet_length yields BIGINT, Spark INT
      .withColumn("n_bytes", octet_length(col("bytes")).cast("long"))
    frameSample(m, everyMs = 1000)
      .join(m.select(col("media_id"), col("n_bytes"),
        col("out_w").cast("long").as("out_w"), col("out_h")), "media_id")
      .select("media_id", "frame_idx", "frame_ts", "mime", "n_bytes", "out_w", "out_h")
      .orderBy("media_id", "frame_idx")
  }

  private val frameTableSql =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |         ELSE 'video/mp4' END AS mime,
      |    CAST(320 + (doc_id % 4) * 160 AS INT) AS width,
      |    CAST(200 + (doc_id % 5) * 120 AS INT) AS height,
      |    CAST(n_chars * 40 AS INT) AS duration_ms,
      |    octet_length(CAST(text AS BLOB)) AS n_bytes
      |  FROM documents),
      |r AS (
      |  SELECT *, CAST(least(width, 640) AS BIGINT) AS out_w,
      |    CAST(greatest((CAST(height AS BIGINT) * least(width, 640)) // width,
      |                  1) AS INT) AS out_h
      |  FROM m),
      |f AS (
      |  SELECT media_id, unnest(range(0, duration_ms + 1, 1000)) AS frame_ts,
      |    mime, n_bytes, out_w, out_h
      |  FROM r)
      |SELECT media_id,
      |  CAST(row_number() OVER (PARTITION BY media_id ORDER BY frame_ts) - 1 AS INT)
      |    AS frame_idx,
      |  CAST(frame_ts AS INT) AS frame_ts, mime, n_bytes, out_w, out_h
      |FROM f ORDER BY media_id, frame_idx""".stripMargin

  // ------------------------ image perceptual-hash near-dup (dHash+LSH)

  private val DhRows = 8
  private val DhCols = 8
  private val DhBits = DhRows * (DhCols - 1) // 56
  private val DhBands = 4
  private val DhBandBits = DhBits / DhBands // 14
  private val DhMaxHamming = 3

  /** Image near-duplicate detection by difference hash over REALLY-decoded
    * frames — the image-side dedup a multimodal training pipeline runs
    * (the LAION-5B preprocessing shape: perceptual-hash every image, join
    * on hash proximity, drop near-identical variants; Krawetz's dHash):
    * each image becomes a [[DhBits]]-bit gradient signature (bit = left
    * pixel brighter than its right neighbor, row-major). Output is the
    * dedup EDGE LIST a consumer keeps canonicals from: one row per
    * non-canonical image pointing at its cluster representative
    * (hamming 0 — images whose signatures are IDENTICAL), plus one row
    * per representative pair within hamming 1..[[DhMaxHamming]] (distinct
    * but near signatures). hamming = 0 ⟺ exact edge by construction,
    * since identical signatures share a cluster.
    *
    * The fixture is the [[gifFrameTable]] discipline taken one stage
    * further: each printable-ASCII document's first 64 chars become an
    * 8×8 gray frame, PLUS a brightness-shifted "re-crawl" variant
    * (pixel+1, clamped at 126 — the classic near-dup a perceptual hash
    * exists to catch and an exact content hash cannot: the GRADIENT is
    * invariant under a brightness shift, so each original/variant pair
    * shares a signature up to the few clamp-tie bits). Both variants go
    * through the REAL GIF encode→decode round trip — the hash is computed
    * from decoder-output pixels, not from the text — while the gray
    * palette's exact round trip lets DuckDB re-derive every bit from the
    * chars alone: a bit-exact cross-engine oracle over a real decode.
    *
    * The first cut of this operator emitted ALL image pairs at hamming ≤
    * [[DhMaxHamming]] and measured **15.2× at the decade** (3.4 → 51.5 s,
    * 5.9k → 859k rows): a 56-bit gradient signature of structured text
    * SATURATES (measured 4.6k → 9.4k distinct hashes for 10× images, top
    * cluster 72), so pairs-within-identical-hash is Σ C(n,2) — quadratic
    * in cluster occupancy. The shipped shape routes identical-hash mass
    * through ONE hash-cluster aggregation (map-side-combining `min` per
    * dhash — the "exact dedup upstream" every pHash pipeline runs) into
    * star edges (n−1 per cluster, ≤ one row per image, the per-image
    * canonical ASSIGNMENT a dedup actually needs), and only DISTINCT
    * signatures enter the band join (measured 0 / 16 rep pairs at the two
    * scales). Decade after the reshape (and after routing the codec
    * through MemoryCache ImageIO streams — see [[encodeGifGray]]):
    * 1.32 → 5.16 s = 3.91×, the decode scan's own growth.
    *
    * The rep-pair candidate join is EXACT, not probabilistic (the
    * ngramJaccard prefix-filter discipline): [[DhBands]] bands of
    * [[DhBandBits]] bits — hamming ≤ 3 can touch at most 3 bands, so
    * every qualifying pair shares at least one band verbatim (pigeonhole),
    * and the band equi-join provably surfaces ALL of them; bit_count on
    * the XOR then verifies exactly. Plan shape at 100 TB: decode+hash is
    * one mapPartitions scan (no shuffle), the cluster agg is one shuffle
    * of (dhash, id) pairs with partial min, the assignment join-back runs
    * on AQE (the saturated rep table broadcasts), and the band join fans
    * in over distinct signatures only. No reference analog (§2x extension
    * surface).
    */
  /** Decode+hash stage shared by the one-shot gate, the index build, and
    * the incremental probe: each eligible document's 8×8 frame and its
    * brightness-shifted re-crawl variant run the REAL GIF encode→decode
    * round trip to (media_id, dhash). Pure map, no shuffle — callers
    * cache when they fan out.
    */
  private[graft] def dhashHashes(s: SparkSession, dir: String,
                                 docFilter: Column): DataFrame =
    dhashHashesOf(s, Tables.load(s, dir, "documents").filter(docFilter))

  /** [[dhashHashes]] over a caller-supplied documents frame — the form the
    * streaming front door feeds micro-batches through (the shinglesOf
    * discipline); applies the eligibility filter itself so every door
    * hashes identically. */
  private[graft] def dhashHashesOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val frameLen = DhRows * DhCols
    docs
      .filter(col("text").rlike("\\A[ -~]*\\z") &&
        length(col("text")) >= frameLen)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val base = java.util.Arrays.copyOf(
            text.getBytes("US-ASCII"), frameLen)
          val shifted = base.map(b => math.min(b + 1, 126).toByte)
          Seq((id * 2, base), (id * 2 + 1, shifted)).map {
            case (mediaId, frame) =>
              val gif = encodeGifGray(Seq(frame), DhCols, DhRows)
              val img = decodeGifFrames(gif).head
              var h = 0L
              var k = 0
              while (k < DhBits) {
                val r = k / (DhCols - 1)
                val c = k % (DhCols - 1)
                val left = img.pixels((r * DhCols + c) * 3) & 0xff
                val right = img.pixels((r * DhCols + c + 1) * 3) & 0xff
                if (left > right) h |= (1L << k)
                k += 1
              }
              (mediaId, h)
          }
        }
      }
      .toDF("media_id", "dhash")
  }

  /** Explode a hash frame into its [[DhBands]] (band, key) bucket rows —
    * ONE banding spelling shared by the in-plan gate, the index build,
    * and the probe, so index and probe can never band differently. */
  private def dhashBands(hashes: DataFrame, idCol: String): DataFrame =
    hashes.select(col(idCol), col("dhash"),
        explode(expr(s"transform(sequence(0, ${DhBands - 1}), " +
          s"b -> struct(b AS band, " +
          s"shiftright(dhash, b * $DhBandBits) & ${(1 << DhBandBits) - 1} AS key))"))
          .as("bk"))
      .select(col(idCol), col("dhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))

  /** Cluster-reshaped near-dup edge list over ≤64-bit perceptual hashes —
    * the scale shape shared by the image (dHash) and audio (energy-delta
    * fingerprint) dedup gates: ONE hash-cluster aggregation collapses
    * hash-identical media into per-media canonical star edges (hamming 0,
    * ≤1 row per media — never the quadratic within-cluster clique), and
    * only DISTINCT hashes enter the exact pigeonhole band join for near
    * edges at hamming 1..`maxHamming` (≤ `nBands` − 1 differing bits
    * guarantee a shared band). Input schema (media_id, h). The hash frame
    * feeds both the cluster agg and the assignment join-back, so it is
    * cached here — or the caller's decode scan runs twice (measured 2×
    * the whole query at the dhash decade probe).
    */
  private def perceptualEdges(hashes: DataFrame, nBands: Int,
                              bandBits: Int, maxHamming: Int): DataFrame = {
    require(maxHamming < nBands, "pigeonhole needs maxHamming < nBands")
    val h = hashes.toDF("media_id", "h").cache()
    val clusters = h.groupBy("h").agg(min("media_id").as("rep"))
    val exactEdges = h.join(clusters, "h")
      .filter(col("media_id") =!= col("rep"))
      .select(col("rep").as("media_a"), col("media_id").as("media_b"),
        lit(0L).as("hamming"))
    val bands = clusters.select(col("rep"), col("h"),
        explode(expr(s"transform(sequence(0, ${nBands - 1}), " +
          s"b -> struct(b AS band, " +
          s"shiftright(h, b * $bandBits) & ${(1 << bandBits) - 1} AS key))"))
          .as("bk"))
      .select(col("rep"), col("h"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = bands.toDF("media_a", "h_a", "band", "key")
    val b = bands.toDF("media_b", "h_b", "band", "key")
    val nearEdges = a.join(b, Seq("band", "key"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"), col("h_a"), col("h_b"))
      .distinct()
      .withColumn("hamming",
        expr("bit_count(h_a ^ h_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("media_a"), col("media_b"), col("hamming"))
    // purge-gate discipline: materialize the (bounded) edge list, then
    // drop the probe cache — a lingering InMemoryRelation whose plan is
    // identical to another gate's pinned plan is the "found 2 subtrees"
    // PlanSpec hazard, and Verify never clears caches between gates
    val out = exactEdges.unionAll(nearEdges)
      .orderBy("media_a", "media_b").localCheckpoint()
    h.unpersist(blocking = false)
    out
  }

  def imageDhashNearDup(s: SparkSession, dir: String): DataFrame =
    perceptualEdges(dhashHashes(s, dir, lit(true)),
      DhBands, DhBandBits, DhMaxHamming)

  private val imageDhashNearDupSql = {
    val frameLen = DhRows * DhCols
    s"""WITH d AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE regexp_matches(text, '^[ -~]*$$')
       |    AND length(text) >= $frameLen),
       |px AS (
       |  SELECT doc_id * 2 AS media_id,
       |    list_transform(range($frameLen),
       |      i -> ord(substring(text, CAST(i + 1 AS INT), 1))) AS p
       |  FROM d
       |  UNION ALL
       |  SELECT doc_id * 2 + 1,
       |    list_transform(range($frameLen),
       |      i -> least(ord(substring(text, CAST(i + 1 AS INT), 1)) + 1, 126))
       |  FROM d),
       |h AS (
       |  SELECT media_id,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range($DhBits), k ->
       |        CASE WHEN p[(k // ${DhCols - 1}) * $DhCols + (k % ${DhCols - 1}) + 1]
       |                  > p[(k // ${DhCols - 1}) * $DhCols + (k % ${DhCols - 1}) + 2]
       |             THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)),
       |      (a, b) -> a + b) AS BIGINT) AS dhash
       |  FROM px),
       |clusters AS (
       |  SELECT dhash, min(media_id) AS rep FROM h GROUP BY dhash),
       |exact_edges AS (
       |  SELECT c.rep AS media_a, h.media_id AS media_b,
       |    CAST(0 AS BIGINT) AS hamming
       |  FROM h JOIN clusters c ON h.dhash = c.dhash
       |  WHERE h.media_id <> c.rep),
       |bands AS (
       |  SELECT rep, dhash, b,
       |    (dhash >> CAST(b * $DhBandBits AS INT)) & ${(1 << DhBandBits) - 1} AS key
       |  FROM clusters, unnest(range($DhBands)) AS u(b)),
       |cand AS (
       |  SELECT DISTINCT x.rep AS media_a, y.rep AS media_b,
       |    x.dhash AS dhash_a, y.dhash AS dhash_b
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.key = y.key AND x.rep < y.rep),
       |near_edges AS (
       |  SELECT media_a, media_b,
       |    CAST(bit_count(xor(dhash_a, dhash_b)) AS BIGINT) AS hamming
       |  FROM cand WHERE bit_count(xor(dhash_a, dhash_b)) <= $DhMaxHamming)
       |SELECT media_a, media_b, hamming FROM exact_edges
       |UNION ALL
       |SELECT media_a, media_b, hamming FROM near_edges
       |ORDER BY media_a, media_b""".stripMargin
  }

  // --------------- incremental image dedup against a STORED dHash index

  /** Materialize the dHash cluster-band index ONCE per JVM — the
    * image-side serve split (the minhashBuildIndex discipline applied to
    * [[imageDhashNearDup]]): a production pipeline perceptual-hashes the
    * image lake ONCE and then asks "which lake images does this new crawl
    * batch duplicate?" every day, without ever re-decoding history.
    * Stored layout: `bands/` — (hist_rep, dhash, band, key), the
    * [[DhBands]] bucket rows of every DISTINCT history signature (the
    * X87 cluster reshape baked into the index: hash-identical lake images
    * are ONE stored row, so index size is bounded by signature diversity,
    * which saturates, not by lake size). At 100 TB the bands table is
    * bucketed BY (band, key) on disk so a probe is a co-located join.
    * One [[dhashBands]] spelling with the in-plan gate and the probe —
    * index and probe can never band differently by construction.
    * Rebuilt on each JVM's first use (index content is output of the code
    * under test); bench's untimed warmup absorbs the build, timed reps
    * measure pure probing.
    */
  def dhashBuildIndex(s: SparkSession, dir: String): String = {
    import graft.operators.JournalGate.{buildPerJvm, fixtureRoot}
    buildPerJvm(fixtureRoot("dhidx", dir)) { tmp =>
      writeDhashIndex(s,
        dhashHashes(s, dir, graft.operators.TextOps.isHistoryDoc),
        tmp.toString)
    }.toString
  }

  /** Write the cluster-band layout for a history hash frame — the build
    * body of [[dhashBuildIndex]], callable with any history instance (the
    * Scaling eval-fixed probe scales history while the batch stays
    * pinned). */
  private[graft] def writeDhashIndex(s: SparkSession, history: DataFrame,
                                     tmp: String): Unit = {
    val clusters = history.groupBy("dhash").agg(min("media_id").as("rep"))
    dhashBands(clusters.select(col("rep"), col("dhash")), "rep")
      .write.parquet(s"$tmp/bands")
  }

  /** Incremental image near-dup of a fresh crawl batch AGAINST the stored
    * dHash index — the image-dedup operation that actually runs per
    * crawl: the batch (20% md5 split, the shared isHistoryDoc spelling)
    * decodes and hashes ONLY its own images (the plan's one GIF-decode
    * mapPartitions subtree), probes the STORED cluster bands, and
    * verifies with codegen'd bit_count on the stored signature — history
    * is never re-decoded or even scanned. Serve cost = batch decode map +
    * candidate-bucket occupancy, independent of lake size once signature
    * diversity saturates (the X87 measurement).
    *
    * Output contract: (batch_media, hist_rep, hamming ≤ [[DhMaxHamming]])
    * — which lake CLUSTER each new image duplicates (hamming 0 = the lake
    * holds a pixel-gradient-identical image; 1..3 = a near variant); the
    * ingest decision (drop the batch image) is a semi-join against these
    * rows. The candidate join is exact by the same pigeonhole as the
    * one-shot gate, so the oracle is the full all-pairs batch×cluster
    * hamming in DuckDB with every bit re-derived from the chars.
    * No reference analog (§2x extension surface).
    */
  def imageDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val root = dhashBuildIndex(s, dir)
    val batch = dhashHashesOf(s, batchDocs(s, dir))
    probeDhashIndexBatch(s, batch, root).orderBy("batch_media", "hist_rep")
  }

  /** The probe tail of [[imageDedupIncremental]] — band the (streaming or
    * batch) hash frame, join the stored cluster bands, verify with
    * bit_count. Streaming-safe: the per-pair dedup is dropDuplicates (a
    * media's bands all emit within its own micro-batch, so it never does
    * cross-batch work), and the index join is stream-STATIC — nothing
    * buffered, the state story is the index on disk. One spelling for
    * both front doors, so they provably answer identically and share one
    * oracle. */
  private[graft] def probeDhashIndex(s: SparkSession, hashes: DataFrame,
                                     root: String): DataFrame =
    dhashBands(hashes, "media_id")
      .toDF("batch_media", "dhash_b", "band", "key")
      .join(s.read.parquet(s"$root/bands")
        .toDF("hist_rep", "dhash_h", "band", "key"), Seq("band", "key"))
      .dropDuplicates(Seq("batch_media", "hist_rep"))
      .withColumn("hamming",
        expr("bit_count(dhash_b ^ dhash_h)").cast("long"))
      .filter(col("hamming") <= DhMaxHamming)
      .select(col("batch_media"), col("hist_rep"), col("hamming"))

  /** [[probeDhashIndex]] reshaped for the BATCH front door — the
    * perceptualEdges cluster discipline applied to the probe: the
    * saturating perceptual-hash space gives a day's batch far fewer
    * DISTINCT hashes than media, and band-bucket candidate volume is
    * per-distinct-key, so the batch's media collapse per hash BEFORE
    * banding (one groupBy over the narrow decode output — also the
    * plan's single consumer of the decode subtree, so no cache is
    * needed) and fan back out only after the hamming verify. The
    * streaming door keeps the per-media carry ([[probeDhashIndex]]) —
    * a groupBy inside an append-mode stream would be stateful, and a
    * micro-batch is small; outputs are identical by construction,
    * hamming being a function of the hash pair alone.
    *
    * Bound on the collected `ms` array: |ms| = the batch's own
    * multiplicity of ONE signature, and a signature that matches fans
    * out to |ms| output rows anyway — the array is the concentrated form
    * of output the contract already owes. The pathological case (a
    * mass-duplicate batch where one signature carries millions of media)
    * is pathological for the PAIR contract itself; a deployment facing
    * it should short-circuit to cluster-level verdicts, which is exactly
    * the one-shot gates' cluster-star output shape. */
  private[graft] def probeDhashIndexBatch(s: SparkSession, hashes: DataFrame,
                                          roots: String*): DataFrame =
    dhashBands(hashes.toDF("media_id", "dhash")
        .groupBy(col("dhash")).agg(collect_list(col("media_id")).as("ms")),
        "ms")
      .toDF("ms", "dhash_b", "band", "key")
      .join(s.read.parquet(roots.map(r => s"$r/bands"): _*)
        .toDF("hist_rep", "dhash_h", "band", "key"), Seq("band", "key"))
      .dropDuplicates(Seq("dhash_b", "hist_rep"))
      .withColumn("hamming",
        expr("bit_count(dhash_b ^ dhash_h)").cast("long"))
      .filter(col("hamming") <= DhMaxHamming)
      .select(explode(col("ms")).as("batch_media"), col("hist_rep"),
        col("hamming"))

  /** q_image_dedup_incremental's oracle, shared with the streaming gate. */
  private[graft] def imageDedupIncrementalOracle: String =
    imageDedupIncrementalSql

  private val lastUpdatedDhIndexDir =
    new java.util.concurrent.atomic.AtomicReference[String]()

  /** The INGEST half of the image dedup loop — [[graft.operators.TextOps
    * .dedupIndexUpdate]]'s daily cycle on the perceptual index: probe,
    * ACCEPT the batch images that duplicate nothing, merge their
    * signatures into the index, and prove effectively-once recognition (a
    * second probe of the SAME batch against the updated index must flag
    * every batch image — accepted images now match their own stored
    * cluster at hamming 0; original dups still match their history
    * cluster).
    *
    * The merge is APPEND-ONLY by construction, more strongly than the
    * text case: an accepted image's signature is ≥4 bits from every
    * stored signature (hamming ≤3 would have made it a dup), so every
    * accepted hash is a NEW cluster — existing cluster rows are never
    * touched, their canonical reps never move, and the update is pure
    * partition-append at 100 TB. Two accepted images sharing a hash merge
    * into one new cluster (min-media rep) before the append.
    *
    * Output: one row of exact counts the oracle re-derives from all-pairs
    * batch×history hamming — n_history_clusters, n_batch, n_dup_batch,
    * n_accepted, n_new_clusters, n_clusters_after, n_second_pass_dup
    * (= n_batch, the effectively-once witness).
    */
  def imageDedupIndexUpdate(s: SparkSession, dir: String): DataFrame = {
    val root = dhashBuildIndex(s, dir)
    // served THROUGH the VersionedRoot manifest (r18, the r17 verdict's
    // #4): every probe resolves the CURRENT pointer once and pins that
    // dir list; the update commits its delta via the race-safe append
    val work = freshUpdateDir(lastUpdatedDhIndexDir, "dhidx_upd")
    val cycle = graft.operators.VersionedRoot.cycle(
      java.nio.file.Paths.get(work), root)
    val served = cycle.before
    val batch =
      dhashHashesOf(s, batchDocs(s, dir)).cache()
    val dups = probeDhashIndexBatch(s, batch, served: _*)
      .select(col("batch_media").as("media_id")).distinct().cache()
    val accepted = batch.join(dups, Seq("media_id"), "left_anti").cache()
    // fresh dir per call (the merged index is output under test)
    val updated = s"$work/delta"
    val newClusters = accepted.groupBy("dhash")
      .agg(min("media_id").as("rep"))
    // the append writes ONLY the new clusters' band rows as new files —
    // stored band files are never rewritten; probes and counts read the
    // manifest's dir union, visible exactly at the pointer flip
    dhashBands(newClusters.select(col("rep"), col("dhash")), "rep")
      .write.parquet(s"$updated/bands")
    val servedAfter = cycle.append(updated)
    val second = probeDhashIndexBatch(s, batch, servedAfter: _*)
      .select(col("batch_media")).distinct()
    // checkpoint the one-row witness, then release the probe caches (the
    // purge-gate discipline — Verify never clears caches between gates)
    val witness = s.read.parquet(served.map(r => s"$r/bands"): _*)
      .agg((count(lit(1)) / DhBands).cast("long").as("n_history_clusters"))
      .crossJoin(batch.agg(count(lit(1)).as("n_batch")))
      .crossJoin(dups.agg(count(lit(1)).as("n_dup_batch")))
      .crossJoin(accepted.agg(count(lit(1)).as("n_accepted")))
      .crossJoin(newClusters.agg(count(lit(1)).as("n_new_clusters")))
      .crossJoin(s.read.parquet(servedAfter.map(r => s"$r/bands"): _*)
        .agg((count(lit(1)) / DhBands).cast("long").as("n_clusters_after")))
      .crossJoin(second.agg(count(lit(1)).as("n_second_pass_dup")))
      .localCheckpoint()
    accepted.unpersist(blocking = false)
    dups.unpersist(blocking = false)
    batch.unpersist(blocking = false)
    witness
  }

  private def imageDedupIndexUpdateSql = {
    val frameLen = DhRows * DhCols
    val histSql = s"${graft.operators.TextOps.h60Sql("doc_id")} % 100 < 80"
    s"""WITH d AS (
       |  SELECT doc_id, text, $histSql AS is_hist FROM documents
       |  WHERE regexp_matches(text, '^[ -~]*$$')
       |    AND length(text) >= $frameLen),
       |px AS (
       |  SELECT doc_id * 2 AS media_id, is_hist,
       |    list_transform(range($frameLen),
       |      i -> ord(substring(text, CAST(i + 1 AS INT), 1))) AS p
       |  FROM d
       |  UNION ALL
       |  SELECT doc_id * 2 + 1, is_hist,
       |    list_transform(range($frameLen),
       |      i -> least(ord(substring(text, CAST(i + 1 AS INT), 1)) + 1, 126))
       |  FROM d),
       |h AS (
       |  SELECT media_id, is_hist,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range($DhBits), k ->
       |        CASE WHEN p[(k // ${DhCols - 1}) * $DhCols + (k % ${DhCols - 1}) + 1]
       |                  > p[(k // ${DhCols - 1}) * $DhCols + (k % ${DhCols - 1}) + 2]
       |             THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)),
       |      (a, b) -> a + b) AS BIGINT) AS dhash
       |  FROM px),
       |hist AS (SELECT DISTINCT dhash FROM h WHERE is_hist),
       |b AS (SELECT media_id, dhash FROM h WHERE NOT is_hist),
       |dup AS (
       |  SELECT DISTINCT b.media_id FROM b JOIN hist x
       |    ON bit_count(xor(b.dhash, x.dhash)) <= $DhMaxHamming),
       |acc AS (
       |  SELECT * FROM b WHERE media_id NOT IN (SELECT media_id FROM dup)),
       |newc AS (SELECT DISTINCT dhash FROM acc)
       |SELECT (SELECT count(*) FROM hist) AS n_history_clusters,
       |  (SELECT count(*) FROM b) AS n_batch,
       |  (SELECT count(*) FROM dup) AS n_dup_batch,
       |  (SELECT count(*) FROM b) - (SELECT count(*) FROM dup) AS n_accepted,
       |  (SELECT count(*) FROM newc) AS n_new_clusters,
       |  (SELECT count(*) FROM hist) + (SELECT count(*) FROM newc)
       |    AS n_clusters_after,
       |  (SELECT count(*) FROM b) AS n_second_pass_dup""".stripMargin
  }

  /** Shared d/px/h/clusters/hb/bb/cand CTE prefix of the image
    * incremental-probe oracles — one spelling of the decode → dhash →
    * cluster → band-join math, so the incremental and purge oracles
    * cannot silently diverge. */
  private def dhashProbeCtePrefix: String = {
    val frameLen = DhRows * DhCols
    val histSql = s"${graft.operators.TextOps.h60Sql("doc_id")} % 100 < 80"
    s"""WITH d AS (
       |  SELECT doc_id, text, $histSql AS is_hist FROM documents
       |  WHERE regexp_matches(text, '^[ -~]*$$')
       |    AND length(text) >= $frameLen),
       |px AS (
       |  SELECT doc_id * 2 AS media_id, is_hist,
       |    list_transform(range($frameLen),
       |      i -> ord(substring(text, CAST(i + 1 AS INT), 1))) AS p
       |  FROM d
       |  UNION ALL
       |  SELECT doc_id * 2 + 1, is_hist,
       |    list_transform(range($frameLen),
       |      i -> least(ord(substring(text, CAST(i + 1 AS INT), 1)) + 1, 126))
       |  FROM d),
       |h AS (
       |  SELECT media_id, is_hist,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range($DhBits), k ->
       |        CASE WHEN p[(k // ${DhCols - 1}) * $DhCols + (k % ${DhCols - 1}) + 1]
       |                  > p[(k // ${DhCols - 1}) * $DhCols + (k % ${DhCols - 1}) + 2]
       |             THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)),
       |      (a, b) -> a + b) AS BIGINT) AS dhash
       |  FROM px),
       |clusters AS (
       |  SELECT dhash, min(media_id) AS hist_rep FROM h WHERE is_hist
       |  GROUP BY dhash),
       |hb AS (
       |  SELECT hist_rep, dhash, b,
       |    (dhash >> CAST(b * $DhBandBits AS INT)) & ${(1 << DhBandBits) - 1} AS key
       |  FROM clusters, unnest(range($DhBands)) AS u(b)),
       |bb AS (
       |  SELECT media_id AS batch_media, dhash, b,
       |    (dhash >> CAST(b * $DhBandBits AS INT)) & ${(1 << DhBandBits) - 1} AS key
       |  FROM h, unnest(range($DhBands)) AS u(b) WHERE NOT is_hist),
       |cand AS (
       |  SELECT DISTINCT x.batch_media, y.hist_rep,
       |    x.dhash AS dhash_b, y.dhash AS dhash_h
       |  FROM bb x JOIN hb y ON x.b = y.b AND x.key = y.key)""".stripMargin
  }

  private def imageDedupIncrementalSql =
    s"""$dhashProbeCtePrefix
       |SELECT batch_media, hist_rep,
       |  CAST(bit_count(xor(dhash_b, dhash_h)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(dhash_b, dhash_h)) <= $DhMaxHamming
       |ORDER BY batch_media, hist_rep""".stripMargin

  private val lastDhPurgeDir = graft.operators.TextOps.newTempDirRef()

  /** Residue of the image takedown slice — chosen to intersect the
    * incremental probe's pair set at the gate scale (the spec-level
    * non-vacuity the text family gets from PurgeSource). */
  private val ImagePurgeResidue = 6L

  private def isPurgedRep(name: String) =
    pmod(graft.operators.TextOps.h60(name), lit(10L)) === ImagePurgeResidue

  /** Right-to-be-forgotten PURGE on the stored perceptual index (X119) —
    * the image leg of the retention family, completing it across EVERY
    * stored index family (text MinHash, BM25, SRP vectors, the balance
    * MV, now the perceptual clusters): a content owner's takedown removes
    * their media's CLUSTERS from the band table — the whole cluster, by
    * design: the stored artifact derives from the removed content's
    * pixels (rep identity, dhash, band keys all come from its bytes), so
    * nothing derived from it may survive; the honest consequence,
    * documented rather than hidden, is that a future re-crawl of
    * still-licensed near-variants re-admits them as NEW clusters (exactly
    * what [[imageDedupIndexUpdate]]'s append cycle then handles).
    * Write-new-then-swap; same probe batch before and after; the witness
    * row counts the band FILE directly (n_band_rows_after =
    * [[DhBands]]·n_clusters_after — the half-purge alarm) and the oracle
    * re-derives every count from the decoded pixels through the shared
    * probe CTE prefix.
    */
  def imageIndexPurge(s: SparkSession, dir: String): DataFrame = {
    val root = dhashBuildIndex(s, dir)
    val bands = s.read.parquet(s"$root/bands")
    val updated = graft.operators.TextOps.freshTempDir(lastDhPurgeDir, "dhidx_purge")
    bands.filter(!isPurgedRep("rep")).write.parquet(s"$updated/bands")
    // cached: the decode scan feeds BOTH probes (the two-consumer rule)
    val batch = dhashHashesOf(s, batchDocs(s, dir)).cache()
    val before = probeDhashIndexBatch(s, batch, root).cache()
    val after = probeDhashIndexBatch(s, batch, updated)
    val clusters = bands.select(col("rep")).distinct()
    val out = clusters.agg(count(lit(1)).as("n_clusters"))
      .crossJoin(clusters.filter(isPurgedRep("rep"))
        .agg(count(lit(1)).as("n_purged")))
      .crossJoin(clusters.filter(!isPurgedRep("rep"))
        .agg(count(lit(1)).as("n_clusters_after")))
      .crossJoin(s.read.parquet(s"$updated/bands")
        .agg(count(lit(1)).as("n_band_rows_after")))
      .crossJoin(before.agg(count(lit(1)).as("n_pairs_before")))
      .crossJoin(before.filter(isPurgedRep("hist_rep"))
        .agg(count(lit(1)).as("n_pairs_to_purged")))
      .crossJoin(after.agg(count(lit(1)).as("n_pairs_after")))
      .localCheckpoint()
    before.unpersist(blocking = false)
    batch.unpersist(blocking = false)
    out
  }

  private def imageIndexPurgeSql = {
    val purged =
      s"${graft.operators.TextOps.h60Sql("hist_rep")} % 10 = $ImagePurgeResidue"
    s"""$dhashProbeCtePrefix,
       |pairs AS (
       |  SELECT batch_media, hist_rep FROM cand
       |  WHERE bit_count(xor(dhash_b, dhash_h)) <= $DhMaxHamming)
       |SELECT (SELECT count(*) FROM clusters) AS n_clusters,
       |  (SELECT count(*) FROM clusters WHERE $purged) AS n_purged,
       |  (SELECT count(*) FROM clusters WHERE NOT ($purged))
       |    AS n_clusters_after,
       |  $DhBands * (SELECT count(*) FROM clusters WHERE NOT ($purged))
       |    AS n_band_rows_after,
       |  (SELECT count(*) FROM pairs) AS n_pairs_before,
       |  (SELECT count(*) FROM pairs WHERE $purged) AS n_pairs_to_purged,
       |  (SELECT count(*) FROM pairs WHERE NOT ($purged)) AS n_pairs_after"""
      .stripMargin
  }

  // ------------- audio perceptual-fingerprint near-dup (energy-delta sign)

  // Fingerprint geometry matches the image family's (56 bits, 4 bands ×
  // 14): the first cut used 16 windows → 28 bits → 7-BIT band keys, and
  // its incremental probe measured 21× at the decade — 128 buckets
  // cannot discriminate a saturated signature space, the same occupancy
  // failure as the fixed-family LSH. Doubling the window count restores
  // 14-bit keys (16384 buckets) and the probe's ~3× decade.
  private val FpWins = 32
  private val FpWinLen = 4
  private val FpSamples = FpWins * FpWinLen // 128
  private val FpTrans = 28 // transitions used (of 31; 28×2 = 56 divides into bands)
  private val FpBits = FpTrans * 2 // 56: (low, high) band per transition
  private val FpBands = 4
  private val FpBandBits = FpBits / FpBands // 14
  private val FpMaxHamming = 3

  /** Encode mono 16-bit PCM as a minimal RIFF/WAVE file — the writer half
    * of [[decodeWav]]'s chunk walk (44-byte canonical header + LE
    * samples), so audio gates can run a REAL encode→decode round trip the
    * way the GIF gates do. PCM16 is lossless: every sample round-trips
    * bit-exactly through [[decodeWav]]'s `short / 32768f` normalization
    * (dyadic rationals are exact in float32), which is what lets an
    * integer fingerprint be computed from DECODER OUTPUT yet re-derived
    * independently by the oracle.
    */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(36 + dataLen).putInt(0x45564157) // RIFF size WAVE
    bb.putInt(0x20746d66).putInt(16) // fmt
    bb.putShort(1).putShort(1) // PCM, mono
    bb.putInt(sampleRate).putInt(sampleRate * 2) // byte rate
    bb.putShort(2).putShort(16) // block align, bits
    bb.putInt(0x61746164).putInt(dataLen) // data
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** The [[FpBits]]-bit energy-delta fingerprint over decoded integer
    * samples: the corpus is cut into [[FpWins]] windows of [[FpWinLen]]
    * samples, each window carries a low band (even offsets) and a high
    * band (odd offsets) energy — Σ sample² , exact integers — and bit
    * 2w+b is "band b's energy RISES across transition w" (Haitsma &
    * Kalker's robust-audio-hash bit rule, with the even/odd split
    * standing in for the filterbank since the fixture has no spectral
    * structure to separate). Signs of energy DELTAS are invariant under
    * volume scaling (every energy scales by the same v², strict
    * comparisons and ties both preserved) — the re-encode variation an
    * audio fingerprint exists to catch and a content hash cannot.
    */
  def audioFingerprint(samples: Array[Int]): Long = {
    require(samples.length >= FpSamples, s"need $FpSamples samples")
    var fp = 0L
    var k = 0
    while (k < FpBits) {
      val w = k / 2
      val band = k % 2
      def e(win: Int): Long = {
        val a = samples(win * FpWinLen + band).toLong
        val b = samples(win * FpWinLen + band + 2).toLong
        a * a + b * b
      }
      if (e(w + 1) > e(w)) fp |= (1L << k)
      k += 1
    }
    fp
  }

  /** Audio near-duplicate detection by perceptual fingerprint over
    * REALLY-decoded PCM — the audio-side dedup a multimodal pipeline runs
    * (the same role X87 plays for images): each printable-ASCII
    * document's first [[FpSamples]] chars become a mono PCM16 waveform
    * (sample = char code − 79, centered), PLUS a volume-doubled
    * "re-encode" variant (the audio analog of X87's brightness shift:
    * energy-delta SIGNS are invariant under gain, so each original/louder
    * pair shares a fingerprint exactly, while a content hash differs).
    * Both run the REAL WAV encode→decode round trip — the fingerprint is
    * computed from [[decodeWav]] output samples, not from the text — and
    * PCM16's exact round trip lets DuckDB re-derive every bit from the
    * chars alone: the bit-exact cross-engine-oracle-over-a-real-codec
    * discipline, now on the audio path.
    *
    * Output and scale shape are [[perceptualEdges]]: per-media canonical
    * star edges for fingerprint-identical media + near edges between
    * distinct fingerprints at hamming ≤ [[FpMaxHamming]] via the exact
    * pigeonhole band join ([[FpBands]]×[[FpBandBits]]). Decode+fingerprint
    * is one mapPartitions scan; everything downstream is the shared tail.
    * No reference analog (§2x extension surface).
    */
  def audioFpNearDup(s: SparkSession, dir: String): DataFrame =
    perceptualEdges(audioFpHashes(s, dir, lit(true)),
      FpBands, FpBandBits, FpMaxHamming)

  private val audioFpNearDupSql = {
    // e(w, band) over the 1-based DuckDB list: p[4w+band+1]² + p[4w+band+3]²
    def e(win: String, band: String) =
      s"(p[($win) * $FpWinLen + ($band) + 1] * p[($win) * $FpWinLen + ($band) + 1]" +
        s" + p[($win) * $FpWinLen + ($band) + 3] * p[($win) * $FpWinLen + ($band) + 3])"
    s"""WITH d AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE regexp_matches(text, '^[ -~]*$$')
       |    AND length(text) >= $FpSamples),
       |px AS (
       |  SELECT doc_id * 2 AS media_id,
       |    list_transform(range($FpSamples),
       |      i -> ord(substring(text, CAST(i + 1 AS INT), 1)) - 79) AS p
       |  FROM d
       |  UNION ALL
       |  SELECT doc_id * 2 + 1,
       |    list_transform(range($FpSamples),
       |      i -> (ord(substring(text, CAST(i + 1 AS INT), 1)) - 79) * 2)
       |  FROM d),
       |h AS (
       |  SELECT media_id,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range($FpBits), k ->
       |        CASE WHEN ${e("k // 2 + 1", "k % 2")} > ${e("k // 2", "k % 2")}
       |             THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)),
       |      (a, b) -> a + b) AS BIGINT) AS fp
       |  FROM px),
       |clusters AS (
       |  SELECT fp, min(media_id) AS rep FROM h GROUP BY fp),
       |exact_edges AS (
       |  SELECT c.rep AS media_a, h.media_id AS media_b,
       |    CAST(0 AS BIGINT) AS hamming
       |  FROM h JOIN clusters c ON h.fp = c.fp
       |  WHERE h.media_id <> c.rep),
       |bands AS (
       |  SELECT rep, fp, b,
       |    (fp >> CAST(b * $FpBandBits AS INT)) & ${(1 << FpBandBits) - 1} AS key
       |  FROM clusters, unnest(range($FpBands)) AS u(b)),
       |cand AS (
       |  SELECT DISTINCT x.rep AS media_a, y.rep AS media_b,
       |    x.fp AS fp_a, y.fp AS fp_b
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.key = y.key AND x.rep < y.rep),
       |near_edges AS (
       |  SELECT media_a, media_b,
       |    CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
       |  FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= $FpMaxHamming)
       |SELECT media_a, media_b, hamming FROM exact_edges
       |UNION ALL
       |SELECT media_a, media_b, hamming FROM near_edges
       |ORDER BY media_a, media_b""".stripMargin
  }

  /** The day's crawl batch MATERIALIZED as landed files, once per JVM —
    * the production shape an incremental probe consumes: a batch arrives
    * as its own (small) files; it is never re-derived by filtering the
    * whole lake. Before this fixture the audio incremental probe re-paid
    * a FULL documents scan per run and measured 7.43× at the decade where
    * the streaming door — which reads its pre-materialized batch files —
    * ran 2.98× on the SAME probe spelling; the fixture removes exactly
    * that re-paid lake scan. buildPerJvm, not writeOnce: the
    * history/batch split is a code-side convention, and a cross-run cache
    * would go stale if it moved. */
  private[graft] def batchDocs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.JournalGate.{buildPerJvm, fixtureRoot}
    val root = buildPerJvm(fixtureRoot("mmbatch", dir)) { tmp =>
      Tables.load(s, dir, "documents")
        .filter(!graft.operators.TextOps.isHistoryDoc)
        .select(col("doc_id"), col("text"))
        .write.parquet(tmp.toString)
    }
    s.read.parquet(root.toString)
  }

  /** The decode+fingerprint stage of [[audioFpNearDup]] with a document
    * filter — shared by the one-shot gate, the index build, and the
    * incremental probe (the [[dhashHashes]] discipline on the audio
    * path). Pure map, no shuffle. */
  private[graft] def audioFpHashes(s: SparkSession, dir: String,
                                   docFilter: Column): DataFrame =
    audioFpHashesOf(s, Tables.load(s, dir, "documents").filter(docFilter))

  /** [[audioFpHashes]] over a caller-supplied documents frame — the form
    * the streaming front door feeds micro-batches through; applies the
    * eligibility filter itself so every door fingerprints identically. */
  private[graft] def audioFpHashesOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs
      .filter(col("text").rlike("\\A[ -~]*\\z") &&
        length(col("text")) >= FpSamples)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val codes = Array.tabulate(FpSamples)(i => text.charAt(i) - 79)
          Seq((id * 2, 1), (id * 2 + 1, 2)).map { case (mediaId, vol) =>
            val pcm = codes.map(c => (c * vol).toShort)
            val wav = encodeWavPcm16(pcm, 8000)
            val decoded = decodeWav(wav).samples
              .map(f => math.round(f * 32768f))
            (mediaId, audioFingerprint(decoded))
          }
        }
      }
      .toDF("media_id", "fp")
  }

  /** Explode a fingerprint frame into its [[FpBands]] (band, key) rows —
    * one banding spelling for the audio gate, index build, and probe. */
  private def audioFpBands(hashes: DataFrame, idCol: String): DataFrame =
    hashes.select(col(idCol), col("fp"),
        explode(expr(s"transform(sequence(0, ${FpBands - 1}), " +
          s"b -> struct(b AS band, " +
          s"shiftright(fp, b * $FpBandBits) & ${(1 << FpBandBits) - 1} AS key))"))
          .as("bk"))
      .select(col(idCol), col("fp"),
        col("bk.band").as("band"), col("bk.key").as("key"))

  /** Materialize the audio fingerprint cluster-band index ONCE per JVM —
    * the audio-side serve split ([[dhashBuildIndex]]'s discipline): the
    * lake is decoded and fingerprinted once, `bands/` stores the bucket
    * rows of every DISTINCT history fingerprint. */
  def audioFpBuildIndex(s: SparkSession, dir: String): String = {
    import graft.operators.JournalGate.{buildPerJvm, fixtureRoot}
    buildPerJvm(fixtureRoot("afidx", dir)) { tmp =>
      val clusters = audioFpHashes(s, dir, graft.operators.TextOps.isHistoryDoc)
        .groupBy("fp").agg(min("media_id").as("rep"))
      audioFpBands(clusters.select(col("rep"), col("fp")), "rep")
        .write.parquet(s"$tmp/bands")
    }.toString
  }

  /** Incremental audio near-dup of a fresh crawl batch AGAINST the stored
    * fingerprint index — [[imageDedupIncremental]]'s contract on the audio
    * path: the batch decodes and fingerprints ONLY its own media (the
    * plan's one WAV round-trip subtree), probes the stored cluster bands,
    * verifies with codegen'd bit_count; history is never re-decoded.
    * Output (batch_media, hist_rep, hamming ≤ [[FpMaxHamming]]). Exact by
    * the same pigeonhole; oracle = all-pairs batch×cluster hamming with
    * every bit re-derived from chars. */
  def audioDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val root = audioFpBuildIndex(s, dir)
    val batch = audioFpHashesOf(s, batchDocs(s, dir))
    probeAudioFpIndexBatch(s, batch, root).orderBy("batch_media", "hist_rep")
  }

  /** The probe tail of [[audioDedupIncremental]] — streaming-safe for the
    * same reasons as [[probeDhashIndex]]; one spelling for both front
    * doors, which therefore share one oracle. */
  private[graft] def probeAudioFpIndex(s: SparkSession, hashes: DataFrame,
                                       root: String): DataFrame =
    audioFpBands(hashes, "media_id")
      .toDF("batch_media", "fp_b", "band", "key")
      .join(s.read.parquet(s"$root/bands")
        .toDF("hist_rep", "fp_h", "band", "key"), Seq("band", "key"))
      .dropDuplicates(Seq("batch_media", "hist_rep"))
      .withColumn("hamming",
        expr("bit_count(fp_b ^ fp_h)").cast("long"))
      .filter(col("hamming") <= FpMaxHamming)
      .select(col("batch_media"), col("hist_rep"), col("hamming"))

  /** [[probeDhashIndexBatch]]'s reshape on the audio path: batch media
    * collapse per DISTINCT fingerprint before the band join (the
    * energy-delta space saturates hardest of the three, so this is where
    * the distinct-key reshape pays most), fan-out after the verify;
    * the streaming door keeps [[probeAudioFpIndex]]'s per-media carry. */
  private[graft] def probeAudioFpIndexBatch(s: SparkSession, hashes: DataFrame,
                                            roots: String*): DataFrame =
    audioFpBands(hashes.toDF("media_id", "fp")
        .groupBy(col("fp")).agg(collect_list(col("media_id")).as("ms")),
        "ms")
      .toDF("ms", "fp_b", "band", "key")
      .join(s.read.parquet(roots.map(r => s"$r/bands"): _*)
        .toDF("hist_rep", "fp_h", "band", "key"), Seq("band", "key"))
      .dropDuplicates(Seq("fp_b", "hist_rep"))
      .withColumn("hamming",
        expr("bit_count(fp_b ^ fp_h)").cast("long"))
      .filter(col("hamming") <= FpMaxHamming)
      .select(explode(col("ms")).as("batch_media"), col("hist_rep"),
        col("hamming"))

  /** q_audio_dedup_incremental's oracle, shared with the streaming gate. */
  private[graft] def audioDedupIncrementalOracle: String =
    audioDedupIncrementalSql

  /** Shared CTE prefix (through `cand`) of the audio probe oracles. */
  private def audioProbeCtePrefix = {
    def e(win: String, band: String) =
      s"(p[($win) * $FpWinLen + ($band) + 1] * p[($win) * $FpWinLen + ($band) + 1]" +
        s" + p[($win) * $FpWinLen + ($band) + 3] * p[($win) * $FpWinLen + ($band) + 3])"
    val histSql = s"${graft.operators.TextOps.h60Sql("doc_id")} % 100 < 80"
    s"""WITH d AS (
       |  SELECT doc_id, text, $histSql AS is_hist FROM documents
       |  WHERE regexp_matches(text, '^[ -~]*$$')
       |    AND length(text) >= $FpSamples),
       |px AS (
       |  SELECT doc_id * 2 AS media_id, is_hist,
       |    list_transform(range($FpSamples),
       |      i -> ord(substring(text, CAST(i + 1 AS INT), 1)) - 79) AS p
       |  FROM d
       |  UNION ALL
       |  SELECT doc_id * 2 + 1, is_hist,
       |    list_transform(range($FpSamples),
       |      i -> (ord(substring(text, CAST(i + 1 AS INT), 1)) - 79) * 2)
       |  FROM d),
       |h AS (
       |  SELECT media_id, is_hist,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range($FpBits), k ->
       |        CASE WHEN ${e("k // 2 + 1", "k % 2")} > ${e("k // 2", "k % 2")}
       |             THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)),
       |      (a, b) -> a + b) AS BIGINT) AS fp
       |  FROM px),
       |clusters AS (
       |  SELECT fp, min(media_id) AS hist_rep FROM h WHERE is_hist
       |  GROUP BY fp),
       |hb AS (
       |  SELECT hist_rep, fp, b,
       |    (fp >> CAST(b * $FpBandBits AS INT)) & ${(1 << FpBandBits) - 1} AS key
       |  FROM clusters, unnest(range($FpBands)) AS u(b)),
       |bb AS (
       |  SELECT media_id AS batch_media, fp, b,
       |    (fp >> CAST(b * $FpBandBits AS INT)) & ${(1 << FpBandBits) - 1} AS key
       |  FROM h, unnest(range($FpBands)) AS u(b) WHERE NOT is_hist),
       |cand AS (
       |  SELECT DISTINCT x.batch_media, y.hist_rep,
       |    x.fp AS fp_b, y.fp AS fp_h
       |  FROM bb x JOIN hb y ON x.b = y.b AND x.key = y.key)""".stripMargin
  }

  private def audioDedupIncrementalSql =
    s"""$audioProbeCtePrefix
       |SELECT batch_media, hist_rep,
       |  CAST(bit_count(xor(fp_b, fp_h)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(fp_b, fp_h)) <= $FpMaxHamming
       |ORDER BY batch_media, hist_rep""".stripMargin

  private val lastAfPurgeDir = graft.operators.TextOps.newTempDirRef()

  /** [[imageIndexPurge]]'s contract on the audio fingerprint index —
    * same takedown slice, same cluster-deletion semantics (the stored
    * fingerprint derives from the removed audio's samples), same
    * band-FILE half-purge alarm at [[FpBands]] rows per cluster. */
  def audioIndexPurge(s: SparkSession, dir: String): DataFrame = {
    val root = audioFpBuildIndex(s, dir)
    val bands = s.read.parquet(s"$root/bands")
    val updated =
      graft.operators.TextOps.freshTempDir(lastAfPurgeDir, "afidx_purge")
    bands.filter(!isPurgedRep("rep")).write.parquet(s"$updated/bands")
    val batch = audioFpHashesOf(s, batchDocs(s, dir)).cache()
    val before = probeAudioFpIndexBatch(s, batch, root).cache()
    val after = probeAudioFpIndexBatch(s, batch, updated)
    val clusters = bands.select(col("rep")).distinct()
    val out = clusters.agg(count(lit(1)).as("n_clusters"))
      .crossJoin(clusters.filter(isPurgedRep("rep"))
        .agg(count(lit(1)).as("n_purged")))
      .crossJoin(clusters.filter(!isPurgedRep("rep"))
        .agg(count(lit(1)).as("n_clusters_after")))
      .crossJoin(s.read.parquet(s"$updated/bands")
        .agg(count(lit(1)).as("n_band_rows_after")))
      .crossJoin(before.agg(count(lit(1)).as("n_pairs_before")))
      .crossJoin(before.filter(isPurgedRep("hist_rep"))
        .agg(count(lit(1)).as("n_pairs_to_purged")))
      .crossJoin(after.agg(count(lit(1)).as("n_pairs_after")))
      .localCheckpoint()
    before.unpersist(blocking = false)
    batch.unpersist(blocking = false)
    out
  }

  private def audioIndexPurgeSql = {
    val purged =
      s"${graft.operators.TextOps.h60Sql("hist_rep")} % 10 = $ImagePurgeResidue"
    s"""$audioProbeCtePrefix,
       |pairs AS (
       |  SELECT batch_media, hist_rep FROM cand
       |  WHERE bit_count(xor(fp_b, fp_h)) <= $FpMaxHamming)
       |SELECT (SELECT count(*) FROM clusters) AS n_clusters,
       |  (SELECT count(*) FROM clusters WHERE $purged) AS n_purged,
       |  (SELECT count(*) FROM clusters WHERE NOT ($purged))
       |    AS n_clusters_after,
       |  $FpBands * (SELECT count(*) FROM clusters WHERE NOT ($purged))
       |    AS n_band_rows_after,
       |  (SELECT count(*) FROM pairs) AS n_pairs_before,
       |  (SELECT count(*) FROM pairs WHERE $purged) AS n_pairs_to_purged,
       |  (SELECT count(*) FROM pairs WHERE NOT ($purged)) AS n_pairs_after"""
      .stripMargin
  }

  // --------- video (multi-frame) near-dup: per-frame dHash sequences

  private val VidMaxFrames = 4
  private val VidMinFrames = 2

  /** Video near-duplicate detection over REALLY-decoded multi-frame
    * containers — the temporal extension of [[imageDhashNearDup]]: each
    * eligible document's chars become [[VidMinFrames]]..[[VidMaxFrames]]
    * 8×8 frames encoded into ONE animated GIF (plus the brightness-
    * shifted re-crawl variant), the container decodes back through the
    * real multi-frame reader, and the video signature is the ORDERED
    * sequence of per-frame dHashes. Two videos are near-dups when they
    * have the same frame count and EVERY aligned frame pair is within
    * hamming ≤ [[DhMaxHamming]] — the aligned-frame rule every
    * frame-signature video dedup starts from (Coskun et al.'s spatial/
    * temporal hash framing).
    *
    * Scale shape — the X87 lesson applied temporally, twice:
    * (1) signature-identical videos collapse through ONE sequence-cluster
    * aggregation into per-media star edges (≤1 row per media);
    * (2) near candidates between DISTINCT signatures come from a
    * COMPOSITE band join: a qualifying pair's frame 0 differs by ≤3 bits
    * (shares ≥1 of its 4 bands) AND frame 1 likewise, so the pair shares
    * at least one of the 16 (band0-key, band1-key) COMPOSITE keys —
    * still exact by the pigeonhole PRODUCT, while composite occupancy is
    * the product of two frames' band occupancies, which tames the
    * single-frame saturation that made the X87 first cut quadratic.
    * Verify is per-frame bit_count over the zipped sequences (all ≤
    * [[DhMaxHamming]]); output hamming is the total across frames.
    * No reference analog (§2x extension surface).
    */
  /** The multi-frame decode+hash stage of [[videoDhashNearDup]] with a
    * document filter — shared by the one-shot gate, the index build, and
    * the incremental probe. Pure map, no shuffle: each media encodes its
    * frames into ONE animated GIF, decodes back through the real
    * multi-frame reader, and emits the ordered frame-dHash sequence. */
  private[graft] def videoHashes(s: SparkSession, dir: String,
                                 docFilter: Column): DataFrame =
    videoHashesOf(s, Tables.load(s, dir, "documents").filter(docFilter))

  /** [[videoHashes]] over a caller-supplied documents frame — the
    * streaming-door form; applies the eligibility filter itself. */
  private[graft] def videoHashesOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val frameLen = DhRows * DhCols
    val minLen = VidMinFrames * frameLen
    docs
      .filter(col("text").rlike("\\A[ -~]*\\z") &&
        length(col("text")) >= minLen)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val nFrames = math.min(VidMaxFrames, text.length / frameLen)
          val base = (0 until nFrames).map(f =>
            text.substring(f * frameLen, (f + 1) * frameLen)
              .getBytes("US-ASCII"))
          val shifted = base.map(_.map(b => math.min(b + 1, 126).toByte))
          Seq((id * 2, base), (id * 2 + 1, shifted)).map {
            case (mediaId, frames) =>
              val gif = encodeGifGray(frames, DhCols, DhRows)
              val decoded = decodeGifFrames(gif)
              val fhs = decoded.map { img =>
                var h = 0L
                var k = 0
                while (k < DhBits) {
                  val r = k / (DhCols - 1)
                  val c = k % (DhCols - 1)
                  val left = img.pixels((r * DhCols + c) * 3) & 0xff
                  val right = img.pixels((r * DhCols + c + 1) * 3) & 0xff
                  if (left > right) h |= (1L << k)
                  k += 1
                }
                h
              }.toArray
              (mediaId, nFrames, fhs)
          }
        }
      }
      .toDF("media_id", "n_frames", "fhs")
  }

  /** Explode a video-signature frame into its 16 composite
    * (frame0-band, frame1-band) candidate keys — one spelling for the
    * in-plan gate, the index build, and the probe. */
  private def videoKeys(sigs: DataFrame, idCol: String): DataFrame = {
    val mask = (1 << DhBandBits) - 1
    sigs.select(col(idCol), col("n_frames"), col("fhs"),
        explode(expr(
          s"""flatten(transform(sequence(0, ${DhBands - 1}), b0 ->
             |  transform(sequence(0, ${DhBands - 1}), b1 -> struct(
             |    b0 AS b0,
             |    shiftright(fhs[0], b0 * $DhBandBits) & $mask AS k0,
             |    b1 AS b1,
             |    shiftright(fhs[1], b1 * $DhBandBits) & $mask AS k1))))"""
            .stripMargin)).as("ck"))
      .select(col(idCol), col("n_frames"), col("fhs"),
        col("ck.b0").as("b0"), col("ck.k0").as("k0"),
        col("ck.b1").as("b1"), col("ck.k1").as("k1"))
  }

  def videoDhashNearDup(s: SparkSession, dir: String): DataFrame = {
    // feeds the sequence-cluster agg AND the assignment join-back
    val hashes = videoHashes(s, dir, lit(true)).cache()
    val clusters = hashes.groupBy("n_frames", "fhs")
      .agg(min("media_id").as("rep"))
    val exactEdges = hashes.join(clusters, Seq("n_frames", "fhs"))
      .filter(col("media_id") =!= col("rep"))
      .select(col("rep").as("media_a"), col("media_id").as("media_b"),
        lit(0L).as("hamming"))
    val keys = videoKeys(clusters.select(col("rep"), col("n_frames"),
      col("fhs")), "rep")
    val a = keys.toDF("media_a", "n_frames", "fhs_a", "b0", "k0", "b1", "k1")
    val b = keys.toDF("media_b", "n_frames", "fhs_b", "b0", "k0", "b1", "k1")
    val nearEdges = a.join(b, Seq("n_frames", "b0", "k0", "b1", "k1"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"), col("fhs_a"), col("fhs_b"))
      .distinct()
      .withColumn("per", expr(
        "zip_with(fhs_a, fhs_b, (x, y) -> bit_count(x ^ y))"))
      .filter(expr(s"array_max(per) <= $DhMaxHamming"))
      .withColumn("hamming",
        expr("aggregate(per, 0L, (acc, x) -> acc + x)"))
      .select(col("media_a"), col("media_b"), col("hamming"))
    // same cache discipline as perceptualEdges: checkpoint, then release
    val out = exactEdges.unionAll(nearEdges)
      .orderBy("media_a", "media_b").localCheckpoint()
    hashes.unpersist(blocking = false)
    out
  }

  private val videoDhashNearDupSql = {
    val frameLen = DhRows * DhCols
    val minLen = VidMinFrames * frameLen
    val mask = (1 << DhBandBits) - 1
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |    least($VidMaxFrames, length(text) // $frameLen) AS n_frames
       |  FROM documents
       |  WHERE regexp_matches(text, '^[ -~]*$$')
       |    AND length(text) >= $minLen),
       |px AS (
       |  SELECT doc_id * 2 AS media_id, n_frames,
       |    list_transform(range(n_frames * $frameLen),
       |      i -> ord(substring(text, CAST(i + 1 AS INT), 1))) AS p
       |  FROM d
       |  UNION ALL
       |  SELECT doc_id * 2 + 1, n_frames,
       |    list_transform(range(n_frames * $frameLen),
       |      i -> least(ord(substring(text, CAST(i + 1 AS INT), 1)) + 1, 126))
       |  FROM d),
       |h AS (
       |  SELECT media_id, n_frames,
       |    list_transform(range(n_frames), f ->
       |      CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(range($DhBits), k ->
       |          CASE WHEN p[f * $frameLen + (k // ${DhCols - 1}) * $DhCols + (k % ${DhCols - 1}) + 1]
       |                    > p[f * $frameLen + (k // ${DhCols - 1}) * $DhCols + (k % ${DhCols - 1}) + 2]
       |               THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)),
       |        (a, b) -> a + b) AS BIGINT)) AS fhs
       |  FROM px),
       |clusters AS (
       |  SELECT n_frames, fhs, min(media_id) AS rep FROM h
       |  GROUP BY n_frames, fhs),
       |exact_edges AS (
       |  SELECT c.rep AS media_a, h.media_id AS media_b,
       |    CAST(0 AS BIGINT) AS hamming
       |  FROM h JOIN clusters c ON h.n_frames = c.n_frames AND h.fhs = c.fhs
       |  WHERE h.media_id <> c.rep),
       |keys AS (
       |  SELECT rep, n_frames, fhs, b0, b1,
       |    (fhs[1] >> CAST(b0 * $DhBandBits AS INT)) & $mask AS k0,
       |    (fhs[2] >> CAST(b1 * $DhBandBits AS INT)) & $mask AS k1
       |  FROM clusters,
       |    unnest(range($DhBands)) AS u0(b0), unnest(range($DhBands)) AS u1(b1)),
       |cand AS (
       |  SELECT DISTINCT x.rep AS media_a, y.rep AS media_b,
       |    x.fhs AS fhs_a, y.fhs AS fhs_b, x.n_frames AS n_frames
       |  FROM keys x JOIN keys y
       |    ON x.n_frames = y.n_frames AND x.b0 = y.b0 AND x.k0 = y.k0
       |      AND x.b1 = y.b1 AND x.k1 = y.k1 AND x.rep < y.rep),
       |verified AS (
       |  SELECT media_a, media_b,
       |    list_transform(range(n_frames),
       |      f -> bit_count(xor(fhs_a[f + 1], fhs_b[f + 1]))) AS per
       |  FROM cand),
       |near_edges AS (
       |  SELECT media_a, media_b,
       |    CAST(list_sum(per) AS BIGINT) AS hamming
       |  FROM verified WHERE list_max(per) <= $DhMaxHamming)
       |SELECT media_a, media_b, hamming FROM exact_edges
       |UNION ALL
       |SELECT media_a, media_b, hamming FROM near_edges
       |ORDER BY media_a, media_b""".stripMargin
  }

  /** Materialize the video signature index ONCE per JVM — the video-side
    * serve split: `keys/` stores the 16 composite candidate rows of every
    * DISTINCT history signature (sequence + frame count ride along for
    * the verify), so a probe joins composite keys and never re-decodes
    * the lake. */
  def videoBuildIndex(s: SparkSession, dir: String): String = {
    import graft.operators.JournalGate.{buildPerJvm, fixtureRoot}
    buildPerJvm(fixtureRoot("vdidx", dir)) { tmp =>
      val clusters = videoHashes(s, dir, graft.operators.TextOps.isHistoryDoc)
        .groupBy("n_frames", "fhs").agg(min("media_id").as("rep"))
      videoKeys(clusters.select(col("rep"), col("n_frames"), col("fhs")),
          "rep")
        .write.parquet(s"$tmp/keys")
    }.toString
  }

  /** Incremental video near-dup of a fresh crawl batch AGAINST the stored
    * signature index — [[imageDedupIncremental]]'s contract on the
    * temporal path: the batch decodes ONLY its own containers (one
    * MapPartitions subtree), joins the stored composite keys, and
    * verifies all aligned frames ≤ [[DhMaxHamming]] with the zipped
    * bit_count. Output (batch_media, hist_rep, hamming = total across
    * frames). */
  def videoDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val root = videoBuildIndex(s, dir)
    val batch = videoHashesOf(s, batchDocs(s, dir))
    probeVideoIndexBatch(s, batch, root).orderBy("batch_media", "hist_rep")
  }

  /** The probe tail of [[videoDedupIncremental]] — streaming-safe for the
    * same reasons as [[probeDhashIndex]]; one spelling for both front
    * doors, which therefore share one oracle. */
  private[graft] def probeVideoIndex(s: SparkSession, sigs: DataFrame,
                                     root: String): DataFrame =
    videoKeys(sigs, "media_id")
      .toDF("batch_media", "n_frames", "fhs_b", "b0", "k0", "b1", "k1")
      .join(s.read.parquet(s"$root/keys")
          .toDF("hist_rep", "n_frames", "fhs_h", "b0", "k0", "b1", "k1"),
        Seq("n_frames", "b0", "k0", "b1", "k1"))
      .dropDuplicates(Seq("batch_media", "hist_rep"))
      .withColumn("per", expr(
        "zip_with(fhs_b, fhs_h, (x, y) -> bit_count(x ^ y))"))
      .filter(expr(s"array_max(per) <= $DhMaxHamming"))
      .withColumn("hamming",
        expr("aggregate(per, 0L, (acc, x) -> acc + x)"))
      .select(col("batch_media"), col("hist_rep"), col("hamming"))

  /** [[probeDhashIndexBatch]]'s reshape on the temporal path: batch media
    * collapse per DISTINCT (n_frames, frame-hash-sequence) signature
    * before the composite-key join, fan-out after the zipped per-frame
    * verify; the streaming door keeps [[probeVideoIndex]]'s per-media
    * carry. */
  private[graft] def probeVideoIndexBatch(s: SparkSession, sigs: DataFrame,
                                          roots: String*): DataFrame =
    videoKeys(sigs.groupBy(col("n_frames"), col("fhs"))
        .agg(collect_list(col("media_id")).as("ms")), "ms")
      .toDF("ms", "n_frames", "fhs_b", "b0", "k0", "b1", "k1")
      .join(s.read.parquet(roots.map(r => s"$r/keys"): _*)
          .toDF("hist_rep", "n_frames", "fhs_h", "b0", "k0", "b1", "k1"),
        Seq("n_frames", "b0", "k0", "b1", "k1"))
      .dropDuplicates(Seq("fhs_b", "hist_rep"))
      .withColumn("per", expr(
        "zip_with(fhs_b, fhs_h, (x, y) -> bit_count(x ^ y))"))
      .filter(expr(s"array_max(per) <= $DhMaxHamming"))
      .withColumn("hamming",
        expr("aggregate(per, 0L, (acc, x) -> acc + x)"))
      .select(explode(col("ms")).as("batch_media"), col("hist_rep"),
        col("hamming"))

  /** q_video_dedup_incremental's oracle, shared with the streaming gate. */
  private[graft] def videoDedupIncrementalOracle: String =
    videoDedupIncrementalSql

  /** Shared CTE prefix (through `verified`) of the video probe oracles. */
  private def videoProbeCtePrefix = {
    val frameLen = DhRows * DhCols
    val minLen = VidMinFrames * frameLen
    val mask = (1 << DhBandBits) - 1
    val histSql = s"${graft.operators.TextOps.h60Sql("doc_id")} % 100 < 80"
    s"""WITH d AS (
       |  SELECT doc_id, text, $histSql AS is_hist,
       |    least($VidMaxFrames, length(text) // $frameLen) AS n_frames
       |  FROM documents
       |  WHERE regexp_matches(text, '^[ -~]*$$')
       |    AND length(text) >= $minLen),
       |px AS (
       |  SELECT doc_id * 2 AS media_id, n_frames, is_hist,
       |    list_transform(range(n_frames * $frameLen),
       |      i -> ord(substring(text, CAST(i + 1 AS INT), 1))) AS p
       |  FROM d
       |  UNION ALL
       |  SELECT doc_id * 2 + 1, n_frames, is_hist,
       |    list_transform(range(n_frames * $frameLen),
       |      i -> least(ord(substring(text, CAST(i + 1 AS INT), 1)) + 1, 126))
       |  FROM d),
       |h AS (
       |  SELECT media_id, n_frames, is_hist,
       |    list_transform(range(n_frames), f ->
       |      CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(range($DhBits), k ->
       |          CASE WHEN p[f * $frameLen + (k // ${DhCols - 1}) * $DhCols + (k % ${DhCols - 1}) + 1]
       |                    > p[f * $frameLen + (k // ${DhCols - 1}) * $DhCols + (k % ${DhCols - 1}) + 2]
       |               THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)),
       |        (a, b) -> a + b) AS BIGINT)) AS fhs
       |  FROM px),
       |clusters AS (
       |  SELECT n_frames, fhs, min(media_id) AS hist_rep FROM h
       |  WHERE is_hist GROUP BY n_frames, fhs),
       |hk AS (
       |  SELECT hist_rep, n_frames, fhs, b0, b1,
       |    (fhs[1] >> CAST(b0 * $DhBandBits AS INT)) & $mask AS k0,
       |    (fhs[2] >> CAST(b1 * $DhBandBits AS INT)) & $mask AS k1
       |  FROM clusters,
       |    unnest(range($DhBands)) AS u0(b0), unnest(range($DhBands)) AS u1(b1)),
       |bk AS (
       |  SELECT media_id AS batch_media, n_frames, fhs, b0, b1,
       |    (fhs[1] >> CAST(b0 * $DhBandBits AS INT)) & $mask AS k0,
       |    (fhs[2] >> CAST(b1 * $DhBandBits AS INT)) & $mask AS k1
       |  FROM h,
       |    unnest(range($DhBands)) AS u0(b0), unnest(range($DhBands)) AS u1(b1)
       |  WHERE NOT is_hist),
       |cand AS (
       |  SELECT DISTINCT x.batch_media, y.hist_rep,
       |    x.fhs AS fhs_b, y.fhs AS fhs_h, x.n_frames AS n_frames
       |  FROM bk x JOIN hk y
       |    ON x.n_frames = y.n_frames AND x.b0 = y.b0 AND x.k0 = y.k0
       |      AND x.b1 = y.b1 AND x.k1 = y.k1),
       |verified AS (
       |  SELECT batch_media, hist_rep,
       |    list_transform(range(n_frames),
       |      f -> bit_count(xor(fhs_b[f + 1], fhs_h[f + 1]))) AS per
       |  FROM cand)""".stripMargin
  }

  private def videoDedupIncrementalSql =
    s"""$videoProbeCtePrefix
       |SELECT batch_media, hist_rep, CAST(list_sum(per) AS BIGINT) AS hamming
       |FROM verified WHERE list_max(per) <= $DhMaxHamming
       |ORDER BY batch_media, hist_rep""".stripMargin

  private val lastVdPurgeDir = graft.operators.TextOps.newTempDirRef()

  /** [[imageIndexPurge]]'s contract on the video signature index — the
    * last modality leg: cluster deletion over the composite-key table
    * (the stored frame-hash SEQUENCE derives from the removed video's
    * frames), half-purge alarm at [[DhBands]]² composite rows per
    * cluster. */
  def videoIndexPurge(s: SparkSession, dir: String): DataFrame = {
    val root = videoBuildIndex(s, dir)
    val keys = s.read.parquet(s"$root/keys")
    val updated =
      graft.operators.TextOps.freshTempDir(lastVdPurgeDir, "vdidx_purge")
    keys.filter(!isPurgedRep("rep")).write.parquet(s"$updated/keys")
    val batch =
      videoHashesOf(s, batchDocs(s, dir)).cache()
    val before = probeVideoIndexBatch(s, batch, root).cache()
    val after = probeVideoIndexBatch(s, batch, updated)
    val clusters = keys.select(col("rep")).distinct()
    val out = clusters.agg(count(lit(1)).as("n_clusters"))
      .crossJoin(clusters.filter(isPurgedRep("rep"))
        .agg(count(lit(1)).as("n_purged")))
      .crossJoin(clusters.filter(!isPurgedRep("rep"))
        .agg(count(lit(1)).as("n_clusters_after")))
      .crossJoin(s.read.parquet(s"$updated/keys")
        .agg(count(lit(1)).as("n_key_rows_after")))
      .crossJoin(before.agg(count(lit(1)).as("n_pairs_before")))
      .crossJoin(before.filter(isPurgedRep("hist_rep"))
        .agg(count(lit(1)).as("n_pairs_to_purged")))
      .crossJoin(after.agg(count(lit(1)).as("n_pairs_after")))
      .localCheckpoint()
    before.unpersist(blocking = false)
    batch.unpersist(blocking = false)
    out
  }

  private def videoIndexPurgeSql = {
    val purged =
      s"${graft.operators.TextOps.h60Sql("hist_rep")} % 10 = $ImagePurgeResidue"
    s"""$videoProbeCtePrefix,
       |pairs AS (
       |  SELECT batch_media, hist_rep FROM verified
       |  WHERE list_max(per) <= $DhMaxHamming)
       |SELECT (SELECT count(*) FROM clusters) AS n_clusters,
       |  (SELECT count(*) FROM clusters WHERE $purged) AS n_purged,
       |  (SELECT count(*) FROM clusters WHERE NOT ($purged))
       |    AS n_clusters_after,
       |  ${DhBands * DhBands} * (SELECT count(*) FROM clusters
       |                          WHERE NOT ($purged)) AS n_key_rows_after,
       |  (SELECT count(*) FROM pairs) AS n_pairs_before,
       |  (SELECT count(*) FROM pairs WHERE $purged) AS n_pairs_to_purged,
       |  (SELECT count(*) FROM pairs WHERE NOT ($purged)) AS n_pairs_after"""
      .stripMargin
  }

  // ------------- cross-modality incremental curation funnel (daily batch)

  /** The cross-MODALITY composition of the serve splits — the multimodal
    * analog of the text curation pipeline (X84): one daily crawl batch is
    * deduplicated against the lake on EVERY modality it carries, each leg
    * probing its own STORED index (text MinHash bands+sets, image dHash
    * cluster bands, audio fingerprint bands, video composite keys), and
    * the output is the per-source ingest funnel n_in → n_after_text →
    * n_after_image → n_after_audio → n_after_video — exact integers, the
    * numbers an ingest dashboard actually shows.
    *
    * Shape: the four probes are INDEPENDENT plan branches over the same
    * batch (each is its modality's PlanSpec-pinned batch-only serve path;
    * nothing in the lake is re-signed or re-decoded), and the funnel is
    * set algebra on their verdicts — a left join of the batch against
    * four dup-doc sets and one aggregation, so composition adds no new
    * scan of anything. A doc too short for a modality can never be
    * flagged by it (the per-leg eligibility filters, replicated by the
    * oracle). Serve cost = Σ per-modality batch probes, independent of
    * lake size — the X84 eval-fixed claim, now holding across modalities.
    *
    * Oracle: the four modality oracles run UNCHANGED as nested
    * subqueries (their own WITH scopes) and the funnel algebra is
    * re-derived on top — so each leg's verdict handoff into the funnel is
    * verified, not just the final counts' plausibility.
    */
  def multimodalCurationServe(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextOps
    val batch = Tables.load(s, dir, "documents")
      .filter(!TextOps.isHistoryDoc)
      .select(col("doc_id"), col("source"))
    def docSet(df: DataFrame, flag: String): DataFrame =
      df.select(expr("shiftright(batch_media, 1)").as("doc_id"))
        .distinct().withColumn(flag, lit(true))
    val textDups = TextOps.dedupIncremental(s, dir)
      .select(col("batch_doc").as("doc_id")).distinct()
      .withColumn("t", lit(true))
    val imgDups = docSet(imageDedupIncremental(s, dir), "i")
    val audDups = docSet(audioDedupIncremental(s, dir), "a")
    val vidDups = docSet(videoDedupIncremental(s, dir), "v")
    batch.join(textDups, Seq("doc_id"), "left")
      .join(imgDups, Seq("doc_id"), "left")
      .join(audDups, Seq("doc_id"), "left")
      .join(vidDups, Seq("doc_id"), "left")
      .na.fill(false, Seq("t", "i", "a", "v"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_in"),
        sum(when(!col("t"), 1L).otherwise(0L)).as("n_after_text"),
        sum(when(!col("t") && !col("i"), 1L).otherwise(0L))
          .as("n_after_image"),
        sum(when(!col("t") && !col("i") && !col("a"), 1L).otherwise(0L))
          .as("n_after_audio"),
        sum(when(!col("t") && !col("i") && !col("a") && !col("v"), 1L)
          .otherwise(0L)).as("n_after_video"))
      .orderBy("source")
  }

  private def multimodalCurationServeSql = {
    val histSql = s"${graft.operators.TextOps.h60Sql("doc_id")} % 100 < 80"
    s"""WITH batch AS (
       |  SELECT doc_id, source FROM documents WHERE NOT ($histSql)),
       |text_dups AS (
       |  SELECT DISTINCT batch_doc AS doc_id FROM (
       |${graft.operators.TextOps.dedupIncrementalOracle}
       |  )),
       |img_dups AS (
       |  SELECT DISTINCT batch_media >> 1 AS doc_id FROM (
       |$imageDedupIncrementalSql
       |  )),
       |aud_dups AS (
       |  SELECT DISTINCT batch_media >> 1 AS doc_id FROM (
       |$audioDedupIncrementalSql
       |  )),
       |vid_dups AS (
       |  SELECT DISTINCT batch_media >> 1 AS doc_id FROM (
       |$videoDedupIncrementalSql
       |  )),
       |flags AS (
       |  SELECT b.source,
       |    b.doc_id IN (SELECT doc_id FROM text_dups) AS t,
       |    b.doc_id IN (SELECT doc_id FROM img_dups) AS i,
       |    b.doc_id IN (SELECT doc_id FROM aud_dups) AS a,
       |    b.doc_id IN (SELECT doc_id FROM vid_dups) AS v
       |  FROM batch b)
       |SELECT source, count(*) AS n_in,
       |  CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_after_text,
       |  CAST(sum(CASE WHEN NOT t AND NOT i THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_after_image,
       |  CAST(sum(CASE WHEN NOT t AND NOT i AND NOT a THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_after_audio,
       |  CAST(sum(CASE WHEN NOT t AND NOT i AND NOT a AND NOT v
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_after_video
       |FROM flags GROUP BY source ORDER BY source""".stripMargin
  }

  private val lastUpdatedAfIndexDir =
    new java.util.concurrent.atomic.AtomicReference[String]()
  private val lastUpdatedVdIndexDir =
    new java.util.concurrent.atomic.AtomicReference[String]()
  sys.addShutdownHook {
    Seq(lastUpdatedDhIndexDir, lastUpdatedAfIndexDir, lastUpdatedVdIndexDir)
      .foreach(r => Option(r.get()).foreach(d =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))))
  }: Unit

  /** [[graft.operators.TextOps]]'s freshTempDir discipline: reclaim the
    * previous call's dir (its lazy readers have run), hand out a fresh
    * one — bench reps must not accumulate index copies under /tmp. */

  private def freshUpdateDir(
      ref: java.util.concurrent.atomic.AtomicReference[String],
      prefix: String): String = {
    ref.getAndSet(null) match {
      case null => ()
      case old => org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(old)): Unit
    }
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    ref.set(d)
    d
  }

  /** [[imageDedupIndexUpdate]]'s daily cycle on the audio index — same
    * append-only invariant (an accepted fingerprint is ≥4 bits from every
    * stored one, so it always founds a NEW cluster) and the same
    * effectively-once second-probe witness. */
  def audioDedupIndexUpdate(s: SparkSession, dir: String): DataFrame = {
    val root = audioFpBuildIndex(s, dir)
    // manifest-served (r18): probes pin the CURRENT pointer's dir list
    val work = freshUpdateDir(lastUpdatedAfIndexDir, "afidx_upd")
    val cycle = graft.operators.VersionedRoot.cycle(
      java.nio.file.Paths.get(work), root)
    val served = cycle.before
    val batch = audioFpHashesOf(s, batchDocs(s, dir)).cache()
    val dups = probeAudioFpIndexBatch(s, batch, served: _*)
      .select(col("batch_media").as("media_id")).distinct().cache()
    val accepted = batch.join(dups, Seq("media_id"), "left_anti").cache()
    val updated = s"$work/delta"
    val newClusters = accepted.groupBy("fp").agg(min("media_id").as("rep"))
    audioFpBands(newClusters.select(col("rep"), col("fp")), "rep")
      .write.parquet(s"$updated/bands")
    val servedAfter = cycle.append(updated)
    val second = probeAudioFpIndexBatch(s, batch, servedAfter: _*)
      .select(col("batch_media")).distinct()
    val witness = s.read.parquet(served.map(r => s"$r/bands"): _*)
      .agg((count(lit(1)) / FpBands).cast("long").as("n_history_clusters"))
      .crossJoin(batch.agg(count(lit(1)).as("n_batch")))
      .crossJoin(dups.agg(count(lit(1)).as("n_dup_batch")))
      .crossJoin(accepted.agg(count(lit(1)).as("n_accepted")))
      .crossJoin(newClusters.agg(count(lit(1)).as("n_new_clusters")))
      .crossJoin(s.read.parquet(servedAfter.map(r => s"$r/bands"): _*)
        .agg((count(lit(1)) / FpBands).cast("long").as("n_clusters_after")))
      .crossJoin(second.agg(count(lit(1)).as("n_second_pass_dup")))
      .localCheckpoint()
    accepted.unpersist(blocking = false)
    dups.unpersist(blocking = false)
    batch.unpersist(blocking = false)
    witness
  }

  private def audioDedupIndexUpdateSql = {
    def e(win: String, band: String) =
      s"(p[($win) * $FpWinLen + ($band) + 1] * p[($win) * $FpWinLen + ($band) + 1]" +
        s" + p[($win) * $FpWinLen + ($band) + 3] * p[($win) * $FpWinLen + ($band) + 3])"
    val histSql = s"${graft.operators.TextOps.h60Sql("doc_id")} % 100 < 80"
    s"""WITH d AS (
       |  SELECT doc_id, text, $histSql AS is_hist FROM documents
       |  WHERE regexp_matches(text, '^[ -~]*$$')
       |    AND length(text) >= $FpSamples),
       |px AS (
       |  SELECT doc_id * 2 AS media_id, is_hist,
       |    list_transform(range($FpSamples),
       |      i -> ord(substring(text, CAST(i + 1 AS INT), 1)) - 79) AS p
       |  FROM d
       |  UNION ALL
       |  SELECT doc_id * 2 + 1, is_hist,
       |    list_transform(range($FpSamples),
       |      i -> (ord(substring(text, CAST(i + 1 AS INT), 1)) - 79) * 2)
       |  FROM d),
       |h AS (
       |  SELECT media_id, is_hist,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range($FpBits), k ->
       |        CASE WHEN ${e("k // 2 + 1", "k % 2")} > ${e("k // 2", "k % 2")}
       |             THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)),
       |      (a, b) -> a + b) AS BIGINT) AS fp
       |  FROM px),
       |hist AS (SELECT DISTINCT fp FROM h WHERE is_hist),
       |b AS (SELECT media_id, fp FROM h WHERE NOT is_hist),
       |dup AS (
       |  SELECT DISTINCT b.media_id FROM b JOIN hist x
       |    ON bit_count(xor(b.fp, x.fp)) <= $FpMaxHamming),
       |acc AS (
       |  SELECT * FROM b WHERE media_id NOT IN (SELECT media_id FROM dup)),
       |newc AS (SELECT DISTINCT fp FROM acc)
       |SELECT (SELECT count(*) FROM hist) AS n_history_clusters,
       |  (SELECT count(*) FROM b) AS n_batch,
       |  (SELECT count(*) FROM dup) AS n_dup_batch,
       |  (SELECT count(*) FROM b) - (SELECT count(*) FROM dup) AS n_accepted,
       |  (SELECT count(*) FROM newc) AS n_new_clusters,
       |  (SELECT count(*) FROM hist) + (SELECT count(*) FROM newc)
       |    AS n_clusters_after,
       |  (SELECT count(*) FROM b) AS n_second_pass_dup""".stripMargin
  }

  /** [[imageDedupIndexUpdate]]'s daily cycle on the video index. The
    * append-only invariant holds at the SEQUENCE grain: an accepted
    * video's frame-hash sequence differs from every stored one (an
    * identical sequence is hamming 0 on every frame — a dup), so every
    * accepted signature founds a new cluster row; composite keys append
    * with it. */
  def videoDedupIndexUpdate(s: SparkSession, dir: String): DataFrame = {
    val root = videoBuildIndex(s, dir)
    // manifest-served (r18): probes pin the CURRENT pointer's dir list
    val work = freshUpdateDir(lastUpdatedVdIndexDir, "vdidx_upd")
    val cycle = graft.operators.VersionedRoot.cycle(
      java.nio.file.Paths.get(work), root)
    val served = cycle.before
    val batch =
      videoHashesOf(s, batchDocs(s, dir)).cache()
    val dups = probeVideoIndexBatch(s, batch, served: _*)
      .select(col("batch_media").as("media_id")).distinct().cache()
    val accepted = batch.join(dups, Seq("media_id"), "left_anti").cache()
    val updated = s"$work/delta"
    val newSigs = accepted.groupBy("n_frames", "fhs")
      .agg(min("media_id").as("rep"))
    videoKeys(newSigs.select(col("rep"), col("n_frames"), col("fhs")),
        "rep")
      .write.parquet(s"$updated/keys")
    val servedAfter = cycle.append(updated)
    val second = probeVideoIndexBatch(s, batch, servedAfter: _*)
      .select(col("batch_media")).distinct()
    val KeysPerSig = DhBands * DhBands
    val witness = s.read.parquet(served.map(r => s"$r/keys"): _*)
      .agg((count(lit(1)) / KeysPerSig).cast("long").as("n_history_clusters"))
      .crossJoin(batch.agg(count(lit(1)).as("n_batch")))
      .crossJoin(dups.agg(count(lit(1)).as("n_dup_batch")))
      .crossJoin(accepted.agg(count(lit(1)).as("n_accepted")))
      .crossJoin(newSigs.agg(count(lit(1)).as("n_new_clusters")))
      .crossJoin(s.read.parquet(servedAfter.map(r => s"$r/keys"): _*)
        .agg((count(lit(1)) / KeysPerSig).cast("long").as("n_clusters_after")))
      .crossJoin(second.agg(count(lit(1)).as("n_second_pass_dup")))
      .localCheckpoint()
    accepted.unpersist(blocking = false)
    dups.unpersist(blocking = false)
    batch.unpersist(blocking = false)
    witness
  }

  private def videoDedupIndexUpdateSql = {
    val frameLen = DhRows * DhCols
    val minLen = VidMinFrames * frameLen
    val histSql = s"${graft.operators.TextOps.h60Sql("doc_id")} % 100 < 80"
    s"""WITH d AS (
       |  SELECT doc_id, text, $histSql AS is_hist,
       |    least($VidMaxFrames, length(text) // $frameLen) AS n_frames
       |  FROM documents
       |  WHERE regexp_matches(text, '^[ -~]*$$')
       |    AND length(text) >= $minLen),
       |px AS (
       |  SELECT doc_id * 2 AS media_id, n_frames, is_hist,
       |    list_transform(range(n_frames * $frameLen),
       |      i -> ord(substring(text, CAST(i + 1 AS INT), 1))) AS p
       |  FROM d
       |  UNION ALL
       |  SELECT doc_id * 2 + 1, n_frames, is_hist,
       |    list_transform(range(n_frames * $frameLen),
       |      i -> least(ord(substring(text, CAST(i + 1 AS INT), 1)) + 1, 126))
       |  FROM d),
       |h AS (
       |  SELECT media_id, n_frames, is_hist,
       |    list_transform(range(n_frames), f ->
       |      CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(range($DhBits), k ->
       |          CASE WHEN p[f * $frameLen + (k // ${DhCols - 1}) * $DhCols + (k % ${DhCols - 1}) + 1]
       |                    > p[f * $frameLen + (k // ${DhCols - 1}) * $DhCols + (k % ${DhCols - 1}) + 2]
       |               THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)),
       |        (a, b) -> a + b) AS BIGINT)) AS fhs
       |  FROM px),
       |hist AS (SELECT DISTINCT n_frames, fhs FROM h WHERE is_hist),
       |b AS (SELECT media_id, n_frames, fhs FROM h WHERE NOT is_hist),
       |dup AS (
       |  SELECT DISTINCT b.media_id FROM b JOIN hist x
       |    ON b.n_frames = x.n_frames
       |    AND list_max(list_transform(range(b.n_frames),
       |      f -> bit_count(xor(b.fhs[f + 1], x.fhs[f + 1])))) <= $DhMaxHamming),
       |acc AS (
       |  SELECT * FROM b WHERE media_id NOT IN (SELECT media_id FROM dup)),
       |newc AS (SELECT DISTINCT n_frames, fhs FROM acc)
       |SELECT (SELECT count(*) FROM hist) AS n_history_clusters,
       |  (SELECT count(*) FROM b) AS n_batch,
       |  (SELECT count(*) FROM dup) AS n_dup_batch,
       |  (SELECT count(*) FROM b) - (SELECT count(*) FROM dup) AS n_accepted,
       |  (SELECT count(*) FROM newc) AS n_new_clusters,
       |  (SELECT count(*) FROM hist) + (SELECT count(*) FROM newc)
       |    AS n_clusters_after,
       |  (SELECT count(*) FROM b) AS n_second_pass_dup""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_frames" -> (frameTable(_, _)),
    "q_gif_frames" -> (gifFrameTable(_, _)),
    "q_image_dhash_neardup" -> (imageDhashNearDup(_, _)),
    "q_image_dedup_incremental" -> (imageDedupIncremental(_, _)),
    "q_audio_fp_neardup" -> (audioFpNearDup(_, _)),
    "q_audio_dedup_incremental" -> (audioDedupIncremental(_, _)),
    "q_video_dhash_neardup" -> (videoDhashNearDup(_, _)),
    "q_video_dedup_incremental" -> (videoDedupIncremental(_, _)),
    "q_multimodal_curation_serve" -> (multimodalCurationServe(_, _)),
    "q_image_dedup_index_update" -> (imageDedupIndexUpdate(_, _)),
    "q_image_index_purge" -> (imageIndexPurge(_, _)),
    "q_audio_index_purge" -> (audioIndexPurge(_, _)),
    "q_video_index_purge" -> (videoIndexPurge(_, _)),
    "q_audio_dedup_index_update" -> (audioDedupIndexUpdate(_, _)),
    "q_video_dedup_index_update" -> (videoDedupIndexUpdate(_, _)))

  def oracles: Map[String, String] = Map(
    "q_multimodal_frames" -> frameTableSql,
    "q_gif_frames" -> gifFrameTableSql,
    "q_image_dhash_neardup" -> imageDhashNearDupSql,
    "q_image_dedup_incremental" -> imageDedupIncrementalSql,
    "q_audio_fp_neardup" -> audioFpNearDupSql,
    "q_audio_dedup_incremental" -> audioDedupIncrementalSql,
    "q_video_dhash_neardup" -> videoDhashNearDupSql,
    "q_video_dedup_incremental" -> videoDedupIncrementalSql,
    "q_multimodal_curation_serve" -> multimodalCurationServeSql,
    "q_image_dedup_index_update" -> imageDedupIndexUpdateSql,
    "q_image_index_purge" -> imageIndexPurgeSql,
    "q_audio_index_purge" -> audioIndexPurgeSql,
    "q_video_index_purge" -> videoIndexPurgeSql,
    "q_audio_dedup_index_update" -> audioDedupIndexUpdateSql,
    "q_video_dedup_index_update" -> videoDedupIndexUpdateSql)
}
