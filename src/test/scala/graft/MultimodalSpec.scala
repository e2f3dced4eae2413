package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

/** Multimodal plumbing: media schema, metadata ops, and the stub decoder's
  * batch shape (the codec itself is stubbed — see Multimodal.decodeFeatures).
  */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("media table exposes binary payload with typed metadata") {
    val m = Multimodal.media(spark, dir)
    assert(m.schema("bytes").dataType == BinaryType)
    assert(m.schema("mime").dataType == StringType)
    val r = m.orderBy("media_id").first()
    assert(r.getAs[Array[Byte]]("bytes").nonEmpty)
    assert(r.getAs[Int]("width") >= 320 && r.getAs[Int]("duration_ms") > 0)
  }

  test("resize preserves aspect ratio with integer floor math") {
    val r = Multimodal.resized(Multimodal.media(spark, dir), maxWidth = 640)
      .filter(col("width") > 640).first()
    assert(r.getAs[Int]("out_w") == 640)
    assert(r.getAs[Int]("out_h") ==
      (r.getAs[Int]("height").toLong * 640 / r.getAs[Int]("width")).toInt)
  }

  test("frame sampling emits duration/step + 1 rows per media") {
    val m = Multimodal.media(spark, dir).limit(5)
    val frames = Multimodal.frameSample(m, everyMs = 1000)
      .groupBy("media_id").agg(count(lit(1)).as("n"))
      .join(m.select(col("media_id"), col("duration_ms")), "media_id")
      .collect()
    frames.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Int]("duration_ms") / 1000 + 1)
    }
  }

  test("stub decoder yields fixed-dim deterministic features per media row") {
    val m = Multimodal.media(spark, dir).limit(8)
    val f1 = Multimodal.decodeFeatures(m, dim = 8).orderBy("media_id").collect()
    val f2 = Multimodal.decodeFeatures(m, dim = 8).orderBy("media_id").collect()
    assert(f1.length == 8)
    f1.zip(f2).foreach { case (a, b) =>
      val va = a.getSeq[Float](a.fieldIndex("feature"))
      val vb = b.getSeq[Float](b.fieldIndex("feature"))
      assert(va.length == 8 && va.sameElements(vb)) // deterministic across runs
      assert(va.exists(_ != 0f))
    }
  }

  /** 16-bit PCM WAV bytes, arbitrary channel count, via a real RIFF writer. */
  private def wavBytes(sampleRate: Int, channels: Array[Array[Float]]): Array[Byte] = {
    val n = channels(0).length
    val nCh = channels.length
    val dataLen = n * nCh * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(36 + dataLen).putInt(0x45564157) // RIFF size WAVE
    bb.putInt(0x20746d66).putInt(16) // fmt chunk
    bb.putShort(1).putShort(nCh.toShort).putInt(sampleRate)
    bb.putInt(sampleRate * nCh * 2).putShort((nCh * 2).toShort).putShort(16)
    bb.putInt(0x61746164).putInt(dataLen) // data chunk
    for (i <- 0 until n; c <- 0 until nCh)
      bb.putShort(math.round(channels(c)(i) * 32767f).toShort)
    bb.array()
  }

  /** P6 PPM bytes for the given top-down RGB pixel array. */
  private def ppmBytes(w: Int, h: Int, rgb: Array[Byte],
      comment: Option[String] = None): Array[Byte] = {
    val header = comment match {
      case Some(c) => s"P6\n# $c\n$w $h\n255\n"
      case None => s"P6\n$w $h\n255\n"
    }
    header.getBytes("US-ASCII") ++ rgb
  }

  /** Uncompressed 24-bit BMP bytes (bottom-up unless topDown) for the
    * given TOP-DOWN RGB pixels — rows are emitted reversed and BGR-swapped
    * with 4-byte padding, exactly what a real writer produces.
    */
  private def bmpBytes(w: Int, h: Int, rgb: Array[Byte], topDown: Boolean = false): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val bb = java.nio.ByteBuffer.allocate(54 + rowSize * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(if (topDown) -h else h)
      .putShort(1).putShort(24).putInt(0).putInt(rowSize * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (row <- 0 until h) {
      val srcY = if (topDown) row else h - 1 - row
      for (x <- 0 until w) {
        val o = (srcY * w + x) * 3
        bb.put(rgb(o + 2)).put(rgb(o + 1)).put(rgb(o)) // BGR on disk
      }
      for (_ <- w * 3 until rowSize) bb.put(0.toByte)
    }
    bb.array()
  }

  test("real PPM decode: header comments, dimensions, bit-exact pixels") {
    val rgb = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val img = Multimodal.decodePpm(ppmBytes(2, 2, rgb, comment = Some("synth")))
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.sameElements(rgb))
    // magic sniffing routes to the right decoder
    assert(Multimodal.decodeImage(ppmBytes(2, 2, rgb)).pixels.sameElements(rgb))
    // truncated pixel data and 16-bit depth must reject, not mis-decode
    intercept[IllegalArgumentException](
      Multimodal.decodePpm(ppmBytes(4, 4, rgb)))
    intercept[IllegalArgumentException](
      Multimodal.decodePpm("P6\n2 2\n65535\n".getBytes("US-ASCII") ++ rgb))
  }

  test("real BMP decode: bottom-up flip, BGR swap, row padding, top-down variant") {
    // 3x2 top-down RGB: width 3 forces 3 pad bytes per row (9 -> 12)
    val rgb = Array.tabulate[Byte](3 * 2 * 3)(i => (i * 7 + 1).toByte)
    val up = Multimodal.decodeBmp(bmpBytes(3, 2, rgb))
    assert(up.width == 3 && up.height == 2)
    assert(up.pixels.sameElements(rgb), "bottom-up rows must flip back to top-down RGB")
    val down = Multimodal.decodeImage(bmpBytes(3, 2, rgb, topDown = true))
    assert(down.pixels.sameElements(rgb), "negative height means rows are already top-down")
    // data offset past the buffer must reject
    val evil = bmpBytes(3, 2, rgb)
    java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, evil.length)
    intercept[IllegalArgumentException](Multimodal.decodeBmp(evil))
  }

  test("real PNG decode: ImageIO-encoded gray/RGB/RGBA reproduce pixels exactly") {
    import java.awt.image.BufferedImage
    // ImageIO's PNG writer (deflate + its own filter heuristics) is a real
    // third-party encoder: round-tripping through it exercises the chunk
    // walk, CRC checks, inflate, and filter reversal against bytes this
    // repo didn't craft
    def pngBytes(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val w = 5; val h = 4 // odd width: stride ≠ word-aligned, filters matter
    def channel(x: Int, y: Int, c: Int): Int = (x * 53 + y * 11 + c * 71) & 0xff

    val rgbImg = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val want = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = (channel(x, y, 0), channel(x, y, 1), channel(x, y, 2))
      rgbImg.setRGB(x, y, (r << 16) | (g << 8) | b)
      val o = (y * w + x) * 3
      want(o) = r.toByte; want(o + 1) = g.toByte; want(o + 2) = b.toByte
    }
    val rgbDec = Multimodal.decodePng(pngBytes(rgbImg))
    assert(rgbDec.width == w && rgbDec.height == h)
    assert(rgbDec.pixels.sameElements(want), "RGB pixels must round-trip")
    // the sniff in decodeImage routes PNG magic here
    assert(Multimodal.decodeImage(pngBytes(rgbImg)).pixels.sameElements(want))

    // gray (color type 0): write the raster directly — setRGB on a gray
    // image applies a colorspace transform; raster samples are the bytes
    // the file carries. Decoded output replicates gray across RGB.
    val grayImg = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      grayImg.getRaster.setSample(x, y, 0, channel(x, y, 0))
    val grayDec = Multimodal.decodePng(pngBytes(grayImg))
    for (y <- 0 until h; x <- 0 until w; c <- 0 to 2)
      assert((grayDec.pixels((y * w + x) * 3 + c) & 0xff) == channel(x, y, 0),
        s"gray pixel ($x,$y) ch$c")

    // RGBA (color type 6): alpha is dropped, color survives untouched
    val rgbaImg = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = (channel(x, y, 0), channel(x, y, 1), channel(x, y, 2))
      rgbaImg.setRGB(x, y, (((x + y) * 37 & 0xff) << 24) | (r << 16) | (g << 8) | b)
    }
    assert(Multimodal.decodePng(pngBytes(rgbaImg)).pixels.sameElements(want),
      "RGBA color channels must match the RGB image; alpha dropped")

    // corrupt payloads reject: flipped CRC, truncation, garbage
    val good = pngBytes(rgbImg)
    val flipped = good.clone(); flipped(good.length - 1) = (flipped(good.length - 1) ^ 0x01).toByte
    intercept[IllegalArgumentException](Multimodal.decodePng(flipped))
    intercept[IllegalArgumentException](
      Multimodal.decodePng(java.util.Arrays.copyOfRange(good, 0, good.length / 2)))
  }

  test("real JPEG decode: tolerance-band pixels, per-JVM determinism, features") {
    import java.awt.image.BufferedImage
    // smooth gradient: JPEG's DCT quantization stays small away from sharp
    // edges, so a tight tolerance still holds — lossy means NO exact-pixel
    // pin (cf. the PNG test), only bands
    val w = 16; val h = 12
    // strictly linear ramp, no modulus wrap: a sawtooth edge is exactly
    // what DCT quantization mangles (observed 88/255 error on a %-wrapped
    // fixture); linear gradients stay within a tight band
    def channel(x: Int, y: Int, c: Int): Int = 64 + x * 4 + y * 2 + c * 3
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (channel(x, y, 0) << 16) |
        (channel(x, y, 1) << 8) | channel(x, y, 2))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpeg = bos.toByteArray

    val dec = Multimodal.decodeJpeg(jpeg)
    assert(dec.width == w && dec.height == h, "dimensions are exact — only pixels are lossy")
    // tolerance band: every channel within 24/255 of the source
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 to 2) {
      val got = dec.pixels((y * w + x) * 3 + c) & 0xff
      maxErr = math.max(maxErr, math.abs(got - channel(x, y, c)))
    }
    assert(maxErr <= 24, s"JPEG decode drifted $maxErr/255 from the source")
    // per-JVM determinism: the same bytes decode to the same pixels
    assert(Multimodal.decodeJpeg(jpeg).pixels.sameElements(dec.pixels))
    // the sniff routes JPEG magic (FF D8) here
    assert(Multimodal.decodeImage(jpeg).pixels.sameElements(dec.pixels))

    // distributed features flow through the same imageFeatures path, and
    // land within the tolerance band of the SAME raster through the
    // lossless PPM path (they cannot be bit-equal — the codec is lossy)
    import spark.implicits._
    val raw = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 to 2)
      raw((y * w + x) * 3 + c) = channel(x, y, c).toByte
    val media = Seq(
      (1L, ppmBytes(w, h, raw), "image/ppm"),
      (2L, jpeg, "image/jpeg"))
      .toDF("media_id", "bytes", "mime")
    val rows = Multimodal.imageFeatures(media, grid = 2).orderBy("media_id").collect()
    assert(rows.length == 2, "image/jpeg rows are decoded, not filtered")
    val exact = rows(0).getSeq[Float](rows(0).fieldIndex("feature"))
    val lossy = rows(1).getSeq[Float](rows(1).fieldIndex("feature"))
    exact.zip(lossy).zipWithIndex.foreach { case ((e, l), i) =>
      assert(math.abs(e - l) < 0.05f, s"feature $i: exact $e vs jpeg $l")
    }
  }

  test("image features: channel means/variances and grid cells, distributed") {
    import spark.implicits._
    // 2x2 image, one pure color per pixel quadrant
    val rgb = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,  // row 0: red, green
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte) // row 1: blue, white
    val pngImg = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 to 1; x <- 0 to 1) {
      val o = (y * 2 + x) * 3
      pngImg.setRGB(x, y, ((rgb(o) & 0xff) << 16) |
        ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff))
    }
    val pngBos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(pngImg, "png", pngBos)
    val media = Seq(
      (1L, ppmBytes(2, 2, rgb), "image/ppm"),
      (2L, bmpBytes(2, 2, rgb), "image/bmp"),
      (3L, Array[Byte](1, 2, 3), "video/mp4"), // non-image: filtered out
      (4L, pngBos.toByteArray, "image/png"))
      .toDF("media_id", "bytes", "mime")
    val rows = Multimodal.imageFeatures(media, grid = 2).orderBy("media_id").collect()
    assert(rows.length == 3, "ppm/bmp/png rows decode; the codec row is filtered")
    val Seq(ppmRow, bmpRow, pngRow) = rows.toSeq
    val f = ppmRow.getSeq[Float](ppmRow.fieldIndex("feature"))
    assert(f.length == 6 + 12)
    // each channel is 255 in exactly 2 of 4 pixels -> mean 0.5, var 0.25
    (0 to 2).foreach(c => assert(math.abs(f(c) - 0.5f) < 1e-6, s"mean ch$c ${f(c)}"))
    (3 to 5).foreach(c => assert(math.abs(f(c) - 0.25f) < 1e-6, s"var ch$c ${f(c)}"))
    // grid 2x2 on a 2x2 image = the pixels themselves (normalized)
    assert(f.slice(6, 9) == Seq(1f, 0f, 0f))   // top-left: red
    assert(f.slice(9, 12) == Seq(0f, 1f, 0f))  // top-right: green
    assert(f.slice(12, 15) == Seq(0f, 0f, 1f)) // bottom-left: blue
    assert(f.slice(15, 18) == Seq(1f, 1f, 1f)) // bottom-right: white
    // the SAME pixels through the BMP and PNG paths give bit-identical
    // features — three containers, one raster contract
    assert(bmpRow.getSeq[Float](bmpRow.fieldIndex("feature")) == f)
    assert(pngRow.getSeq[Float](pngRow.fieldIndex("feature")) == f)
  }

  test("real WAV decode: sine RMS, stereo mix-down, distributed features") {
    // 0.5 s of a 440 Hz sine at amplitude 0.5, 8 kHz mono
    val sine = Array.tabulate(4000)(i =>
      (0.5 * math.sin(2 * math.Pi * 440 * i / 8000)).toFloat)
    val mono = Multimodal.decodeWav(wavBytes(8000, Array(sine)))
    assert(mono.sampleRate == 8000 && mono.channels == 1 && mono.samples.length == 4000)
    // decoded samples match the input within 16-bit quantization
    assert(sine.zip(mono.samples).forall { case (a, b) => math.abs(a - b) < 2e-4 })

    // stereo with opposite channels must mix to silence
    val left = Array.fill(1000)(0.5f)
    val right = Array.fill(1000)(-0.5f)
    val mixed = Multimodal.decodeWav(wavBytes(16000, Array(left, right)))
    assert(mixed.channels == 2 && mixed.samples.forall(s => math.abs(s) < 1e-4))

    // the distributed path: per-window RMS of the sine ~ 0.5 / sqrt(2)
    import spark.implicits._
    val media = Seq((1L, wavBytes(8000, Array(sine)), "audio/wav"))
      .toDF("media_id", "bytes", "mime")
    val row = Multimodal.wavFeatures(media, dim = 8).collect().head
    assert(row.getAs[Int]("sample_rate") == 8000)
    assert(row.getAs[Int]("n_samples") == 4000)
    val feat = row.getSeq[Float](row.fieldIndex("feature"))
    assert(feat.length == 8)
    feat.foreach(r => assert(math.abs(r - 0.5 / math.sqrt(2)) < 0.01, s"rms $r"))

    // non-WAV rows are filtered out, and garbage bytes reject cleanly
    val other = Seq((2L, Array[Byte](1, 2, 3), "image/png")).toDF("media_id", "bytes", "mime")
    assert(Multimodal.wavFeatures(other).count() == 0)
    intercept[IllegalArgumentException](Multimodal.decodeWav(Array.fill[Byte](64)(7)))

    // a negative chunk size must fail the contract, not loop forever
    val evil = wavBytes(8000, Array(Array.fill(4)(0.1f)))
    val bb = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, -8) // corrupt the fmt chunk size
    intercept[IllegalArgumentException](Multimodal.decodeWav(evil))
  }

  test("pixel resize: exact nearest-neighbor samples, identity, and checkerboard") {
    // 4x2 image, distinct color per column so the source map is visible
    val rgb = Array[Byte](
      10, 0, 0,  20, 0, 0,  30, 0, 0,  40, 0, 0,
      50, 0, 0,  60, 0, 0,  70, 0, 0,  80, 0, 0)
    val img = Multimodal.RgbImage(4, 2, rgb)
    // 4x2 -> 2x1: src x = floor(dst*4/2) = 0,2; src y = floor(dst*2/1) = 0
    val down = Multimodal.resizePixels(img, 2, 1)
    assert((down.width, down.height) == (2, 1))
    assert(down.pixels.toSeq == Seq[Byte](10, 0, 0, 30, 0, 0))
    // identity target returns the same raster
    val same = Multimodal.resizePixels(img, 4, 2)
    assert(same.pixels.toSeq == rgb.toSeq)
    // 2x upscale replicates each pixel 2x2 (floor map x/2, y/2)
    val up = Multimodal.resizePixels(Multimodal.RgbImage(1, 1, Array[Byte](7, 8, 9)), 2, 2)
    assert(up.pixels.toSeq == Seq[Byte](7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8, 9))
  }

  test("resizedImageFeatures: kernel target matches the metadata resize math") {
    import spark.implicits._
    // 4x2 solid-color PPM: resize to maxWidth=2 must yield out 2x1 and
    // IDENTICAL features to decoding the small image directly (solid color
    // means any correct sampling gives the same cells)
    val rgb = Array.fill[Byte](4 * 2 * 3)(100.toByte)
    val media = Seq((1L, ppmBytes(4, 2, rgb), "image/ppm"))
      .toDF("media_id", "bytes", "mime")
    val row = Multimodal.resizedImageFeatures(media, maxWidth = 2).collect().head
    assert(row.getAs[Int]("out_w") == 2 && row.getAs[Int]("out_h") == 1)
    val direct = Multimodal.imageFeatureVector(
      Multimodal.RgbImage(2, 1, Array.fill[Byte](6)(100.toByte)), 2)
    assert(row.getSeq[Float](row.fieldIndex("feature")) == direct.toSeq)
    // and a media row WIDER than maxWidth is the only one resized: a 2x2
    // image under maxWidth=2 keeps its dims
    val keep = Seq((2L, ppmBytes(2, 2, Array.fill[Byte](12)(5.toByte)), "image/ppm"))
      .toDF("media_id", "bytes", "mime")
    val kept = Multimodal.resizedImageFeatures(keep, maxWidth = 2).collect().head
    assert(kept.getAs[Int]("out_w") == 2 && kept.getAs[Int]("out_h") == 2)
  }

  test("animated GIF: multi-frame encode/decode round-trips pixels exactly") {
    // three 4x5 gray frames with distinct, position-dependent values — the
    // identity gray palette must carry every byte through encode→decode
    val n = 4 * 5
    val frames = Seq.tabulate(3)(f =>
      Array.tabulate[Byte](n)(i => (f * 50 + i * 3).toByte))
    val gif = Multimodal.encodeGifGray(frames, 4, 5)
    // container magic: animated GIFs are GIF89a streams
    assert(new String(gif.take(6), "US-ASCII") == "GIF89a")
    val decoded = Multimodal.decodeGifFrames(gif)
    assert(decoded.length == 3, "frame count must survive the container")
    decoded.zip(frames).foreach { case (img, src) =>
      assert((img.width, img.height) == (4, 5))
      // gray pixel: all three RGB channels replicate the source byte
      (0 until n).foreach { i =>
        assert((img.pixels(i * 3) & 0xff) == (src(i) & 0xff), s"pixel $i")
        assert(img.pixels(i * 3) == img.pixels(i * 3 + 1))
        assert(img.pixels(i * 3) == img.pixels(i * 3 + 2))
      }
    }
    // single-frame stream still decodes; empty frame list rejects
    assert(Multimodal.decodeGifFrames(
      Multimodal.encodeGifGray(frames.take(1), 4, 5)).length == 1)
    intercept[IllegalArgumentException](Multimodal.encodeGifGray(Seq.empty, 4, 5))
    // the measured JDK quirk is guarded, not silently emitted: any height
    // under 5 rows corrupts every row after row 0 on read-back
    intercept[IllegalArgumentException](
      Multimodal.encodeGifGray(Seq(Array.fill[Byte](8)(1)), 4, 2))
    // garbage bytes reject through the reader, not hang
    intercept[Exception](Multimodal.decodeGifFrames(Array.fill[Byte](32)(9)))
  }

  test("gifFrameTable: per-frame pixel sums match the text chars") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("gifdocs").toString
    // doc 1: 130 ASCII chars -> 2 full 64-char frames (last 2 chars dropped)
    // doc 2: short text -> filtered (under one frame)
    // doc 3: non-ASCII -> filtered by the printable-ASCII guard
    val text1 = (0 until 130).map(i => (' ' + (i % 95)).toChar).mkString
    Seq((1L, text1, text1.length.toLong), (2L, "tiny", 4L),
      (3L, "café " * 20, 100L))
      .toDF("doc_id", "text", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = Multimodal.gifFrameTable(spark, tmp).collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 0), (1L, 1)))
    rows.foreach { r =>
      val idx = r.getInt(1)
      val expected = text1.substring(idx * 64, (idx + 1) * 64).map(_.toLong).sum
      assert(r.getAs[Long]("pix_sum") == expected, s"frame $idx sum")
      assert(r.getAs[Int]("width") == 8 && r.getAs[Int]("height") == 8)
    }
  }

  test("media index purges: witness identities hold and the takedown is non-vacuous") {
    // one contract across the three modality legs; the stored-rows-per-
    // cluster multiplier is the only thing that differs (4 bands for
    // image/audio, 16 composite frame-pair keys for video)
    for ((gate, rowsCol, mult) <- Seq(
        ("q_image_index_purge", "n_band_rows_after", 4L),
        ("q_audio_index_purge", "n_band_rows_after", 4L),
        ("q_video_index_purge", "n_key_rows_after", 16L))) {
      val row = graft.multimodal.Multimodal
        .queries(gate)(spark, "/root/testdata/sf0.001").head()
      def l(c: String) = row.getAs[Long](c)
      assert(l("n_purged") > 0L, gate)
      assert(l("n_clusters") - l("n_purged") == l("n_clusters_after"), gate)
      // the half-purge alarm: the stored FILE shrank in lockstep
      assert(l(rowsCol) == mult * l("n_clusters_after"), gate)
      assert(l("n_pairs_before") - l("n_pairs_to_purged")
        == l("n_pairs_after"), gate)
    }
  }

  test("batch and streaming probe spellings agree pair-for-pair on every modality") {
    // the r16 fork-equivalence proof: the batch front door bands DISTINCT
    // signatures (collect_list reshape) while the streaming door carries
    // per-media rows — the shared-oracle argument rests on their outputs
    // being identical, so pin it directly against the same stored index
    import graft.multimodal.Multimodal
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("batch_media", "hist_rep", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val docs = Multimodal.batchDocs(spark, dir)
    val dh = Multimodal.dhashBuildIndex(spark, dir)
    assert(pairs(Multimodal.probeDhashIndexBatch(spark,
        Multimodal.dhashHashesOf(spark, docs), dh))
      == pairs(Multimodal.probeDhashIndex(spark,
        Multimodal.dhashHashesOf(spark, docs), dh)), "image fork diverged")
    val af = Multimodal.audioFpBuildIndex(spark, dir)
    assert(pairs(Multimodal.probeAudioFpIndexBatch(spark,
        Multimodal.audioFpHashesOf(spark, docs), af))
      == pairs(Multimodal.probeAudioFpIndex(spark,
        Multimodal.audioFpHashesOf(spark, docs), af)), "audio fork diverged")
    val vd = Multimodal.videoBuildIndex(spark, dir)
    assert(pairs(Multimodal.probeVideoIndexBatch(spark,
        Multimodal.videoHashesOf(spark, docs), vd))
      == pairs(Multimodal.probeVideoIndex(spark,
        Multimodal.videoHashesOf(spark, docs), vd)), "video fork diverged")
  }
}
