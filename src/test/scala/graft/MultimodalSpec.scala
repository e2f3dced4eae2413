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
}
