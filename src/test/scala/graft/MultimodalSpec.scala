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
}
