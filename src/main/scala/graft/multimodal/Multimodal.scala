package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: images/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * resize / frame-sample operators a training-data pipeline runs on them.
  *
  * The real decode step is STUBBED (no image/audio codecs in this
  * environment — see `decodeFeatures`); everything around it — the media
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
      .withColumn("out_h", expr("CAST(height * out_w AS BIGINT) div width").cast("int"))

  /** One row per sampled frame timestamp (every `everyMs` through the
    * duration, inclusive) — the frame-extraction fan-out as a columnar
    * explode; the decoder then maps each (media_id, frame_ts) batch.
    */
  def frameSample(media: DataFrame, everyMs: Int): DataFrame =
    media.select(col("media_id"), col("mime"),
      posexplode(sequence(lit(0), col("duration_ms"), lit(everyMs)))
        .as(Seq("frame_idx", "frame_ts")))

  /** STUB decoder: real image/audio decoding needs native codecs that are
    * not in this container, so the "decode" is a deterministic byte
    * histogram folded into a fixed-dim float feature. The REAL parts —
    * binary input column, per-partition batch iteration, fixed-dim
    * `array<float>` output feeding the ANN operators — are what a codec
    * implementation would inherit unchanged.
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
      |    CAST((CAST(height AS BIGINT) * least(width, 640)) // width AS INT) AS out_h
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_frames" -> (frameTable(_, _)))

  val oracles: Map[String, String] = Map(
    "q_multimodal_frames" -> frameTableSql)
}
