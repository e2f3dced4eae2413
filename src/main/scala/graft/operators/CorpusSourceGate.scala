package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle gates for the corpus FILE-FORMAT sources — the ingestion edge of
  * an LLM data pipeline, which overwhelmingly arrives as line-delimited
  * JSON (one document per line) or CSV, not parquet. Each gate writes a
  * deterministic fixture from the parquet testdata through Spark's own
  * DISTRIBUTED writer, reads it back through the distributed source under
  * test, and the DuckDB oracle recomputes the expected rows straight from
  * the parquet — so the format round-trip (escaping, schema application,
  * type parsing) is exactly what the hash compare checks (the
  * [[JournalGate]] pattern applied to standard formats).
  *
  * Scale posture, deliberate in both gates:
  *  - EXPLICIT schemas. Schema inference reads every byte of the corpus
  *    once before the real read — a full extra 100 TB pass; production
  *    readers must pin the schema.
  *  - JSONL, not a JSON array, and NO `multiLine`: line-delimited files
  *    split at newlines into per-block tasks (`maxPartitionBytes`), so one
  *    big file still parallelizes; `multiLine=true` forces whole-file
  *    tasks and is the classic JSON-at-scale trap.
  *  - Several part files (Spark's writer emits one per partition), so the
  *    read path exercises multi-file listing + per-file splits.
  */
object CorpusSourceGate {

  import JournalGate.{fixtureRoot, writeOnce}

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Documents as JSONL, written once per testdata dir by the distributed
    * JSON writer (correct escaping for every code point by construction —
    * hand-rolled fixture escaping is how a gate ends up testing its own
    * bugs). 4 partitions → 4 part files.
    */
  private def jsonlFixture(s: SparkSession, dir: String): java.nio.file.Path =
    writeOnce(fixtureRoot("jsonl", dir)) { tmp =>
      Tables.load(s, dir, "documents")
        .repartition(4, col("doc_id"))
        .write.json(tmp.toString)
    }

  /** JSONL corpus read under the oracle: explicit schema, line-delimited
    * splits, every field type (long/string) parsed by the JSON source. The
    * output carries md5(text) next to the raw text length so a single
    * flipped byte anywhere in any document fails the hash compare.
    */
  def jsonlSource(s: SparkSession, dir: String): DataFrame = {
    val root = jsonlFixture(s, dir)
    s.read.schema(docSchema).json(root.toString)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  private val jsonlSourceSql =
    """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Lineitem slice as CSV with a header, written once by the distributed
    * CSV writer. Timestamps travel as explicit `yyyy-MM-dd HH:mm:ss`
    * strings — pinning the format on BOTH sides of the round-trip instead
    * of trusting two engines' default timestamp renderings to agree.
    */
  private def csvFixture(s: SparkSession, dir: String): java.nio.file.Path =
    writeOnce(fixtureRoot("csv", dir)) { tmp =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 1200)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"),
          date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("l_shipdate"))
        .repartition(4, col("l_orderkey"))
        .write.option("header", "true").csv(tmp.toString)
    }

  /** CSV read under the oracle: explicit schema (header line used only for
    * position sanity), doubles and longs parsed from text, the timestamp
    * parsed back with the SAME pinned pattern it was written with. Exact
    * decimal staging for the doubles at the output edge keeps the compare
    * immune to double-formatting drift.
    */
  def csvSource(s: SparkSession, dir: String): DataFrame = {
    val root = csvFixture(s, dir)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_shipdate", StringType)))
    s.read.schema(schema).option("header", "true").csv(root.toString)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_returnflag"),
        to_timestamp(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss")
          .cast(TimestampNTZType).as("l_shipdate"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val csvSourceSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  l_returnflag, CAST(l_shipdate AS TIMESTAMP) AS l_shipdate
      |FROM lineitem WHERE l_orderkey < 1200
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** How many malformed lines the corrupt fixture plants (one per 20
    * documents at the fixture's build slice — deterministic, and the
    * oracle states the same number as a literal).
    */
  private val CorruptLines = 25

  /** JSONL fixture with planted malformed lines: the real corpus plus
    * `CorruptLines` files' worth of truncated JSON appended as extra
    * lines. Written once; the corrupt lines are constants so the fixture
    * is a pure function of the testdata.
    */
  private def corruptJsonlFixture(s: SparkSession, dir: String): java.nio.file.Path =
    writeOnce(fixtureRoot("jsonlcorrupt", dir)) { tmp =>
      Tables.load(s, dir, "documents")
        .repartition(4, col("doc_id"))
        .write.json(tmp.toString)
      val junk = (0 until CorruptLines)
        .map(i => s"""{"doc_id": $i, "text": "truncated""")
        .mkString("", "\n", "\n")
      java.nio.file.Files.writeString(tmp.resolve("zz_corrupt.json"), junk): Unit
    }

  /** Corrupt-tolerant JSONL ingestion: PERMISSIVE mode routes malformed
    * lines into `_corrupt_record` instead of killing the job — on a
    * 100 TB crawl some lines are ALWAYS malformed, and FAILFAST means the
    * whole job re-runs for one bad byte. The gate proves the split is
    * exact: every good document survives (count + n_chars volume match
    * the flat table) and the corrupt count is exactly the planted lines,
    * no bleed in either direction.
    */
  def jsonlCorrupt(s: SparkSession, dir: String): DataFrame = {
    val root = corruptJsonlFixture(s, dir)
    val withCorrupt = StructType(docSchema.fields :+
      StructField("_corrupt_record", StringType))
    val read = s.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(root.toString)
      // Spark requires a materialization boundary between the raw parse
      // and predicates on the corrupt column (SPARK-21610: filters on
      // _corrupt_record alone would prune the very columns whose parse
      // failure defines it). localCheckpoint, not cache: it materializes
      // the boundary without pinning rows in executor storage for the
      // rest of a 90-query Verify run (the clusters()/contamination()
      // discipline) — the checkpoint RDD is released when the frame is.
      .localCheckpoint()
    read.agg(
      count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
      count(col("_corrupt_record")).as("n_corrupt"),
      sum(when(col("_corrupt_record").isNull, col("n_chars"))).as("sum_chars"))
  }

  private val jsonlCorruptSql =
    s"""SELECT count(*) AS n_good, CAST($CorruptLines AS BIGINT) AS n_corrupt,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_jsonl_source" -> (jsonlSource(_, _)),
    "q_jsonl_corrupt" -> (jsonlCorrupt(_, _)),
    "q_csv_source" -> (csvSource(_, _)))

  val oracles: Map[String, String] = Map(
    "q_jsonl_source" -> jsonlSourceSql,
    "q_jsonl_corrupt" -> jsonlCorruptSql,
    "q_csv_source" -> csvSourceSql)
}
