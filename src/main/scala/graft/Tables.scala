package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Canonical loaders for the driver's Parquet testdata tables.
  *
  * All schemas are fixed (see FIXTURES.md §C); we never rely on runtime
  * schema inference beyond Parquet's self-describing footer. At 100 TB these
  * would be partitioned table paths (e.g. partitionBy tenant / date); the
  * loader keeps that substitution in one place.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one testdata table. Plain parquet scan — Catalyst handles column
    * pruning + predicate pushdown from whatever plan is built on top.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val NanosAsLongConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** The `events.ts` column has shipped in two physical shapes across
    * driver/testdata generations, and Spark's read of it moved under us:
    *
    *  - NANOSECOND parquet timestamp + Spark ≤4.0 honoring the
    *    [[NanosAsLongConf]] legacy conf → reads as LONG (raw ns).
    *  - MICROSECOND parquet timestamp (isAdjustedToUTC=false) — the
    *    current testdata — → reads natively as TIMESTAMP_NTZ; Spark 4.1.2
    *    accepts but IGNORES the legacy conf.
    *
    * Operators must therefore branch on the LOADED schema, never on the
    * conf. These two helpers are the single place that knows the mapping;
    * both target the same canonical form: microsecond-precision values
    * with DuckDB-identical truncation semantics (ns→µs is integer `div
    * 1000` on the LONG path; the µs file needs no narrowing at all).
    * Session TZ is UTC everywhere in this repo, so TIMESTAMP ↔ NTZ casts
    * are wall-clock identities.
    */
  /** Exact ns→µs truncating division on a LONG column. `c / 1000` in the
    * Column DSL is DOUBLE division — ns-epoch values (~1.7e18) exceed
    * 2^53 and would round by ~±128 ns; decimal division keeps every bit
    * and the decimal→long cast truncates toward zero (= floor on the
    * non-negative epoch domain), matching SQL `div` / DuckDB `//`.
    */
  private def nsDivToMicros(c: Column): Column =
    (c.cast(org.apache.spark.sql.types.DecimalType(20, 0)) / lit(1000))
      .cast(LongType)

  def tsAsNtz(c: Column, dt: DataType): Column = dt match {
    case LongType           => timestamp_micros(nsDivToMicros(c)).cast(TimestampNTZType)
    case TimestampNTZType   => c
    case TimestampType      => c.cast(TimestampNTZType)
    case other => throw new IllegalStateException(
      s"events.ts read as unexpected type $other; extend Tables.tsAsNtz")
  }

  /** The column as a microsecond LONG (for rangeBetween frames / bucket
    * math). Raw-ns LONG columns truncate by integer div 1000.
    */
  def tsAsMicros(c: Column, dt: DataType): Column = dt match {
    case LongType                         => nsDivToMicros(c)
    case TimestampNTZType | TimestampType => unix_micros(c.cast(TimestampType))
    case other => throw new IllegalStateException(
      s"events.ts read as unexpected type $other; extend Tables.tsAsMicros")
  }

  /** events with `ts` normalized to microsecond TIMESTAMP_NTZ regardless of
    * the file's physical shape (see [[tsAsNtz]]).
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.withColumn("ts", tsAsNtz(col("ts"), raw.schema("ts").dataType))
  }
}
