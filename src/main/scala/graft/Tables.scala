package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** The events table carries a NANOSECOND parquet timestamp, which vanilla
    * Spark refuses (PARQUET_TYPE_ILLEGAL); reading it requires the
    * [[NanosAsLongConf]] legacy conf. The conf is consulted again at
    * execution planning, so a scope-and-restore around `load()` would make
    * the very plan it builds fail at runtime — it must hold for the
    * session's whole life. Every session this repo constructs (Verify,
    * Bench, Smoke, Explain, SparkSpec) sets it AT CONSTRUCTION; operators
    * that read ns-timestamp parquet call this assert instead of mutating
    * the caller's session, so no gate flips a conf mid-suite.
    */
  def requireNanosAsLong(spark: SparkSession): Unit =
    require(spark.conf.getOption(NanosAsLongConf).contains("true"),
      s"this operator reads nanosecond-timestamp parquet; build the session " +
        s"with .config(\"$NanosAsLongConf\", \"true\") (see graft.Verify) — " +
        "it cannot be set per-query because the parquet reader re-reads the " +
        "conf at execution planning")
}
