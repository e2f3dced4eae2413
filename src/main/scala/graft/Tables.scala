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
}
