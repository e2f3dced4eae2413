package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner for the driver's `SparkEntry.entry` contract:
  * prints the flagship-query row count (driver checks rows > 0).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.Tables.NanosAsLongConf, "true") // harmless on 4.1.2+ (ignored); needed if ts ships as ns parquet on engines that honor it
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(20, truncate = false)
    println(s"entry rows=${df.count()}")
    spark.stop()
  }
}
