package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit aid: print the formatted physical plan of named gate queries
  * (`runMain graft.Explain q_agg_sum q_skew_join …`) against
  * SPARK_GRAFT_SF_DIR — the loop the scale review runs after every
  * operator lands: is the filter pushed, the small side broadcast, the
  * shuffle keyed the way 100 TB needs?
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.Tables.NanosAsLongConf, "true") // harmless on 4.1.2+ (ignored); needed if ts ships as ns parquet on engines that honor it
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val unknown = args.toSet.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    args.foreach { name =>
      println(s"==== $name ====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
