package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosAsLongConf, "true") // harmless on 4.1.2+ (ignored); needed if ts ships as ns parquet on engines that honor it
      .config("spark.ui.enabled", "false")
      // the cluster deployment form, exercised by EVERY suite: functions
      // injected at session build (the register() calls in operators are
      // then no-op re-registrations) and the conf-bound MV rule installed
      // as a pass-through until a test sets the two balance confs
      // (extensions are STATIC conf — they only apply on the session that
      // CREATES the SparkContext, which in this one-JVM test world is here)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
