package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: one JSON line with per-query seconds on SPARK_GRAFT_SF_DIR.
  *
  * Methodology: the sink is `queryExecution.toRdd.count()` — it executes the
  * FULL physical plan (a plain `.count()` lets Catalyst prune projections to
  * a row count, under-measuring wide queries). Each query gets one untimed
  * warmup run (JIT + code-gen + file-footer caching), then the MEDIAN of
  * `SPARK_GRAFT_BENCH_REPS` timed runs (default 3) is reported: the median
  * absorbs a stray GC/compilation pause in either direction, where a min
  * hides systematic jitter and a single sample made round-over-round
  * comparisons coin-flips on the streaming/near-dup queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(df: DataFrame): Unit = { df.queryExecution.toRdd.count(): Unit }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // several operators .cache() intermediate frames; identical plans in
    // later runs would silently read InMemoryRelation instead of executing,
    // so drop all cached data between runs to time the real plan
    def clearCache(): Unit = spark.sharedState.cacheManager.clearCache()

    // Spark frees shuffle files / broadcasts via ContextCleaner, which only
    // acts when the JVM garbage-collects the driver-side references. Over a
    // 43-query suite the backlog grows until random queries absorb the
    // cleanup + GC pauses (observed: a 1.6 s query reading 17 s mid-suite).
    // Forcing a GC at each query boundary keeps that cost OUT of timed runs.
    // One System.gc() only ENQUEUES the dead references — the cleaner
    // thread drains its queue asynchronously, so without the settle pause
    // the actual unpersist/shuffle-file deletion raced INTO the next timed
    // rep nondeterministically (observed: the same query sequence timing a
    // cache-heavy query at 2.6 s or 11.5 s across full-suite runs). GC,
    // give the cleaner a beat to drain, GC again for the newly-freed refs.
    def settle(): Unit = {
      clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      Thread.sleep(150)
      System.gc()
    }

    // local iteration aid: SPARK_GRAFT_ONLY=q_a,q_b times just those
    // queries; unknown names fail loudly (shared with Verify)
    val selected =
      try SparkEntry.selectedQueries(sys.env.get("SPARK_GRAFT_ONLY"))
      catch {
        case e: IllegalArgumentException =>
          System.err.println(s"[bench] ${e.getMessage}")
          sys.exit(2)
      }
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3)
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec =
        try {
          run(fn(spark, sfDir)) // warmup (untimed)
          median(Seq.fill(reps) { settle(); timed(run(fn(spark, sfDir))) })
        } catch {
          // a silent -1 hides which query failed and why; attribute it
          case e: Throwable =>
            System.err.println(s"[bench] query $name FAILED: $e")
            e.printStackTrace()
            -1.0
        }
      settle()
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._2 < 0)) {
      System.err.println(
        s"[bench] failed queries: ${results.filter(_._2 < 0).map(_._1).mkString(", ")}")
      sys.exit(1)
    }
  }
}
