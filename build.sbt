ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datawarehousespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver captures only the tail of sbt's stdout and json-parses the
// bench's final line. sbt's default logged output strategy prefixes every
// forked-process line with "[info] ", which breaks that parse (every
// BENCH_r1..r9 artifact records parsed: null for exactly this reason).
// StdoutOutput passes the forked process's stdout through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and drop the trailing "[success] Total time ..." line, so the bench
// JSON line is the LAST stdout line — robust even if the tail parser only
// looks at the final line.
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] drives 32 concurrent tasks through one JVM; 16g keeps the
  // unified memory pool comfortable for the cache-heavy near-dup suite
  // (the box has 128g; override via SPARK_DRIVER_MEM). Xms pinned to Xmx
  // (r21): under the parallel collector an initially-small heap sizes the
  // young gen tiny, so the media gates' MB-scale decode arrays promote
  // straight to old gen and trigger multi-second full GCs until adaptive
  // sizing catches up (measured: q_stream_audio_dedup_indexed reps
  // 6.9/9.5 s on a fresh JVM without Xms, 1.5-1.8 s with it).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 80+ whole-stage-codegen queries × 3 reps compile thousands of generated
  // classes; the JDK 17 default 240m JIT code cache can fill mid-suite,
  // silently disabling compilation ("CodeCache is full") and turning the
  // CPU-bound tail queries interpreted. Bench logs per-query occupancy.
  "-XX:ReservedCodeCacheSize=512m",
) ++ (sys.env.getOrElse("SPARK_GRAFT_GC", "parallel") match {
  // r21, guide §1.2 step 3 (config, after algorithm + per-task work):
  // the throughput collector for a BATCH driver JVM. Measured on the
  // GC-sensitive 10-query scoped set, alternating A/B/A/B with the JDK
  // 17 default G1: 18.41 / 18.41 s (parallel) vs 23.72 / 22.02 s (G1),
  // every query faster and the run-to-run spread collapsed — G1's
  // concurrent cycles + region management tax a heap that churns
  // short-lived task/codegen garbage at 32 local cores. -Xms alone
  // under G1 moved nothing (23.75 s), so the win is the collector.
  // Parameterized: a latency-sensitive deployment (streaming serving)
  // keeps G1 via SPARK_GRAFT_GC=g1; any other value passes through as a
  // raw JVM flag.
  case "parallel" => Seq("-XX:+UseParallelGC")
  case "g1" | "default" => Seq.empty
  case other => Seq(other)
}) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").map(_.trim.split("\\s+").toSeq)
  .getOrElse(Seq.empty) ++ sys.env.get("SPARK_GRAFT_TMPDIR").map { d =>
  // A/B hook: redirect java.io.tmpdir (gate scratch dirs + Spark's
  // default local dir) to an alternate filesystem, e.g. a tmpfs — the
  // caller must create the directory first
  s"-Djava.io.tmpdir=$d"
}.toSeq
