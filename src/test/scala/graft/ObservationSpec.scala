package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** In-plan metrics via the Observation API — the audit pattern a 100 TB
  * pipeline needs: row counts and quality tallies collected DURING the one
  * real pass (CollectMetrics attaches to the plan; accumulators carry the
  * values back), never by re-scanning the lake to count what just flowed
  * through. The spec pins that observed metrics equal a from-scratch
  * recomputation — i.e. the side channel sees exactly the rows the plan
  * processed.
  */
class ObservationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("observed in-plan metrics equal a recomputation, with no extra scan") {
    val docs = Tables.load(spark, dir, "documents")
    val obs = Observation("ingest_audit")
    // the observed frame is the REAL pipeline (a filter + projection);
    // metrics ride along on the same pass
    // DISTINCT aggregates are rejected in observed metrics (they'd force
    // a second shuffle into the side channel); the HLL sketch form is the
    // supported spelling — exact at this cardinality
    val kept = docs.filter(col("n_chars") >= 100)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("n_chars")).as("sum_chars"),
        approx_count_distinct(col("lang")).as("n_langs"))
      .select("doc_id", "lang", "n_chars")
    val n = kept.count()
    val m = obs.get
    assert(m("n_rows") == n, s"observed ${m("n_rows")} vs counted $n")
    val expect = docs.filter(col("n_chars") >= 100)
      .agg(sum(col("n_chars")), count_distinct(col("lang"))).head()
    assert(m("sum_chars") == expect.getLong(0))
    assert(m("n_langs") == expect.getLong(1))
    // and the plan carries the metrics collector inline — one scan, no
    // second aggregation job
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("CollectMetrics"), plan)
  }
}
