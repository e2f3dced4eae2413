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

  test("RFM segments: recency buckets replay the boundary rule; populations partition customers") {
    // the tie-deterministic quintile contract checked from outside Spark:
    // recompute the recency metric and its boundary rule naively in
    // driver Scala over the raw orders, and the gate's marginal r_score
    // populations must match exactly (the oracle owns full cell
    // equality; this pins the RULE independently of both engines)
    import org.apache.spark.sql.functions.col
    val out = graft.operators.Relational
      .queries("q_rfm_segments")(spark, dir).collect()
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_orderdate")).collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1)))
    val nCust = orders.map(_._1).distinct.length.toLong
    assert(out.map(_.getAs[Long]("n_customers")).sum == nCust,
      "segments must partition the customer set")
    Seq("r_score", "f_score", "m_score").foreach { c =>
      assert(out.forall { r =>
        val v = r.getAs[Int](c); v >= 1 && v <= 5
      }, s"$c out of range")
    }
    // naive replay: r = days(ref - last order), boundaries = smallest v
    // with cumcount >= ceil(k*n/5), bucket = 1 + #{k: v > b_k}
    val refDay = orders.map(_._2.toLocalDate.toEpochDay).max
    val rByCust = orders.groupBy(_._1).map { case (_, os) =>
      refDay - os.map(_._2.toLocalDate.toEpochDay).max
    }.toSeq
    val n = rByCust.size
    val sorted = rByCust.sorted
    val bounds = (1 until 5).map { k =>
      val need = (k * n + 4) / 5
      sorted(need - 1) // smallest v whose cumulative count reaches need
    }
    val expected = rByCust.groupBy(v => 1 + bounds.count(v > _))
      .view.mapValues(_.size.toLong).toMap
    val got = out.groupBy(_.getAs[Int]("r_score"))
      .view.mapValues(_.map(_.getAs[Long]("n_customers")).sum).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("RFM grain guard raises in-plan when the distinct count breaches the ceiling") {
    // the executable form of "the single-partition window is bounded by
    // grain cardinality": a distribution wider than the ceiling must
    // fail loudly inside the plan, not silently sort it on one core
    import org.apache.spark.sql.functions.{col, count, lit}
    val dist = spark.range(10).select(col("id").as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    // under the ceiling: passes through untouched
    assert(graft.operators.Relational.grainGuarded(dist, "r", ceiling = 10L)
      .count() == 10L)
    val e = intercept[Exception] {
      graft.operators.Relational.grainGuarded(dist, "r", ceiling = 5L)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("rfm grain bound")),
      s"expected the grain-bound raise, got: $e")
  }
}
