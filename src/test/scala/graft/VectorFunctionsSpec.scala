package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The native vec_dot expression: value parity with the interpreted HOF
  * fold (bit-for-bit), null propagation, and codegen-path execution.
  */
class VectorFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("vec_dot matches the HOF fold bit-for-bit and handles nulls") {
    VectorFunctions.register(spark)
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.1, 0.2, 0.7), Seq(0.9, 0.33, 0.58)))
      .toDF("id", "a", "b")
      .withColumn("hof", expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"))
      .withColumn("native", expr("vec_dot(a, b)"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("hof")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("native")))
    }
    assert(df.filter(col("native") === 32.0).count() == 1)

    val withNull = Seq((1L, Option(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("id", "a", "b").selectExpr("vec_dot(a, b) AS d").collect()
    assert(withNull.head.isNullAt(0))
  }

  test("mod_sum: (Σh) mod m at any group size, null-skipping, HashAggregate") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val m = 1099511627776L // 2^40
    // values near 2^60 so a bounded-addend BIGINT sum would overflow in
    // a handful of rows — the overflow class the aggregate exists for
    val big = (1L to 2000L).map(i => (i % 7, (1L << 59) + i)).toDF("g", "h")
    val got = big.groupBy("g").agg(expr(s"mod_sum(h, ${m}L)").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = (1L to 2000L).groupBy(_ % 7).map { case (g, is) =>
      (g, is.map(i => BigInt((1L << 59) + i)).sum.mod(BigInt(m)).toLong)
    }
    assert(got == want)
    // null children are skipped (SUM semantics)
    val withNulls = Seq(Some(5L), None, Some(7L)).toDF("h")
      .agg(expr(s"mod_sum(h, ${m}L)")).head().getLong(0)
    assert(withNulls == 12L)
    // the plan stays on the HashAggregate path with a partial (map-side
    // combine) stage — the property the membership gates' scale story
    // rides on
    val plan = big.groupBy("g").agg(expr(s"mod_sum(h, ${m}L)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_mod_sum"), plan)
    assert(!plan.contains("ObjectHashAggregate") &&
      !plan.contains("SortAggregate"), plan)
    // modulus guard: non-literal or >2^40 must fail analysis
    intercept[Exception] {
      big.agg(expr(s"mod_sum(h, ${(1L << 41)}L)")).head()
    }
  }

  test("vec_dot runs inside whole-stage codegen over a real scan") {
    VectorFunctions.register(spark)
    // a LocalTableScan would constant-fold the expression away; a parquet
    // scan produces the real pipelined plan
    val df = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .selectExpr("vec_dot(v, v) AS nn")
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark operators inside a WholeStageCodegen stage
    val vecDotLine = plan.linesIterator.find(_.contains("vec_dot")).get
    assert(vecDotLine.trim.startsWith("*("), plan)
    assert(df.filter(col("nn") > 0).count() > 0)
  }
}
