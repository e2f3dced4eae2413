package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

/** Semantics of the generic backward as-of join on tiny inline frames
  * (the oracle gate checks it against DuckDB's native ASOF JOIN at scale).
  */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  test("asofBackward: latest at-or-before match, inclusive ties, null when none") {
    val left = Seq(
      (1L, 5L, "l_at_5"),    // tie with right ts=5 -> inclusive match
      (1L, 7L, "l_at_7"),    // between rights 5 and 9 -> matches 5
      (1L, 3L, "l_at_3"),    // before any right -> null
      (2L, 10L, "l_user2"))  // other key: only its own rights visible
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, 5L, 100L),
      (1L, 9L, 101L),
      (2L, 2L, 200L))
      .toDF("user_id", "ts", "val")

    val out = AsofJoin.asofBackward(left, right, Seq("user_id"), "ts", Seq("val"))
      .collect().map(r => r.getAs[String]("tag") ->
        (Option(r.getAs[java.lang.Long]("val")), Option(r.getAs[java.lang.Long]("ts_right"))))
      .toMap
    assert(out("l_at_5") == (Some(100L), Some(5L)))
    assert(out("l_at_7") == (Some(100L), Some(5L)))
    assert(out("l_at_3") == (None, None))
    assert(out("l_user2") == (Some(200L), Some(2L)))
  }

  test("asofBackward: a matched right row with a NULL value wins over older values") {
    // the ts=9 row IS the match for a left row at ts=10 even though its
    // value is null — per-column carry would resurrect ts=5's value
    val left = Seq((1L, 10L)).toDF("user_id", "ts")
    val right = Seq((1L, 5L, Some(100L)), (1L, 9L, None: Option[Long]))
      .toDF("user_id", "ts", "val")
    val row = AsofJoin.asofBackward(left, right, Seq("user_id"), "ts", Seq("val"))
      .collect().head
    assert(row.isNullAt(row.fieldIndex("val")))
    assert(row.getAs[Long]("ts_right") == 9L)
  }

  test("asofBackward: NULL keys and NULL timestamps never match") {
    val left = Seq((Some(1L), 10L, "k1"), (None: Option[Long], 10L, "knull"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (None: Option[Long], Some(5L), 7L),   // null key: unmatchable
      (Some(1L), None: Option[Long], 8L),   // null ts: unmatchable
      (Some(1L), Some(4L), 9L))
      .toDF("user_id", "ts", "val")
    val out = AsofJoin.asofBackward(left, right, Seq("user_id"), "ts", Seq("val"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Long]("val"))).toMap
    assert(out("k1") == Some(9L))   // only the non-null right row matches
    assert(out("knull").isEmpty)    // null-key left row matches nothing
  }

  test("asofBackward rejects colliding column names up front") {
    val left = Seq((1L, 1L, 2L)).toDF("user_id", "ts", "val")
    val right = Seq((1L, 1L, 3L)).toDF("user_id", "ts", "val")
    val e = intercept[IllegalArgumentException](
      AsofJoin.asofBackward(left, right, Seq("user_id"), "ts", Seq("val")))
    assert(e.getMessage.contains("collide"))
  }

  test("asofBackwardBucketed equals asofBackward on a hot-key fixture") {
    // one key carries 90% of the rows; bucket width 10 (in post-cast µs:
    // long ts t buckets on t*1_000_000) splits it across many buckets.
    // Rights sit at every 3rd tick so matches routinely cross bucket
    // boundaries — the carry-seeding path is exercised, not just in-bucket.
    val rnd = new scala.util.Random(42)
    val left = ((1 to 900).map(i => (1L, (rnd.nextInt(300) + 1).toLong, i.toLong)) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, (rnd.nextInt(300) + 1).toLong, (900 + i).toLong)))
      .toDF("user_id", "ts", "click_id")
    val right = (0 to 100).flatMap(i => Seq((1L, i * 3L, i * 10L), ((i % 7 + 2).toLong, i * 3L, i * 10L + 1)))
      .toDF("user_id", "ts", "view_id")
      .groupBy("user_id", "ts").agg(max("view_id").as("view_id"))

    val plain = AsofJoin.asofBackward(left, right, Seq("user_id"), "ts", Seq("view_id"))
    val bucketed = AsofJoin.asofBackwardBucketed(left, right, Seq("user_id"), "ts",
      Seq("view_id"), bucketUs = 10L * 1000 * 1000)
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
    assert(bucketed.count() == 1000)

    // the sweep's shuffle must partition on the COMPOSITE (key, bucket) —
    // that is the whole point: a hot key spreads over its buckets
    val plan = bucketed.queryExecution.executedPlan.toString
    val sweepExchanges = plan.linesIterator
      .filter(l => l.contains("hashpartitioning") && l.contains("user_id") && l.contains("__b"))
    assert(sweepExchanges.nonEmpty,
      s"bucketed as-of must hash-partition on (keys, __b):\n$plan")
  }

  test("asofBackwardBucketed: left rows before any right row still get null") {
    val left = Seq((1L, 2L, "early"), (1L, 50L, "late")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, 30L, 7L)).toDF("user_id", "ts", "val")
    val out = AsofJoin.asofBackwardBucketed(left, right, Seq("user_id"), "ts",
      Seq("val"), bucketUs = 5L * 1000 * 1000)
      .collect().map(r => r.getAs[String]("tag") -> Option(r.getAs[java.lang.Long]("val"))).toMap
    assert(out("early").isEmpty)      // no earlier right row anywhere
    assert(out("late") == Some(7L))   // match carried across buckets
  }

  test("asofBackward keeps every left row and all its columns") {
    val left = Seq((1L, 1L, "a", 3.5)).toDF("user_id", "ts", "x", "y")
    val right = Seq((9L, 1L, 7L)).toDF("user_id", "ts", "val") // key never matches
    val out = AsofJoin.asofBackward(left, right, Seq("user_id"), "ts", Seq("val"))
    assert(out.columns.toSeq == Seq("user_id", "ts", "x", "y", "val", "ts_right"))
    val row = out.collect().head
    assert(row.getAs[String]("x") == "a" && row.getAs[Double]("y") == 3.5)
    assert(row.isNullAt(row.fieldIndex("val")))
  }

  test("asofNearest: closest either direction, ties backward, one-sided falls back") {
    val left = Seq(
      (1L, 10L, "mid_back"),   // rights at 8 and 13: |10-8|=2 < |13-10|=3 -> 8
      (1L, 12L, "mid_fwd"),    // |12-8|=4 > |13-12|=1 -> 13
      (1L, 8L, "exact"),       // right AT 8 -> distance 0, backward frame
      (1L, 18L, "tie"),        // rights 13 and 23 both at distance 5 -> backward 13
      (1L, 2L, "only_fwd"),    // nothing at-or-before -> forward 8
      (2L, 50L, "only_back"),  // key 2 has one right at 40, nothing after
      (3L, 1L, "no_match"))    // key 3 has no rights at all
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, 8L, 80L), (1L, 13L, 130L), (1L, 23L, 230L),
      (2L, 40L, 400L))
      .toDF("user_id", "ts", "val")
    val out = AsofJoin.asofNearest(left, right, Seq("user_id"), "ts", Seq("val"))
      .collect().map(r => r.getAs[String]("tag") ->
        (Option(r.getAs[java.lang.Long]("val")), Option(r.getAs[java.lang.Long]("ts_right"))))
      .toMap
    assert(out("mid_back") == (Some(80L), Some(8L)))
    assert(out("mid_fwd") == (Some(130L), Some(13L)))
    assert(out("exact") == (Some(80L), Some(8L)))
    assert(out("tie") == (Some(130L), Some(13L)))
    assert(out("only_fwd") == (Some(80L), Some(8L)))
    assert(out("only_back") == (Some(400L), Some(40L)))
    assert(out("no_match") == (None, None))
  }

  test("asofNearest equals brute force on 300 mixed-key deterministic rows") {
    // Knuth-mix pseudo-data (no RNG): dense/sparse keys, duplicate
    // timestamps, left rows before/after all rights — every frame edge.
    def mix(i: Long): Long = (i * 2654435761L) % 1000L
    val left = (0L until 200L).map(i => (i % 7, mix(i), i)).toDF("k", "ts", "lid")
    val right = (0L until 100L)
      .map(i => (i % 5, mix(i * 3 + 1), 1000L + i))
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, ts)
      .toDF("k", "ts", "val")
    val rightRows = right.collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("ts"), r.getAs[Long]("val")))
    def expected(k: Long, t: Long): Option[(Long, Long)] = {
      val mine = rightRows.filter(_._1 == k)
      val back = mine.filter(_._2 <= t).sortBy(r => (-r._2, -r._3)).headOption
      val fwd = mine.filter(_._2 > t).sortBy(r => (r._2, r._3)).headOption
      (back, fwd) match {
        case (None, None) => None
        case (Some(b), None) => Some((b._3, b._2))
        case (None, Some(f)) => Some((f._3, f._2))
        case (Some(b), Some(f)) =>
          if (t - b._2 <= f._2 - t) Some((b._3, b._2)) else Some((f._3, f._2))
      }
    }
    val out = AsofJoin.asofNearest(left, right, Seq("k"), "ts", Seq("val"))
      .collect()
    assert(out.length == 200)
    out.foreach { r =>
      val (k, t) = (r.getAs[Long]("k"), r.getAs[Long]("ts"))
      val got = Option(r.getAs[java.lang.Long]("val"))
        .map(v => (v.longValue, r.getAs[Long]("ts_right")))
      assert(got == expected(k, t), s"k=$k ts=$t: got $got, want ${expected(k, t)}")
    }
  }

  test("asofNearestBucketed equals asofNearest under 90%-hot-key skew") {
    // same skew shape as the backward-bucketed fixture: key 1 carries 90%
    // of the left rows and the 10-tick buckets split it across ~30 tasks.
    // Rights every 3rd tick, so both the backward AND forward carries are
    // routinely the match (a bucket with no in-bucket right on one side).
    // asofNearest is itself held to the brute force above, so transitivity
    // gives the bucketed rewrite the brute-force guarantee too.
    val rnd = new scala.util.Random(1313)
    val left = ((1 to 900).map(i => (1L, (rnd.nextInt(300) + 1).toLong, i.toLong)) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, (rnd.nextInt(300) + 1).toLong, (900 + i).toLong)))
      .toDF("user_id", "ts", "click_id")
    val right = (0 to 100).flatMap(i => Seq((1L, i * 3L, i * 10L), ((i % 7 + 2).toLong, i * 3L, i * 10L + 1)))
      .toDF("user_id", "ts", "view_id")
      .groupBy("user_id", "ts").agg(max("view_id").as("view_id"))

    val plain = AsofJoin.asofNearest(left, right, Seq("user_id"), "ts", Seq("view_id"))
    val bucketed = AsofJoin.asofNearestBucketed(left, right, Seq("user_id"), "ts",
      Seq("view_id"), bucketUs = 10L * 1000 * 1000)
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
    assert(bucketed.count() == 1000)

    // the in-bucket sweep must partition on the COMPOSITE (key, bucket)
    val plan = bucketed.queryExecution.executedPlan.toString
    val sweepExchanges = plan.linesIterator
      .filter(l => l.contains("hashpartitioning") && l.contains("user_id") && l.contains("__b"))
    assert(sweepExchanges.nonEmpty,
      s"bucketed nearest as-of must hash-partition on (keys, __b):\n$plan")
  }

  test("asofNearestBucketed: one-sided and no-match rows survive bucketing") {
    val left = Seq((1L, 2L, "before_all"), (1L, 50L, "after_all"),
      (2L, 9L, "no_rights")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, 30L, 7L)).toDF("user_id", "ts", "val")
    val out = AsofJoin.asofNearestBucketed(left, right, Seq("user_id"), "ts",
      Seq("val"), bucketUs = 5L * 1000 * 1000)
      .collect().map(r => r.getAs[String]("tag") -> Option(r.getAs[java.lang.Long]("val"))).toMap
    assert(out("before_all") == Some(7L)) // forward carry across buckets
    assert(out("after_all") == Some(7L))  // backward carry across buckets
    assert(out("no_rights").isEmpty)
  }

  test("asofNearest plans ONE shuffle: both frames share the sort, no self-join") {
    val left = Seq((1L, 10L)).toDF("user_id", "ts")
    val right = Seq((1L, 8L, 80L)).toDF("user_id", "ts", "val")
    val plan = AsofJoin.asofNearest(left, right, Seq("user_id"), "ts", Seq("val"))
      .queryExecution.executedPlan.toString
    // the union is the only exchange producer; a second Exchange or any
    // join operator would mean the forward pass paid its own shuffle
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"nearest must reuse ONE keyed sort for both directions:\n$plan")
    assert(!plan.contains("Join"), s"nearest is a window sweep, not a join:\n$plan")
  }
}
