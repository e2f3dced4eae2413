package graft

import graft.operators.{EventWindows, Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Operator-level behavior of the LLM-pipeline family on tiny inline data
  * (the oracle gate covers the full testdata; these pin the semantics).
  */
class LlmOpsSpec extends SparkSpec {

  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))

  private def withDocs[A](rows: (Long, String)*)(f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    docsOf(rows: _*).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    f(dir)
  }

  test("dedupExact collapses whitespace/case variants to the smallest id") {
    withDocs(
      1L -> "Hello   World",
      2L -> "hello world",
      3L -> "something else entirely here") { dir =>
      val out = TextOps.dedupExact(spark, dir).collect()
      // corpus is unioned with a +10000 re-crawl copy: 2 distinct texts,
      // the hello-world group has 4 members (ids 1, 2, 10001, 10002)
      assert(out.length == 2)
      val byKeep = out.map(r => r.getAs[Long]("keep_doc_id") -> r.getAs[Long]("n_dups")).toMap
      assert(byKeep == Map(1L -> 4L, 3L -> 2L))
    }
  }

  test("quality training: first two rounds match an independent driver-side reimplementation") {
    val rows = Seq(
      (1L, "good clean prose words here", "src0"),
      (2L, "more curated reference text tokens", "src0"),
      (3L, "spammy spam spam click here now", "srcX"),
      (4L, "random crawl junk words tokens", "srcX"),
      (5L, "good words tokens prose", "srcX"))
    val dir = java.nio.file.Files.createTempDirectory("qcdocs").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val traj = TextOps.qcTrainTrajectory(spark, dir)

    // independent spelling of the whole round: md5-prefix bucketing and a
    // naive in-memory batch perceptron, no Spark anywhere
    def h60(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val feats = rows.map { case (_, text, src) =>
      val cnt = text.trim.toLowerCase.split("\\s+").toSeq
        .groupBy(t => (h60(t) % 64).toInt)
        .map { case (b, g) => b -> g.size.toLong }
      (if (src == "src0") 1L else -1L, cnt)
    }
    var w = Vector.fill(64)(0L)
    val expect = (1 to 2).map { _ =>
      val mis = feats.filter { case (y, cnt) =>
        val score = cnt.map { case (b, c) => w(b) * c }.sum
        (y == 1L && score <= 0L) || (y == -1L && score > 0L)
      }
      val delta = mis.flatMap { case (y, cnt) => cnt.map { case (b, c) => b -> y * c } }
        .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
      w = w.zipWithIndex.map { case (wj, j) => wj + delta.getOrElse(j, 0L) }
      (w.toSeq, mis.size.toLong)
    }
    assert(traj.take(2) == expect)
  }

  test("batched BPE: admissions pairwise compatible; round 1 leads with the strict argmax") {
    withDocs(
      1L -> "aaab aaab aaab cddc cddc effe",
      2L -> "aaab cddc effe gg gg gg") { dir =>
      val batched = TextOps.bpeTrainMergesBatched(spark, dir)
      assert(batched.nonEmpty && batched.head.nonEmpty)
      // the conflict rule: within a round the {lhs, rhs, merged} triples
      // are pairwise disjoint, so sequential replace == simultaneous
      batched.foreach { sel =>
        val triples = sel.map { case (l, r, _) => Set(l, r, l + r) }
        for (i <- triples.indices; j <- 0 until i)
          assert((triples(i) & triples(j)).isEmpty, s"incompatible batch: $sel")
      }
      // admission 1 of round 1 is the same argmax strict greedy training
      // would pick (identical counts, identical tie-break)
      val strict = TextOps.bpeTrainMerges(spark, dir)
      assert(batched.head.head == strict.head)
    }
  }

  test("LM calibration guarantee holds on the test corpus") {
    val out = TextOps.lmCalibrated(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 2 && out.forall(_.getAs[Boolean]("ok")))
    val ts = out.map(_.getAs[Long]("t_key"))
    assert(ts.sorted.sameElements(ts), s"thresholds must be monotone in p: ${ts.toSeq}")
  }

  test("dedupExact constructs its plan without running an eager action") {
    withDocs(1L -> "some text here", 2L -> "other text there") { dir =>
      // spark.read.parquet itself runs small footer/listing jobs (callsite
      // Tables.scala); the regression under guard is an eager ACTION inside
      // the operator, whose job callsite would land in TextOps.scala (the
      // old `.first()` showed up as `first at TextOps.scala:..`)
      val callsites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          js.stageInfos.foreach(si => callsites.add(si.name)); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        TextOps.dedupExact(spark, dir) // plan construction only — no action
        // sentinel action: the listener bus is FIFO, so once the sentinel's
        // events land, any job dedupExact had launched is already recorded
        spark.range(1).count()
        Thread.sleep(500)
        val eager = callsites.toArray(Array.empty[String])
          .filter(n => n.contains("TextOps") || n.contains("first at"))
        assert(eager.isEmpty, s"eager action during plan build: ${eager.toSeq}")
      } finally spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("textStats counts tokens and flags quality") {
    withDocs(1L -> ("word " * 25).trim, 2L -> "only three tokens!!!") { dir =>
      val rows = TextOps.textStats(spark, dir).collect()
      val r1 = rows.find(_.getAs[Long]("doc_id") == 1L).get
      assert(r1.getAs[Long]("n_tokens") == 25)
      assert(r1.getAs[Int]("is_quality") == 1)
      val r2 = rows.find(_.getAs[Long]("doc_id") == 2L).get
      assert(r2.getAs[Long]("n_tokens") == 3)
      assert(r2.getAs[Int]("is_quality") == 0)
    }
  }

  test("langId votes stopword sets with deterministic tie-break") {
    withDocs(
      1L -> "the cat sat on the mat and the dog is here",
      2L -> "der hund und die katze ist da",
      3L -> "xyzzy plugh") { dir =>
      val out = TextOps.langId(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_guess")).toMap
      assert(out == Map(1L -> "en", 2L -> "de", 3L -> "und"))
    }
  }

  test("minhashNearDup finds heavily-overlapping docs and skips distinct ones") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    withDocs(
      1L -> base,
      2L -> (base + " extra"),  // jaccard ~ 38/41 ≈ 0.93
      3L -> (1 to 40).map(i => s"other$i").mkString(" ")) { dir =>
      val pairs = TextOps.minhashNearDup(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      assert(pairs.toSeq == Seq((1L, 2L)))
    }
  }

  test("minhashNearDupBanded: non-default 16x8 banding finds the same verified pairs") {
    // Banding only nominates CANDIDATES; the exact-Jaccard verify decides
    // membership. At planted s ≈ 0.93, 16 bands x 8 rows still recalls
    // the pair (P(miss) = (1-s^8)^16 ≈ 2e-7), so the verified output must
    // equal the default 32x4 run's; a distinct-doc pair must stay absent
    // under BOTH bandings.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    withDocs(
      1L -> base,
      2L -> (base + " extra"),
      3L -> (1 to 40).map(i => s"other$i").mkString(" ")) { dir =>
      val banded = TextOps.minhashNearDupBanded(spark, dir, 16, 8, 0.8)
        .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      assert(banded.toSeq == Seq((1L, 2L)))
      // an invalid family (overruns the 128 signature components) fails fast
      intercept[IllegalArgumentException] {
        TextOps.minhashNearDupBanded(spark, dir, 33, 4, 0.8)
      }
    }
  }

  test("simhashNearDupRadius: wider radius is exact against brute-force hamming") {
    // d=5 exercises the non-default 6x10-bit pigeonhole split (and the
    // uneven-width path is covered by construction for any d where
    // 60 mod (d+1) != 0, e.g. d=6 -> 7 bands of 9/8 bits). Exactness
    // claim: banding recalls EVERY pair within the radius, so the output
    // must equal an all-pairs hamming filter over the same signatures.
    val fixture = (1 to 12).map { i =>
      i.toLong -> (1 to 50).map(j => if (j % 12 < i % 4) s"v$j" else s"tok$j")
        .mkString(" ")
    }
    withDocs(fixture: _*) { dir =>
      for (d <- Seq(5, 6)) {
        val got = TextOps.simhashNearDupRadius(spark, dir, d).collect()
          .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
            r.getAs[Long]("hamming")).toMap
        // brute force over the kernel's own signatures (same normalization
        // as the operator: lower, trim, whitespace-collapse, split)
        graft.functions.VectorFunctions.register(spark)
        val sigs = Tables.load(spark, dir, "documents")
          .selectExpr("doc_id",
            """simhash_sig(array_distinct(
              |  split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' '))) AS sh"""
              .stripMargin)
          .collect().map(r => r.getLong(0) -> r.getLong(1))
        val expect = (for {
          (a, sa) <- sigs; (b, sb) <- sigs if a < b
          h = java.lang.Long.bitCount(sa ^ sb) if h <= d
        } yield (a, b) -> h.toLong).toMap
        assert(got == expect, s"radius $d: got $got expect $expect")
      }
    }
  }

  test("langNgram classifies real sentences by trigram profile") {
    withDocs(
      1L -> "the quick brown fox is jumping over the lazy dog in the garden",
      2L -> "der schnelle braune fuchs springt über den faulen hund und das ist schön",
      3L -> "le renard brun et rapide saute par dessus le chien paresseux que nous aimons",
      4L -> "el rápido zorro marrón salta sobre el perro perezoso que está en la casa",
      5L -> "zzz qqq xxx") { dir =>
      val out = TextOps.langNgram(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_guess")).toMap
      assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "und"))
    }
  }

  test("langNgram: sub-3-char texts contribute no grams (sequence(1,0) descends)") {
    // "de" would otherwise mint bogus 2-char grams via Spark's descending
    // sequence(1, 0) = [1, 0]; the oracle's range() is empty for them
    withDocs(1L -> "de", 2L -> "a", 3L -> "") { dir =>
      val out = TextOps.langNgram(spark, dir).collect()
      assert(out.length == 3)
      assert(out.forall(_.getAs[String]("lang_guess") == "und"))
      assert(out.forall(r => (1 to 4).forall(i => r.getLong(i + 1) == 0L)))
    }
  }

  test("ngramJaccard finds the same pairs exactly, with the true similarity") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    withDocs(
      1L -> base,
      2L -> (base + " extra"),  // shares all 38 of doc 1's shingles; union 39
      3L -> base,               // identical to 1 -> jaccard 1.0
      4L -> (1 to 40).map(i => s"other$i").mkString(" ")) { dir =>
      val rows = TextOps.ngramJaccard(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
          r.getAs[Double]("jaccard")).toMap
      assert(rows.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
      assert(rows((1L, 3L)) == 1.0)
      assert(math.abs(rows((1L, 2L)) - 38.0 / 39.0) < 1e-12)
    }
  }

  test("ngramJaccard prefix filter is exact: agrees with all-pairs brute force") {
    // overlapping chains doc i = tokens [3i, 3i+40): neighbors share ~37/43
    val docs = (0 until 8).map { i =>
      (i + 1).toLong -> (3 * i until 3 * i + 40).map(t => s"w$t").mkString(" ")
    }
    withDocs(docs: _*) { dir =>
      val got = TextOps.ngramJaccard(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      // brute-force oracle on the same shingle definition
      def sh(text: String): Set[String] = {
        val t = text.split(" ")
        (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
      }
      val expect = (for {
        (a, ta) <- docs; (b, tb) <- docs if a < b
        j = sh(ta).intersect(sh(tb)).size.toDouble /
          sh(ta).union(sh(tb)).size
        if j >= 0.8
      } yield (a, b)).toSet
      assert(got == expect)
    }
  }

  test("simhashNearDup pairs docs with equal token sets, skips distinct ones") {
    // simhash is over the DISTINCT token set: reordering and repeating
    // tokens yields the identical signature (hamming 0)
    val base = (1 to 60).map(i => s"tok$i")
    withDocs(
      1L -> base.mkString(" "),
      2L -> (base.reverse ++ Seq("tok1", "tok2")).mkString(" "),
      3L -> (1 to 60).map(i => s"zz$i").mkString(" ")) { dir =>
      val rows = TextOps.simhashNearDup(spark, dir).collect()
      assert(rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
        == Seq((1L, 2L)))
      assert(rows.head.getAs[Long]("hamming") == 0)
    }
  }

  test("fingerprint is robust to a small edit (most fingerprints shared)") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = a.replace("lazy", "hazy")
    withDocs(1L -> a, 2L -> b, 3L -> a) { dir =>
      val fp = TextOps.fingerprint(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_fingerprints"), r.getAs[Long]("fp_checksum"))).toMap
      assert(fp(1L) == fp(3L)) // identical text -> identical fingerprint set
      assert(fp(1L) != fp(2L)) // edit shifts some fingerprints
    }
  }

  test("cosineTopK ranks an identical vector first") {
    val dir = java.nio.file.Files.createTempDirectory("emb").toString
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (20L, Array(1f, 0f, 0f, 0f)),   // same direction as query 0
      (21L, Array(0f, 1f, 0f, 0f)),   // orthogonal
      (22L, Array(-1f, 0f, 0f, 0f)))  // opposite
    vecs.toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.cosineTopK(spark, dir)
      .filter(col("qid") === 0).orderBy("rank").collect()
    assert(rows.map(_.getAs[Long]("nid")).toSeq == Seq(20L, 21L, 22L))
    assert(rows.head.getAs[Double]("cosine") == 1.0)
    assert(rows.last.getAs[Double]("cosine") == -1.0)
  }

  test("embedNearDupSized: wider signatures keep true pairs, defaults unchanged") {
    // identical-direction vectors agree on EVERY sign, so they share every
    // band bucket at any width — widening bits prunes the candidate space
    // (the sf1 scaling fix) without losing exact duplicates
    val dir = java.nio.file.Files.createTempDirectory("emb").toString
    def v(seed: Int): Array[Float] =
      Array.tabulate(64)(i => math.sin(seed * 37.0 + i).toFloat)
    val vecs = Seq(
      (0L, v(1)), (1L, v(1)),      // same direction: cosine 1
      (2L, v(2)), (3L, v(3)))      // unrelated directions
    vecs.toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val wide = Similarity.embedNearDupSized(spark, dir, 16, 10, 0.45)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(wide.contains((0L, 1L)), s"identical pair must survive 10-bit bands, got $wide")
    // the default entry point IS the sized variant at the parity family
    val dflt = Similarity.embedNearDup(spark, dir)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(dflt.contains((0L, 1L)))
    intercept[IllegalArgumentException] {
      Similarity.embedNearDupSized(spark, dir, 16, 31, 0.45)
    }
  }

  test("trained IVF codebook: planted-label recall >= the stand-in's") {
    // sf0.01 embeddings carry 10 planted label clusters; a neighbor is
    // "true" when it shares its query's label. k-means from the stand-in
    // init must not make that recall worse (and in practice improves it).
    val dir = "/root/testdata/sf0.01"
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"))
    def labelRecall(df: org.apache.spark.sql.DataFrame): Double =
      df.join(labels.select(col("vec_id").as("qid"), col("label").as("ql")), "qid")
        .join(labels.select(col("vec_id").as("nid"), col("label").as("nl")), "nid")
        .agg(avg(when(col("ql") === col("nl"), 1.0).otherwise(0.0)))
        .collect().head.getDouble(0)
    val standIn = labelRecall(Similarity.annIvf(spark, dir))
    val trained = labelRecall(Similarity.annIvfTrained(spark, dir))
    assert(trained >= standIn,
      s"trained codebook recall $trained fell below stand-in $standIn")
  }

  test("PQ-ADC recall@5 against the exact top-k") {
    // The hash-compare gate proves both engines compute the SAME
    // approximation; this pins that the approximation is GOOD — the 4-bit
    // codes + 15-candidate rerank must recover most of the true top-5.
    val dir = "/root/testdata/sf0.01"
    def top5(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("rank") <= 5).select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = top5(Similarity.cosineTopK(spark, dir))
    val pq = top5(Similarity.annPq(spark, dir))
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall@5 $recall below 0.8 floor")
    // serving from the stored index is the same approximation — the same
    // floor must hold (codebooks persisted+reloaded, codes read off parquet)
    val served = top5(Similarity.annPqServe(spark, dir))
    val servedRecall = (exact & served).size.toDouble / exact.size
    assert(servedRecall >= 0.8, s"served PQ recall@5 $servedRecall below 0.8 floor")
    // the combined IVF-PQ path additionally prunes to NProbe cells before
    // ADC — recall may only drop by what the coarse routing misses; hold
    // it to the same floor (measured at this fixture: cell pruning costs
    // little because near neighbors share coarse cells by construction)
    val ivfpq = top5(Similarity.annIvfPqServe(spark, dir))
    val ivfpqRecall = (exact & ivfpq).size.toDouble / exact.size
    assert(ivfpqRecall >= 0.8, s"IVF-PQ recall@5 $ivfpqRecall below 0.8 floor")
  }

  test("annIvf surfaces an identical vector via its probed cell") {
    val dir = java.nio.file.Files.createTempDirectory("emb").toString
    // ids 0..15 double as the IVF codebook; 17 duplicates query 0's vector
    // and must be found through cell probing (it is in centroid 0's cell)
    val vecs = (0 to 15).map { i =>
      (i.toLong, Array(math.cos(i / 3.0).toFloat, math.sin(i / 3.0).toFloat,
        (i % 4).toFloat / 4, 1f))
    } :+ (17L, Array(math.cos(0.0).toFloat, math.sin(0.0).toFloat, 0f, 1f))
    import spark.implicits._
    vecs.toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.annIvf(spark, dir)
      .filter(col("qid") === 0).orderBy("rank").collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Long]("nid") == 17L)
    // sqrt(nn)*sqrt(nn) != nn exactly for irrational components
    assert(rows.head.getAs[Double]("cosine") > 1.0 - 1e-12)
  }

  test("event windows: tumbling counts per hour, session merges within gap") {
    val dir = java.nio.file.Files.createTempDirectory("ev").toString
    val us = 1000L * 1000
    // ns-precision longs, as the real events table stores them
    val events = Seq(
      (1L, 100L, "click", 10L * 60 * us),          // 00:10
      (2L, 100L, "click", 50L * 60 * us),          // 00:50 same hour+session
      (3L, 100L, "click", 8L * 3600 * us),         // 08:00 new session
      (4L, 200L, "view", 10L * 60 * us))
      .map { case (id, u, t, tsUs) => (id, tsUs * 1000, u, t, 1.0, "{}") }
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val tumbling = EventWindows.tumbling(spark, dir).collect()
    assert(tumbling.map(_.getAs[Long]("n_events")).sum == 4)
    assert(tumbling.length == 3) // hour 0 x {click, view}, hour 8 x click

    val sessions = EventWindows.sessions(spark, dir)
      .filter(col("user_id") === 100).collect()
    assert(sessions.map(_.getAs[Long]("n_events")).toSeq.sorted == Seq(1L, 2L))
  }

  test("repetition flags looped text, keeps diverse text, handles short docs") {
    withDocs(
      1L -> "spam ham spam ham spam ham spam ham spam ham spam ham",
      2L -> "every token here is different from all of the others today",
      3L -> "tiny doc") { dir =>
      val out = TextOps.repetition(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("dup_5gram_frac"), r.getAs[Double]("top_tok_frac"),
            r.getAs[Int]("is_repetitive"), r.getAs[Long]("n_5grams"))).toMap
      assert(out(1L)._3 == 1 && out(1L)._1 > 0.5) // "spam ham..." 5-grams repeat
      assert(out(2L)._3 == 0 && out(2L)._1 == 0.0)
      assert(out(3L)._4 == 0L && out(3L)._1 == 0.0) // <5 tokens: no grams, no NaN
    }
  }

  test("piiRedact counts and strips planted emails and phone numbers") {
    // doc_id 12: %3==0 AND %4==0 — both an email and a phone are planted
    withDocs(12L -> "plain text body", 13L -> "nothing here") { dir =>
      val out = TextOps.piiRedact(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"))).toMap
      assert(out(12L) == (1L, 1L))
      assert(out(13L) == (0L, 0L))
    }
  }

  test("word_shingles matches the compositional transform+array_distinct form") {
    graft.functions.VectorFunctions.register(spark)
    val texts = Seq(
      "a b c d e",
      "a b c a b c a b c",         // repeats: distinct order must be first-occurrence
      "x y",                        // < n tokens
      "",                           // empty: one empty token
      "héllo wörld çombo héllo wörld çombo x") // multi-byte UTF-8
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "nrm")
    val got = df.selectExpr("id", "word_shingles(nrm, 3, true) AS s")
      .orderBy("id").collect().map(_.getSeq[String](1))
    val want = df.selectExpr("id",
      "split(nrm, ' ') AS t")
      .selectExpr("id",
        "CASE WHEN size(t) >= 3 THEN array_distinct(transform(sequence(0, size(t)-3), " +
          "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END AS s")
      .orderBy("id").collect().map(_.getSeq[String](1))
    assert(got.toSeq == want.toSeq)
    // non-unique variant: every occurrence, in order
    val raw = df.selectExpr("id", "word_shingles(nrm, 3, false) AS s")
      .orderBy("id").collect().map(_.getSeq[String](1))
    assert(raw(1) == Seq("a b c", "b c a", "c a b", "a b c", "b c a", "c a b", "a b c"))
  }

  test("minhash_sig matches the explode+groupBy 128-min formulation bit-for-bit") {
    graft.functions.VectorFunctions.register(spark)
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("héllo wörld çombo")),                  // multi-byte UTF-8
      (3L, Seq("x y z", "a b c", "x y z")),            // dup elements
      (4L, (0 until 200).map(i => s"tok$i tok${i + 1} tok${i + 2}")))
      .toDF("doc_id", "s")
    val got = df.selectExpr("doc_id", "minhash_sig(s) AS sig")
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    // the r3–r9 relational formulation the kernel replaced
    val coefs = graft.functions.MinHasher.coefs
    val aggs = coefs.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * lit(a) + lit(b)) % lit(2147483647L)).as(s"m$i")
    }.toSeq
    val want = df.select(col("doc_id"), explode(col("s")).as("shingle"))
      .withColumn("h", xxhash64(col("shingle")).bitwiseAND(lit(0xffffffffL)))
      .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .orderBy("doc_id").collect()
      .map(r => (0 until 128).map(i => r.getLong(i + 1)))
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"doc ${i + 1}: signature mismatch")
    }
  }

  test("simhash_sig matches the 60-lambda-pass majority formulation bit-for-bit") {
    graft.functions.VectorFunctions.register(spark)
    val df = Seq(
      (1L, Seq("alpha", "beta", "gamma", "delta")),
      (2L, Seq("héllo", "wörld", "日本語")),             // multi-byte UTF-8
      (3L, Seq.empty[String]),                           // empty set → 0
      (4L, Seq("tie", "break")),                         // n=2: strict majority
      (5L, (0 until 300).map(i => s"tok$i")))
      .toDF("doc_id", "t")
    val got = df.selectExpr("doc_id", "simhash_sig(t) AS sig")
      .orderBy("doc_id").collect().map(_.getLong(1))
    // the compositional formulation the kernel replaced
    val want = df
      .withColumn("hs", expr(
        "transform(t, tok -> CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT))"))
      .withColumn("sig", expr(
        """aggregate(
          |  transform(sequence(0, 59), b ->
          |    IF(2 * size(filter(hs, x -> (shiftright(x, b) & 1) = 1)) > size(hs),
          |       shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))),
          |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin))
      .orderBy("doc_id").collect().map(_.getAs[Long]("sig"))
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"doc ${i + 1}: simhash mismatch")
    }
  }

  test("trigram_counts matches the explode-substring formulation, incl. overlaps") {
    graft.functions.VectorFunctions.register(spark)
    val needles = Seq("aba", " th", "the", "ión", "日本語", "aaa")
    val arr = needles.map(n => s"'$n'").mkString(", ")
    val df = Seq(
      (1L, "ababa the theory"),      // overlapping 'aba' ×2, ' th' ×2, 'the' ×2
      (2L, "nación ión 日本語日本語"),   // multi-byte needles, overlap across repeat
      (3L, "aaaaa"),                 // 'aaa' ×3 overlapping
      (4L, "ab"),                    // under 3 code points → all zeros
      (5L, ""))
      .toDF("doc_id", "n")
    val got = df.selectExpr("doc_id", s"trigram_counts(n, array($arr)) AS tc")
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    // reference: count positions where the code-point substring equals the
    // needle (the formulation the kernel replaced)
    val want = df.orderBy("doc_id").collect().map { r =>
      val text = r.getString(1)
      val cps = text.codePoints.toArray
      needles.map { nd =>
        val ncp = nd.codePoints.toArray
        (0 to cps.length - 3).count(i => cps.slice(i, i + 3).sameElements(ncp)).toLong
      }
    }
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"doc ${i + 1}: trigram counts mismatch (got $g want $w)")
    }
    // sanity on the planted overlaps
    assert(got(0).take(3) == Seq(2L, 2L, 2L))
    assert(got(2)(5) == 3L)
  }

  test("cms_estimate reads back count_min_sketch; exact at test cardinality") {
    graft.functions.VectorFunctions.register(spark)
    val toks = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val df = toks.toDF("tok")
    val sk = df.agg(expr("count_min_sketch(tok, 0.001d, 0.9999d, 42)").as("sk"))
    val probes = Seq("alpha", "beta", "gamma", "absent").toDF("tok")
      .crossJoin(sk)
      .selectExpr("tok", "cms_estimate(sk, tok) AS est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // width e/0.001 ≈ 2718 >> 3 distinct tokens: no collisions, so the
    // estimates are EXACT here — and the never-undercount guarantee means
    // an absent item can only read 0 or a collision (none at this width)
    assert(probes == Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L, "absent" -> 0L))
  }

  test("heavyHitters eps bound holds on the pinned seed+testdata") {
    // Probabilistic-but-seeded: est <= exact + ceil(eps*N) holds with
    // probability ~ confidence (0.9999) PER PROBE, so it lives here — a
    // fixture change that flips it signals re-seeding, not a code defect.
    // The gated oracle asserts only the deterministic never-undercount
    // guarantee (q_heavy_hitters).
    val rows = TextOps.heavyHittersEps(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Boolean]("within_eps_bound")),
      s"eps bound violated for: ${rows.filterNot(_.getAs[Boolean]("within_eps_bound")).mkString(", ")}")
  }

  test("clusters merges chained pairs transitively, split components stay apart") {
    // A-B, B-C chain into one component even though A-C is not a pair;
    // D-E is separate
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = TextOps.clusters(pairs).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("lbl")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("contamination counts test-split shingles that occur in train") {
    // find ids landing in train (<80) and test (>=90) under the md5 split
    val bucket = (id: Long) => spark.sql(
      s"SELECT CAST(conv(substring(md5(CAST($id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100")
      .collect()(0).getLong(0)
    val ids = (0L to 200L)
    val trainId = ids.find(bucket(_) < 80).get
    val testId = ids.find(bucket(_) >= 90).get
    withDocs(
      trainId -> "alpha beta gamma delta epsilon zeta",
      testId -> "alpha beta gamma delta something else entirely now") { dir =>
      val out = TextOps.contamination(spark, dir).collect()
      assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(testId))
      val r = out.head
      // test doc shares shingles "alpha beta gamma", "beta gamma delta"
      assert(r.getAs[Long]("n_contaminated") == 2L)
      assert(r.getAs[Long]("n_shingles") == 6L)
      assert(r.getAs[Double]("contamination") == 2.0 / 6)
    }
  }

  test("bm25Search: term frequency drives rank; no-term docs never appear") {
    withDocs(
      1L -> "spark spark spark stream join pipeline engine runs",
      2L -> "spark appears here once among other words only",
      3L -> "nothing relevant in this document at all",
      4L -> "filler text padding the corpus vocabulary some more") { dir =>
      val rows = TextOps.bm25Search(spark, dir).collect()
        .filter(_.getAs[String]("query") == "q_spark_stream")
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank")).toMap
      assert(rows(1L) < rows(2L),
        s"3x tf plus two more matched terms must outrank a single hit: $rows")
      assert(!rows.contains(3L) && !rows.contains(4L),
        s"docs with no query term must not be retrieved: $rows")
    }
  }

  test("filterFunnel: first-failure attribution covers every rule in order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    Seq(
      (1L, "one two three", "en"),                          // <5 tokens
      (2L, "1 2 3 4 5 6 7 8 9", "en"),                      // no alpha
      (3L, "word word word word word word word word", "en"),// 1/8 distinct
      (4L, "un texte parfaitement raisonnable et varie ici", "fr"),
      (5L, "a perfectly reasonable varied english document here", "en"),
      (6L, "x 9", "fr")) // fails too_short AND lang -> counted ONCE, earlier rule
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.filterFunnel(spark, dir).collect()
      .map(r => r.getAs[String]("verdict") -> r.getAs[Long]("n_docs")).toMap
    assert(out == Map("too_short" -> 2L, "low_alpha" -> 1L, "repetitive" -> 1L,
      "non_target_lang" -> 1L, "kept" -> 1L))
  }

  test("weightedSample: without replacement, deterministic, selection tracks weight") {
    import spark.implicits._
    // 2000 ids in two weight classes (1 vs 10), k=200: heavy docs must be
    // selected at a far higher RATE (A-ES marginal P ∝ w for k << n). The
    // md5-derived u makes the draw deterministic, so the class rates are
    // fixed numbers — the band is generous on purpose (the claim is
    // "tracks weight", not an exact inclusion probability).
    val df = (0L until 2000L).map(i => (i, if (i % 4 == 0) 10L else 1L))
      .toDF("doc_id", "weight")
    val out = operators.TextOps.weightedSampleOf(df, 200).collect()
    assert(out.length == 200)
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == 200, "sample must be without replacement")
    val again = operators.TextOps.weightedSampleOf(df, 200).collect()
      .map(_.getAs[Long]("doc_id"))
    assert(ids.sameElements(again), "hash-derived draw must be deterministic")
    val heavyRate = ids.count(_ % 4 == 0) / 500.0
    val lightRate = ids.count(_ % 4 != 0) / 1500.0
    assert(heavyRate / lightRate > 3.0,
      s"weight-10 docs must be sampled at a far higher rate: " +
        s"heavy=$heavyRate light=$lightRate")
  }

  test("weightedSample plans a distributed top-k, not a global sort") {
    val plan = operators.TextOps.weightedSample(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"the k-by-key draw must fuse to per-partition top-k + merge:\n$plan")
  }

  test("sized LSH: doubling n with bandBits+1 holds per-bucket occupancy flat") {
    // The production contract of embedNearDupSized (SCALING.md): bucket
    // count must track n. Each extra signature bit doubles the bucket
    // space, so 2n vectors at bandBits+1 should land at ~the same
    // per-bucket occupancy as n vectors at bandBits — occupancy (and with
    // it per-bucket candidate PAIRS) stays flat instead of doubling
    // (quadrupling). The doubled corpus rotates each vector one position,
    // preserving the distribution without duplicate signatures.
    val dir = "/root/testdata/sf0.01"
    graft.functions.VectorFunctions.register(spark)
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val rotated = base.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      expr("concat(slice(v, 2, size(v) - 1), slice(v, 1, 1))").as("v"))
    val doubled = base.unionByName(rotated)
    def occupancy(corpus: org.apache.spark.sql.DataFrame, bandBits: Int): Double = {
      val r = operators.Similarity.bandSignatures(corpus, 16, bandBits)
        .agg(count(lit(1)).cast("double").as("n"),
          countDistinct(col("band"), col("sig")).cast("double").as("b"))
        .collect().head
      r.getDouble(0) / r.getDouble(1)
    }
    val occN  = occupancy(base, 6)    // n vectors,  64 buckets/band
    val occ2N = occupancy(doubled, 7) // 2n vectors, 128 buckets/band
    val ratio = occ2N / occN
    assert(ratio > 0.5 && ratio < 2.0,
      s"occupancy must stay ~flat under the sizing rule: n@6bits=$occN, " +
        s"2n@7bits=$occ2N, ratio=$ratio")
    // and the UNSIZED family degrades: 2n at the same bits ≈ 2x occupancy
    val occ2NUnsized = occupancy(doubled, 6)
    assert(occ2NUnsized > 1.5 * occN,
      s"fixed family must show the degradation the sizing rule removes: " +
        s"n@6bits=$occN, 2n@6bits=$occ2NUnsized")
  }

  test("semanticDedup: exact duplicates drop to the lowest id, cross-group survives") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("semdedup").toString
    // 5 groups x 4 EXACT duplicate vectors (cosine 1 within a group),
    // groups on orthogonal axes (cosine 0 across groups, far below theta).
    // Group of vec i = i % 5; axis g carries 1.0 at dim g.
    val rows = (0L until 20L).map { i =>
      val g = (i % 5).toInt
      val v = Array.tabulate(64)(d => if (d == g) 1.0f else 0.0f)
      (i, v, g)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.semanticDedup(spark, dir).collect()
    // every group's three higher ids drop; the lowest (ids 0..4) survive
    val droppedIds = out.map(_.getAs[Long]("vec_id")).toSet
    assert(droppedIds == (5L until 20L).toSet,
      s"exactly the non-minimal duplicates must drop: $droppedIds")
    // n_closer counts the lower-id in-cell neighbors at >= theta
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Long]("n_closer") == id / 5,
        s"vec $id must see ${id / 5} lower-id duplicates")
    }
    // identical-centroid tie (groups appear twice among the 16 k-means
    // init vectors): all members of a group still land in ONE cell —
    // 5 distinct cells across the 15 dropped rows
    assert(out.map(_.getAs[Long]("cell")).distinct.length == 5)
  }

  test("dupSpans merges consecutive duplicated windows into maximal spans") {
    // docs 1 and 2 share a 12-token prefix then diverge; doc 3 is unique.
    // W=8 duplicated windows sit at positions 0..4 (window 4 covers tokens
    // 4..11, the last fully-shared one) => ONE maximal span [0, 11] per doc
    val shared = (1 to 12).map(i => s"a$i").mkString(" ")
    withDocs(
      1L -> s"$shared u1 u2 u3",
      2L -> s"$shared v1 v2 v3",
      3L -> ((1 to 20).map(i => s"z$i").mkString(" "))) { dir =>
      val out = TextOps.dupSpans(spark, dir).collect()
      assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L))
      out.foreach { r =>
        assert(r.getAs[Long]("span_start") == 0L)
        assert(r.getAs[Long]("span_end") == 11L)
        assert(r.getAs[Long]("span_len") == 12L)
        assert(r.getAs[Long]("n_windows") == 5L)
      }
    }
  }

  test("dupSpans: a within-doc repeat splits into two spans, not one") {
    // one doc repeats its own 8-gram twice with a unique separator long
    // enough that no window bridges the two copies into one island
    val block = (1 to 8).map(i => s"b$i").mkString(" ")
    val sep = (1 to 10).map(i => s"s$i").mkString(" ")
    withDocs(
      1L -> s"$block $sep $block",
      2L -> ((1 to 20).map(i => s"y$i").mkString(" "))) { dir =>
      val out = TextOps.dupSpans(spark, dir).collect()
      assert(out.length == 2, s"two separate spans expected: ${out.toSeq}")
      val spans = out.map(r => (r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"))).toSet
      assert(spans == Set((0L, 7L), (18L, 25L)),
        s"both copies of the repeated block must surface: $spans")
    }
  }

  test("spanRemoval keeps the canonical first occurrence, cleans the rest") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ten = (1 to 10).map(i => s"c$i").mkString(" ")
    withDocs(
      1L -> ten,                                   // canonical copy
      2L -> ten,                                   // duplicate: fully removed
      3L -> ((1 to 12).map(i => s"u$i").mkString(" "))) { dir => // untouched
      val out = TextOps.spanRemoval(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_removed"), r.getAs[Long]("n_kept"),
            r.getAs[String]("kept_hash"))).toMap
      assert(out(1L) == ((0L, 10L, md5hex(ten))),
        s"the lower-id canonical copy must survive intact: ${out(1L)}")
      assert(out(2L) == ((10L, 0L, md5hex(""))),
        s"the duplicate copy must clean to empty: ${out(2L)}")
      assert(out(3L)._1 == 0L && out(3L)._2 == 12L,
        s"a unique doc must be untouched: ${out(3L)}")
    }
  }

  test("spanConverge: round 2 detects the PLANTED residual splice duplicates") {
    // removal at window grain is not idempotent: deleting a duplicated
    // middle splices new token adjacencies. Planted: docs 3 and 4 share
    // a 4-token prefix k1..k4 and suffix k5..k8 separated by DIFFERENT
    // duplicated 8-grams (whose canonical homes are docs 1 and 2), so
    // round 1 sees no k-window at all, removal splices both docs to
    // k1..k8, and round 2 must find exactly that new duplicate pair
    val d = (1 to 8).map(i => s"d$i").mkString(" ")
    val e = (1 to 8).map(i => s"e$i").mkString(" ")
    val kPre = (1 to 4).map(i => s"k$i").mkString(" ")
    val kSuf = (5 to 8).map(i => s"k$i").mkString(" ")
    withDocs(
      1L -> d,                      // canonical home of d1..d8
      2L -> e,                      // canonical home of e1..e8
      3L -> s"$kPre $d $kSuf",      // cleans to k1..k8
      4L -> s"$kPre $e $kSuf") { dir => // cleans to k1..k8 too
      val out = TextOps.spanConverge(spark, dir).collect()
        .map(r => r.getAs[Long]("round") ->
          (r.getAs[Long]("n_spans"), r.getAs[Long]("n_windows"),
            r.getAs[Long]("n_docs"), r.getAs[Long]("span_tokens"))).toMap
      // round 1: the d-pair (docs 1,3) and e-pair (docs 2,4) — 4 spans of
      // one window each, 8 tokens per span
      assert(out(1L) == ((4L, 4L, 4L, 32L)),
        s"round 1 must see exactly the planted cross-doc 8-grams: $out")
      // round 2: the spliced k1..k8 windows in docs 3 and 4 — invisible
      // to round 1, found only by re-running detection on cleaned text
      assert(out(2L) == ((2L, 2L, 2L, 16L)),
        s"round 2 must find exactly the planted splice residual: $out")
    }
  }

  test("hybridSearch: rrf is exactly the sum of its leg contributions") {
    val dir = "/root/testdata/sf0.001"
    val out = TextOps.hybridSearch(spark, dir).collect()
    assert(out.nonEmpty)
    def contrib(rank: Long): Long =
      if (rank == 0L) 0L else math.floor(1e9 / (60 + rank)).toLong
    out.foreach { r =>
      val rrf = r.getAs[Long]("rrf")
      val b = r.getAs[Long]("bm25_rank")
      val d = r.getAs[Long]("dense_rank")
      assert(b > 0L || d > 0L, "a fused row must come from at least one leg")
      assert(rrf == contrib(b) + contrib(d),
        s"rrf must recompute from the leg ranks: $r")
    }
    // per query: ranks are 1..k dense, ordered by (rrf desc, doc_id)
    out.groupBy(_.getAs[String]("query")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length).toSeq)
      val key = sorted.map(r => (-r.getAs[Long]("rrf"), r.getAs[Long]("doc_id")))
      assert(key.toSeq == key.sortBy(identity).toSeq)
    }
    // fusion is real: some doc must appear in BOTH legs at sf0.001's
    // corpus (both legs rank the same 500-doc universe)
    assert(out.exists(r => r.getAs[Long]("bm25_rank") > 0L &&
      r.getAs[Long]("dense_rank") > 0L),
      "no doc fused from both legs — the join keys are misaligned")
  }

  test("wordpiece_toks segments by greedy LONGEST match with char fallback") {
    import graft.functions.WordPieceTable
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val table = new WordPieceTable(Array("ta", "tab", "le", "wind", "ow",
      "win", "str", "eam", "ke"))
    def seg(words: String*): Seq[String] = {
      val in = new GenericArrayData(
        words.map(w => UTF8String.fromString(w)).toArray[Any])
      table.segmentAll(in).toArray[AnyRef](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    }
    // "tab" (3) must beat "ta" (2); fallback single chars for gaps
    assert(seg("table") == Seq("tab", "le"))
    assert(seg("window") == Seq("wind", "ow"))
    assert(seg("stream") == Seq("str", "eam"))
    assert(seg("key") == Seq("ke", "y"))
    assert(seg("zzz") == Seq("z", "z", "z"))
    assert(seg("table", "key") == Seq("tab", "le", "ke", "y"))
    // null array elements contribute nothing (containsNull inputs are
    // legal; the output stays null-free as declared)
    val withNull = new GenericArrayData(
      Array[Any](UTF8String.fromString("table"), null,
        UTF8String.fromString("key")))
    assert(table.segmentAll(withNull).toArray[AnyRef](
      org.apache.spark.sql.types.StringType).map(_.toString).toSeq ==
      Seq("tab", "le", "ke", "y"))
    // the no-match fallback consumes a whole code point: a non-BMP char
    // (surrogate pair in Java chars) is emitted intact, never split into
    // two invalid half-surrogate tokens
    val emoji = new String(Character.toChars(0x1F600))
    assert(seg(s"a${emoji}b") == Seq("a", emoji, "b"))
  }

  test("domainDrift matches an independent KL recomputation; drifted source tops") {
    import spark.implicits._
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web"),
      (2L, "the quick brown fox rests under the old tree", "web"),
      (3L, "the lazy dog jumps over the quick brown fox", "books"),
      (4L, "the old tree rests over the quick brown fox", "books"),
      (5L, "zq xv qq zz yy xx ww vv uu tt", "spam"))
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn(
        "lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.domainDrift(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("kl_key"))).toMap
    // independent reference: unigram counts, n_s·KL·1e6 as the exact
    // integer sum of csw * floor(ln((csw·n)/(cw·ns))·1e6)
    val toks = rows.map { case (_, t, src) => src -> t.split(" ").toSeq }
    val csw = toks.flatMap { case (s, ws) => ws.map((s, _)) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val ns = toks.groupBy(_._1).map { case (s, g) => s -> g.flatMap(_._2).size.toLong }
    val cw = csw.groupBy(_._1._2).map { case (w, g) => w -> g.values.sum }
    val n = ns.values.sum
    ns.keys.foreach { s =>
      val terms = csw.collect { case ((`s`, w), c) =>
        c * math.floor(math.log((c * n).toDouble / (cw(w) * ns(s))) * 1e6).toLong }
      val distinct = csw.keys.count(_._1 == s).toLong
      assert(out(s) == ((ns(s), distinct, terms.sum)),
        s"source $s diverges: got ${out(s)}, want (${ns(s)}, $distinct, ${terms.sum})")
    }
    // the vocabulary-disjoint source must dominate the drift ranking
    val meanKl = (s: String) => out(s)._3.toDouble / out(s)._1
    assert(meanKl("spam") > meanKl("web") && meanKl("spam") > meanKl("books"),
      s"the drifted source must score highest: ${out.map { case (k, v) => k -> meanKl(k) }}")
  }

  test("lmPerplexity matches an independent bigram-LM reimplementation") {
    // Laplace bigram LM trained on the md5 80% split, scored corpus-wide,
    // per-bigram floor(-ln p * 1e6) summed per doc — recomputed here from
    // scratch (own md5 split, own counts, own math)
    // ids 6 and 9 hash OUTSIDE the 80% train split (h60 % 100 = 86, 95),
    // so the LM provably scores docs it never trained on
    val texts = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the dog sat on the log",
      3L -> "a completely different sentence here today",
      4L -> "the cat sat on the mat again and again",
      6L -> "the cat sat on the log",
      9L -> "zq xv qq zz yy xx")
    withDocs(texts: _*) { dir =>
      val out = TextOps.lmPerplexity(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_bigrams"), r.getAs[Long]("nll_key"),
            r.getAs[Boolean]("keep"))).toMap
      def h60(id: Long): Long = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(15), 16)
      }
      val docWords = texts.map { case (id, t) => id -> t.split(" ").toSeq }
      val trainDocs = docWords.filter { case (id, _) => h60(id) % 100 < 80 }
      assert(trainDocs.size < texts.size && trainDocs.nonEmpty,
        "fixture must split non-trivially or the train/score distinction is untested")
      val trainBi = trainDocs.flatMap { case (_, w) =>
        w.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))) }
      val c2 = trainBi.groupBy(identity).map { case (k, g) => k -> g.size }
      val c1 = trainBi.groupBy(_._1).map { case (k, g) => k -> g.size }
      val v = trainDocs.flatMap(_._2).distinct.size.toDouble
      docWords.foreach { case (id, w) =>
        val terms = w.sliding(2).filter(_.size == 2).map { p =>
          val pr = (c2.getOrElse((p(0), p(1)), 0) + 1.0) /
            (c1.getOrElse(p(0), 0) + v)
          math.floor(-math.log(pr) * 1e6).toLong
        }.toSeq
        val key = terms.sum
        assert(out(id) == ((terms.size.toLong, key,
          terms.nonEmpty && key < 3400000L * terms.size)),
          s"doc $id diverges: got ${out(id)}, want (${terms.size}, $key)")
      }
      // the unseen-heavy doc must score strictly worse than a doc made of
      // trained bigrams — the property that makes the filter a filter
      val mean = (id: Long) => out(id)._2.toDouble / out(id)._1
      assert(mean(9L) > mean(1L),
        s"unseen-heavy text must carry higher perplexity: ${mean(9L)} vs ${mean(1L)}")
    }
  }

  test("bpeTrainMerges reproduces an independent in-memory BPE reference") {
    // symbol-VECTOR reference (no sentinel-string trick): greedy
    // left-to-right non-overlapping merge application, argmax by
    // (count DESC, lhs, rhs) — the exact Sennrich et al. procedure
    def applyMerge(v: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]; var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == l && v(i + 1) == r) { b += (l + r); i += 2 }
        else { b += v(i); i += 1 }
      }
      b.result()
    }
    def refBpe(texts: Seq[String], n: Int): Seq[(String, String, Long)] = {
      var cur: Seq[(Vector[String], Long)] = texts
        .flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).toSeq
        .map { case (w, g) => w.map(_.toString).toVector -> g.size.toLong }
      val out = Seq.newBuilder[(String, String, Long)]
      for (_ <- 1 to n) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- cur; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), k) => (-k, a, b) }
        out += ((l, r, c))
        cur = cur.map { case (v, f) => applyMerge(v, l, r) -> f }
      }
      out.result()
    }
    val texts = Seq(
      "the stream then the stream there",
      "streaming the streams they stream",
      "other weather together the them",
      "this that the other stream flows")
    withDocs(texts.zipWithIndex.map { case (t, i) => (i + 1).toLong -> t }: _*) { dir =>
      val got = TextOps.bpeTrainMerges(spark, dir)
      assert(got == refBpe(texts, got.size),
        s"trained merges diverge from the reference:\n$got")
      // the trajectory must be genuinely multi-round on this corpus: some
      // later merge consumes an earlier merge's product (e.g. t+h → th,
      // th+e → the), or the corpus is too trivial to exercise the loop
      val products = got.map { case (l, r, _) => l + r }.toSet
      assert(got.exists { case (l, r, _) =>
        products.contains(l) || products.contains(r) },
        s"no merge builds on a previous round's product:\n$got")
    }
  }

  test("wordpieceTrainMerges reproduces an independent likelihood-ratio reference") {
    // symbol-VECTOR reference of the WordPiece selection rule: argmax of
    // count(ab) / (count(a) * count(b)) with (score DESC, lhs, rhs)
    // tie-break, greedy non-overlapping merge application per round
    def applyMerge(v: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]; var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == l && v(i + 1) == r) { b += (l + r); i += 2 }
        else { b += v(i); i += 1 }
      }
      b.result()
    }
    def refWp(texts: Seq[String], n: Int): Seq[(String, String, Long, Long, Long)] = {
      var cur: Seq[(Vector[String], Long)] = texts
        .flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).toSeq
        .map { case (w, g) => w.map(_.toString).toVector -> g.size.toLong }
      val out = Seq.newBuilder[(String, String, Long, Long, Long)]
      for (_ <- 1 to n) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        val sc = scala.collection.mutable.Map.empty[String, Long]
        for ((syms, f) <- cur) {
          for (s0 <- syms) sc(s0) = sc.getOrElse(s0, 0L) + f
          for (i <- 0 until syms.length - 1)
            pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + f
        }
        val ((l, r), c) = pc.toSeq.minBy { case ((a, b), k) =>
          (-k.toDouble / (sc(a).toDouble * sc(b).toDouble), a, b)
        }
        out += ((l, r, c, sc(l), sc(r)))
        cur = cur.map { case (v, f) => applyMerge(v, l, r) -> f }
      }
      out.result()
    }
    val texts = Seq(
      "the stream then the stream there",
      "streaming the streams they stream",
      "other weather together the them",
      "this that the other stream flows")
    withDocs(texts.zipWithIndex.map { case (t, i) => (i + 1).toLong -> t }: _*) { dir =>
      val got = TextOps.wordpieceTrainMerges(spark, dir)
      assert(got == refWp(texts, got.size),
        s"trained merges diverge from the reference:\n$got")
      // the likelihood ratio must actually bite on this corpus: the
      // trajectory must differ from frequency-greedy BPE's on the same
      // texts, or the gate is indistinguishable from q_bpe_train
      val bpe = TextOps.bpeTrainMerges(spark, dir)
        .map { case (l, r, _) => (l, r) }
      assert(got.map { case (l, r, _, _, _) => (l, r) } != bpe.take(got.size),
        s"wordpiece trajectory identical to BPE's — scoring not exercised")
    }
  }

  test("subwordTokenize matches an independent greedy reimplementation") {
    // independent Scala greedy segmenter over the production vocab,
    // applied to inline docs; the operator's checksum must reproduce it
    val vocab = Seq("ta", "ble", "tab", "le", "wi", "nd", "ow", "win",
      "dow", "sp", "ar", "spark", "me", "rge", "mer", "ge", "so", "rt",
      "ba", "tch", "ha", "sh", "va", "lue", "pa", "rt", "ro", "sc", "an",
      "ke", "ag", "li", "ne", "sl", "fa", "st", "qu", "ery", "jo", "in",
      "the", "val", "wind", "str", "eam")
    val vs = vocab.toSet
    val mx = vocab.map(_.length).max
    def seg(w: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var p = 0
      while (p < w.length) {
        val tok = (math.min(mx, w.length - p) to 2 by -1).iterator
          .map(l => w.substring(p, p + l)).find(vs.contains)
          .getOrElse(w.substring(p, p + 1))
        out += tok; p += tok.length
      }
      out.toSeq
    }
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = Seq(1L -> "Table  WINDOW stream key", 2L -> "spark merge batch zq")
    withDocs(texts: _*) { dir =>
      val out = TextOps.subwordTokenize(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_subtokens"), r.getAs[String]("tok_checksum"))).toMap
      texts.foreach { case (id, text) =>
        val words = text.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").toSeq
        val st = words.flatMap(seg)
        assert(out(id) == ((st.length.toLong, md5hex(st.mkString(" ")))),
          s"doc $id: expected ${st.mkString("|")}")
      }
    }
  }

  test("qualityClassifier matches an independent per-token recomputation") {
    // independent reimplementation: JVM md5 + 60-bit prefix parse, the
    // same weight derivation re-done from its spec (not the object's val)
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(x: String): Long = java.lang.Long.parseLong(md5hex(x).take(15), 16)
    val weights = (0 until 64).map(j => (Integer.parseInt(md5hex(s"w_$j").take(1), 16)) - 8)
    withDocs(
      1L -> "Key  Agg row SCAN slow",
      2L -> "hash value table part merge batch spark window") { dir =>
      val out = TextOps.qualityClassifier(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("score"),
            r.getAs[Boolean]("keep"))).toMap
      Seq(1L -> "Key  Agg row SCAN slow",
        2L -> "hash value table part merge batch spark window").foreach {
        case (id, text) =>
          val toks = text.toLowerCase.trim.replaceAll("\\s+", " ").split(" ")
          val score = toks.map(t => weights((h60(t) % 64).toInt).toLong).sum
          assert(out(id) == ((toks.length.toLong, score, score > 0)),
            s"doc $id: expected (${toks.length}, $score, ${score > 0}), got ${out(id)}")
      }
    }
  }
  test("pagerank: integer fixpoint matches an independent replay; hubs outrank leaves") {
    // supplier 1 links to customers 1-4 (hub), supplier 2 only to
    // customer 1 (leaf): after any number of rounds the hub must
    // out-rank the leaf, and every rank must equal an independent
    // driver-side replay of the exact integer iteration (own adjacency,
    // own arithmetic - the trajectory, not just the ordering)
    val dir = java.nio.file.Files.createTempDirectory("pr").toString
    Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 1L))
      .toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 2L))
      .toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Graph.pagerank(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val arcs = Seq("s1" -> "c1", "s1" -> "c2", "s1" -> "c3", "s1" -> "c4",
      "s2" -> "c1").flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val outDeg = arcs.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val nodes = arcs.map(_._1).distinct
    var rank = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 1 to 5) {
      val inflow = arcs.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (srcN, _) => rank(srcN) / outDeg(srcN) }.sum
      }
      rank = nodes.map(n =>
        n -> (150000000L + 85L * inflow.getOrElse(n, 0L) / 100L)).toMap
    }
    assert(got == rank, s"got $got, expected $rank")
    assert(got("s1") > got("s2"))
  }

  test("image dhash near-dup: brightness-shift invariant, gradient-sensitive") {
    // doc 1 ramps up (dhash = all zero bits), doc 2 ramps down (all 56
    // bits set): each original shares a signature with its planted
    // brightness-shifted re-crawl twin - the invariance a perceptual hash
    // exists for - so each twin pair collapses to one cluster and emits a
    // hamming-0 star edge, while the two docs' opposite gradients stay 56
    // bits apart and must NOT pair. doc 3 is doc 1 with its last two
    // chars swapped - exactly one gradient bit flips (k=55), so its
    // cluster rep pairs with doc 1's at hamming 1: the near-edge path.
    // Every hash here went through the real GIF encode->decode round trip.
    val up = (32 until 96).map(_.toChar).mkString
    val down = (32 until 96).reverse.map(_.toChar).mkString
    val upSwap = up.dropRight(2) + up.takeRight(2).reverse
    withDocs(1L -> up, 2L -> down, 3L -> upSwap) { dir =>
      val got = graft.multimodal.Multimodal.imageDhashNearDup(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((2L, 3L, 0L), (4L, 5L, 0L), (6L, 7L, 0L),
        (2L, 6L, 1L)), s"got $got")
    }
  }

  test("audio fingerprint near-dup: volume-invariant, energy-delta-sensitive") {
    // doc 1's per-window sample value rises (w+2 in window w -> every
    // used window-energy transition rises -> all 56 bits set), doc 2's
    // falls (all bits clear): each original shares a fingerprint with its
    // volume-doubled re-encode twin EXACTLY (energies all scale by 4;
    // strict comparisons preserved) - the invariance an audio fingerprint
    // exists for - so each twin pair collapses to one cluster and emits a
    // hamming-0 star edge, while the opposite energy ramps stay 56 bits
    // apart and must NOT pair. doc 3 is doc 1 with window 28's odd (high
    // band) samples dropped to 3 - window 28 feeds ONLY transition 27, so
    // exactly bit 55 flips and its rep pairs with doc 1's at hamming 1.
    // Every fingerprint here ran the real WAV encode->decode round trip.
    val rise = (0 until 128).map(i => (81 + i / 4).toChar).mkString
    val fall = (0 until 128).map(i => (112 - i / 4).toChar).mkString
    val riseDip = rise.zipWithIndex.map { case (c, i) =>
      if (i == 113 || i == 115) 82.toChar else c
    }.mkString
    withDocs(1L -> rise, 2L -> fall, 3L -> riseDip) { dir =>
      val got = graft.multimodal.Multimodal.audioFpNearDup(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((2L, 3L, 0L), (4L, 5L, 0L), (6L, 7L, 0L),
        (2L, 6L, 1L)), s"got $got")
    }
  }

  test("video dhash near-dup: aligned-frame rule over the real multi-frame decode") {
    // two-frame videos: doc 1 = up-ramp in both frames (both frame hashes
    // all-zero), doc 2 = down-ramp twice (all-ones) - 112 bits apart,
    // never pairs. Each brightness-shifted twin has identical per-frame
    // gradients -> identical SEQUENCE -> hamming-0 star edge. doc 3
    // shares frame 0 with doc 1 and flips exactly one gradient bit in
    // frame 1, so the composite (band0, band1) keys still collide and the
    // aligned-frame verify emits the pair at total hamming 1. Every
    // signature here decoded a real 2-frame animated GIF.
    val up = (32 until 96).map(_.toChar).mkString
    val down = (32 until 96).reverse.map(_.toChar).mkString
    val upSwap = up.dropRight(2) + up.takeRight(2).reverse
    withDocs(1L -> (up + up), 2L -> (down + down), 3L -> (up + upSwap)) { dir =>
      val got = graft.multimodal.Multimodal.videoDhashNearDup(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((2L, 3L, 0L), (4L, 5L, 0L), (6L, 7L, 0L),
        (2L, 6L, 1L)), s"got $got")
    }
  }

  test("multimodal curation funnel: per-source counts are a monotone partition of the batch") {
    // algebra invariants the chained oracle cannot state directly: each
    // source's funnel is monotone non-increasing left to right, and the
    // n_in column partitions exactly the 20% batch split of the corpus.
    val dir = "/root/testdata/sf0.001"
    val rows = graft.multimodal.Multimodal
      .multimodalCurationServe(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = (1 to 5).map(r.getLong)
      assert(f.zip(f.tail).forall { case (x, y) => x >= y } && f.last >= 0,
        s"non-monotone funnel for ${r.getString(0)}: $f")
    }
    val batchTotal = graft.Tables.load(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100 >= 80"))
      .count()
    assert(rows.map(_.getLong(1)).sum == batchTotal,
      s"n_in must partition the batch: ${rows.map(_.getLong(1)).sum} vs $batchTotal")
  }

  test("DSIR selection ranks target-vocabulary raw docs above disjoint ones") {
    // planted importance signal: src0 is the target domain; two raw docs
    // share its vocabulary, two use a disjoint one — the hashed
    // log-ratio model must prefer the sharers (the paper's §3 premise).
    // All hashes are md5-fixed, so the ranking is deterministic; a
    // fixture change that flips it signals bucket-collision re-seeding,
    // not a code defect.
    val rows = Seq(
      (1L, "alpha beta gamma delta alpha beta", "src0"),
      (2L, "alpha gamma delta beta gamma", "src0"),
      (11L, "alpha beta gamma delta", "srcX"),
      (12L, "beta gamma alpha delta delta", "srcX"),
      (21L, "zulu yankee xray whiskey victor", "srcX"),
      (22L, "uniform tango sierra romeo quebec", "srcX"))
    val dir = java.nio.file.Files.createTempDirectory("dsirdocs").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = TextOps.dsirSelect(spark, dir).collect()
    val rank = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("rank")).toMap
    for (sim <- Seq(11L, 12L); junk <- Seq(21L, 22L))
      assert(rank(sim) < rank(junk),
        s"target-vocabulary doc $sim must outrank disjoint doc $junk: $rank")
    // ranks are a gap-free total order (score DESC, doc_id tiebreak)
    assert(out.map(_.getAs[Long]("rank")).sorted.toSeq ==
      (1L to out.length).toSeq)
  }

  test("ANN recall eval: per-query counts are well-formed and recall holds its floor") {
    // the eval gate's CONTRACT, not its values (the oracle owns those):
    // n_truth = k for every query, 0 <= n_hits <= n_truth, and the
    // measured aggregate recall stays above the floor the 4/16-probe IVF
    // geometry is sized for — a drop below it is an index regression,
    // the alarm this eval loop exists to raise
    val out = Similarity.annRecall(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getAs[Long]("n_truth") == 5L)
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0L && h <= 5L)
    }
    val recall = out.map(_.getAs[Long]("n_hits")).sum.toDouble /
      out.map(_.getAs[Long]("n_truth")).sum
    assert(recall >= 0.6, s"recall@5 fell to $recall")
  }

  test("ANN recall eval triple: PQ and LSH legs share the contract, PQ >= LSH") {
    // X105: same well-formedness contract as the IVF leg, plus the
    // design claim the triple exists to measure — the quantized serve
    // probe (reranked with exact cosines) retrieves better than the
    // near-dup-tuned 16x6 SRP bands, which is WHY PQ/IVF are the
    // retrieval paths and LSH is the dedup path
    def agg(rows: Array[org.apache.spark.sql.Row]): Double = {
      assert(rows.length == 10)
      rows.foreach { r =>
        assert(r.getAs[Long]("n_truth") == 5L)
        val h = r.getAs[Long]("n_hits")
        assert(h >= 0L && h <= 5L)
      }
      rows.map(_.getAs[Long]("n_hits")).sum.toDouble /
        rows.map(_.getAs[Long]("n_truth")).sum
    }
    val pq = agg(Similarity.annRecallPq(spark, "/root/testdata/sf0.001").collect())
    val lsh = agg(Similarity.annRecallLsh(spark, "/root/testdata/sf0.001").collect())
    assert(pq >= 0.6, s"PQ recall@5 fell to $pq")
    assert(pq >= lsh, s"PQ serve probe ($pq) must not trail the SRP bands ($lsh)")
  }

  test("cohort retention staircase matches a hand-computed multi-cohort fixture") {
    import spark.implicits._
    def t(d: String) = java.sql.Timestamp.valueOf(s"$d 10:00:00")
    // Mondays: 2024-01-01, -08, -15. u1 joins wk0 and stays 3 weeks;
    // u2 joins wk0, skips wk1, returns wk2; u3 joins wk1 only
    val ev = Seq(
      (1L, t("2024-01-01")), (1L, t("2024-01-09")), (1L, t("2024-01-16")),
      (2L, t("2024-01-02")), (2L, t("2024-01-17")),
      (3L, t("2024-01-10"))).toDF("user_id", "ts")
    val out = graft.operators.EventWindows.cohortRetentionOf(ev).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 2L) -> 2L, ("2024-01-08", 0L) -> 1L), s"$out")
  }

  test("event funnel: greedy fold computes exact per-user reach on a planted fixture") {
    import spark.implicits._
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // u1 completes; u2 signs up but never views AFTER it; u3 stops at
    // view; u4 never signs up (later steps can't count without step 1);
    // u5 has every type but in exactly reverse order — reach 1
    val ev = Seq(
      (1L, t(1), "signup"), (1L, t(2), "view"), (1L, t(3), "click"), (1L, t(4), "purchase"),
      (2L, t(1), "view"), (2L, t(2), "signup"), (2L, t(3), "click"), (2L, t(4), "purchase"),
      (3L, t(1), "signup"), (3L, t(2), "view"), (3L, t(3), "purchase"),
      (4L, t(1), "view"), (4L, t(2), "click"), (4L, t(3), "purchase"),
      (5L, t(1), "purchase"), (5L, t(2), "click"), (5L, t(3), "view"), (5L, t(4), "signup"))
      .toDF("user_id", "ts", "event_type")
    val out = graft.operators.EventWindows.eventFunnelOf(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 4L, 2L -> 2L, 3L -> 1L, 4L -> 1L), s"$out")
  }

  test("epoch plan: every epoch is a full permutation with a fresh shard order") {
    val dir = "/root/testdata/sf0.001"
    val out = TextOps.queries("q_epoch_plan")(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    val byEpoch = out.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    // permutation: each epoch's shards partition the whole corpus
    byEpoch.values.foreach(rows =>
      assert(rows.map(_.getAs[Long]("n_docs")).sum == total))
    // fresh order: epoch is part of the hash draw, so shard contents and
    // orders change between epochs (same corpus bytes, new permutation)
    val cs = out.map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("shard"))
      -> r.getAs[String]("order_checksum")).toMap
    assert((0L until 8L).exists(sh => cs((0L, sh)) != cs((1L, sh))))
  }

  test("retention purge: BM25 delete removes the purged source and rewrites ranks") {
    // the takedown must be VISIBLE (purged docs sat in the top-k before),
    // COMPLETE (none after), and GLOBAL (df/n_docs/avgdl shifted, so the
    // after-set is not merely before minus purged rows — the oracle owns
    // cell-exactness, this pins non-vacuity)
    val dir = "/root/testdata/sf0.001"
    val purgedIds = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("source") === TextOps.PurgeSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val before = TextOps.queries("q_bm25_serve")(spark, dir).collect()
    val after = TextOps.queries("q_bm25_index_delete")(spark, dir).collect()
    def ids(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getAs[Long]("doc_id"))
    assert(ids(before).exists(purgedIds), "purge must intersect the before top-k")
    assert(!ids(after).exists(purgedIds), "purged doc survived the index delete")
    assert(ids(before).toSeq != ids(after).toSeq)
  }

  test("retention purge: MinHash and SRP witness rows satisfy the exact identities") {
    val dir = "/root/testdata/sf0.001"
    val mh = TextOps.queries("q_dedup_index_purge")(spark, dir).head()
    def l(r: org.apache.spark.sql.Row, c: String) = r.getAs[Long](c)
    assert(l(mh, "n_purged") > 0L)
    assert(l(mh, "n_history") - l(mh, "n_purged") == l(mh, "n_history_after"))
    // the half-purge alarm: the bands FILE itself shrank in lockstep
    assert(l(mh, "n_band_rows_after") == 32L * l(mh, "n_history_after"))
    assert(l(mh, "n_pairs_to_purged") > 0L,
      "fixture must exercise actual pair removal")
    assert(l(mh, "n_pairs_before") - l(mh, "n_pairs_to_purged")
      == l(mh, "n_pairs_after"))
    val sp = Similarity.queries("q_vec_index_purge")(spark, dir).head()
    assert(l(sp, "n_purged") > 0L)
    assert(l(sp, "n_history") - l(sp, "n_purged") == l(sp, "n_history_after"))
    assert(l(sp, "n_sig_rows_after") == 16L * l(sp, "n_history_after"))
    assert(l(sp, "n_pairs_before") - l(sp, "n_pairs_to_purged")
      == l(sp, "n_pairs_after"))
  }

  test("SRP batch and streaming probe spellings agree pair-for-pair, cosine included") {
    // the vector-side fork-equivalence pin (the MultimodalSpec twin): the
    // streaming door carries (v, nn) per row where the batch door signs
    // then joins — same kernel spellings operand-for-operand, so outputs
    // must be identical down to the cosine doubles
    val dir = "/root/testdata/sf0.001"
    val root = Similarity.srpBuildIndex(spark, dir)
    val raw = graft.Tables.load(spark, dir, "embeddings")
    def triples(df: org.apache.spark.sql.DataFrame) = df
      .select("batch_vec", "hist_vec", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val batchSide = triples(
      Similarity.serveVecDedupIncremental(spark, raw, root))
    val streamSide = triples(Similarity.streamProbeSrpIndex(spark,
      raw.filter(!Similarity.isHistoryVec), root))
    assert(batchSide == streamSide, "SRP fork diverged")
    assert(batchSide.nonEmpty, "fixture must surface pairs")
  }

  test("ingest cycles: SRP and semantic update witnesses satisfy the exact identities") {
    // the X82 contract on the two vector index families: accepted rows
    // append, history never shrinks, and the SAME batch re-probed against
    // the patched index is fully recognized (effectively-once)
    val dir = "/root/testdata/sf0.001"
    def l(r: org.apache.spark.sql.Row, c: String) = r.getAs[Long](c)
    val vu = Similarity.queries("q_vec_index_update")(spark, dir).head()
    assert(l(vu, "n_batch") > 0L && l(vu, "n_accepted") > 0L)
    assert(l(vu, "n_dup_batch") + l(vu, "n_accepted") == l(vu, "n_batch"))
    assert(l(vu, "n_history") + l(vu, "n_accepted")
      == l(vu, "n_history_after"))
    // the half-update alarm: the sig FILE grew in lockstep with vecs
    assert(l(vu, "n_sig_rows_after") == 16L * l(vu, "n_history_after"))
    assert(l(vu, "n_second_pass_dup") == l(vu, "n_batch"))
    val su = Similarity.queries("q_semantic_index_update")(spark, dir).head()
    assert(l(su, "n_batch") > 0L && l(su, "n_accepted") > 0L)
    assert(l(su, "n_dup_batch") + l(su, "n_accepted") == l(su, "n_batch"))
    assert(l(su, "n_history") + l(su, "n_accepted")
      == l(su, "n_history_after"))
    assert(l(su, "n_second_pass_dup") == l(su, "n_batch"))
    val sx = Similarity.queries("q_semantic_index_purge")(spark, dir).head()
    assert(l(sx, "n_purged") > 0L)
    assert(l(sx, "n_history") - l(sx, "n_purged") == l(sx, "n_history_after"))
    assert(l(sx, "n_pairs_before") - l(sx, "n_pairs_to_purged")
      == l(sx, "n_pairs_after"))
  }

  test("BM25 incremental add: batch docs enter service, history stats shift") {
    // the append half of the postings lifecycle: the before-phase serves
    // only history (structurally — the index has no batch postings), the
    // after-phase must actually SURFACE added docs (visibility), and
    // rankings must shift (df/n_docs/avgdl moved — an add that only
    // appends postings but keeps stale global stats reproduces `before`)
    val dir = "/root/testdata/sf0.001"
    val out = TextOps.queries("q_bm25_index_add")(spark, dir).collect()
    val batchIds = spark.read.parquet(s"$dir/documents.parquet")
      .filter(!TextOps.isHistoryDoc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val before = out.filter(_.getAs[String]("phase") == "before")
    val after = out.filter(_.getAs[String]("phase") == "after")
    assert(before.nonEmpty && after.nonEmpty)
    assert(!before.exists(r => batchIds(r.getAs[Long]("doc_id"))),
      "the history index cannot serve a batch doc")
    assert(after.exists(r => batchIds(r.getAs[Long]("doc_id"))),
      "an added doc must enter the served top-k")
    def ranked(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getAs[String]("query"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"))).sortBy(t => (t._1, t._2)).toSeq
    assert(ranked(before) != ranked(after))
  }

  test("unigram trainer: stored vocab serves words at independently recomputed optimal costs") {
    // the hard-EM contract checked from outside Spark: take the TRAINED
    // piece table the gate emits, rerun the min-plus Viterbi naively in
    // driver Scala (no Spark, no higher-order expressions), and the
    // apply gate's per-doc seg_key must equal the naive sum exactly —
    // integer DP has one right answer
    val rows = Seq(
      (1L, "abab abab banana ban"),
      (2L, "banana abab cd cd"),
      (3L, "xyz banana abab ab"))
    withDocs(rows: _*) { dir =>
      val vocab = graft.operators.Unigram.unigramTrain(spark, dir).collect()
        .map(r => r.getAs[String]("piece") -> r.getAs[Long]("cost")).toMap
      // character coverage: every corpus char must survive every prune
      rows.flatMap(_._2.replace(" ", "")).toSet.foreach { c: Char =>
        assert(vocab.contains(c.toString), s"char $c pruned from vocab")
      }
      def best(w: String): Long = {
        val n = w.length; val inf = Long.MaxValue / 4
        val dp = Array.fill(n + 1)(inf); dp(0) = 0L
        for (i <- 1 to n; l <- 1 to math.min(4, i)) {
          val p = w.substring(i - l, i)
          vocab.get(p).foreach(c => dp(i) = math.min(dp(i), dp(i - l) + c))
        }
        dp(n)
      }
      val byDoc = rows.toMap
      graft.operators.Unigram.unigramTokenize(spark, dir).collect()
        .foreach { r =>
          val words = byDoc(r.getAs[Long]("doc_id")).split(" ").map(_.take(12))
          assert(r.getAs[Long]("n_words") == words.length.toLong)
          assert(r.getAs[Long]("seg_key") == words.map(best).sum,
            s"doc ${r.getAs[Long]("doc_id")}: gate seg_key " +
              s"${r.getAs[Long]("seg_key")} vs naive ${words.map(best).sum}")
        }
    }
  }

}
