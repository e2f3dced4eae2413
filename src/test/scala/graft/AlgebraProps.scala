package graft

import graft.api.Api
import graft.warehouse.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based algebra checks on the core operators (SURVEY §5):
  * pagination partitions the ordered result, balances conserve to zero,
  * merges are idempotent, upsert keeps exactly one row per key.
  */
object AlgebraProps extends Properties("graft.algebra") {

  // each trial runs several Spark jobs; 8 trials x 4 properties is plenty
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val genTransfers: Gen[List[(String, String, Int, String, String, BigDecimal)]] =
    Gen.listOfN(40, for {
      tx <- Gen.choose(1, 25)
      transfer <- Gen.choose(1, 3)
      status <- Gen.oneOf(0, 1, 1, 2)
      credit <- Gen.oneOf("a", "b", "c", "d")
      debit <- Gen.oneOf("a", "b", "c", "d")
      amount <- Gen.choose(1, 10000)
    } yield (s"tx$tx", s"t$transfer", status, credit, debit, BigDecimal(amount)))

  private def df(rows: List[(String, String, Int, String, String, BigDecimal)]): DataFrame =
    // key-dedupe in Scala (first occurrence wins) so repeated evaluation of
    // the plan yields identical rows — dropDuplicates picks arbitrarily
    rows.distinctBy(r => (r._1, r._2))
      .toDF("transaction", "transfer", "status", "credit_name", "debit_name", "amount")
      .withColumn("tenant", lit("T"))
      .withColumn("credit_tenant", lit("T")).withColumn("debit_tenant", lit("T"))
      .withColumn("currency", lit("CZK"))
      .withColumn("value_date", lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))

  property("pages partition the ordered result") = forAll(genTransfers,
    Gen.choose(1, 7)) { (rows, pageSize) =>
    val t = df(rows)
    val full = Api.transfers(t, "T", limit = 1000, offset = 0)
      .select("transaction", "transfer").collect().map(_.toSeq).toSeq
    val paged = (0 to full.size / pageSize).flatMap { p =>
      Api.transfers(t, "T", limit = pageSize, offset = p.toLong * pageSize)
        .select("transaction", "transfer").collect().map(_.toSeq)
    }
    paged == full
  }

  property("balances conserve: sum over all accounts is zero") =
    forAll(genTransfers) { rows =>
      val balances = Warehouse.balances(Warehouse.balanceChanges(df(rows)))
        .agg(coalesce(sum("balance"), lit(0)).cast("decimal(38,18)"))
        .collect()(0).getDecimal(0)
      balances.compareTo(java.math.BigDecimal.ZERO) == 0
    }

  property("insert-only merge is idempotent and disjoint from existing") =
    forAll(genTransfers, genTransfers) { (a, b) =>
      val keys = Seq("tenant", "transaction", "transfer")
      val existing = df(a)
      val incoming = df(b)
      val fresh = Warehouse.newRows(incoming, existing, keys)
      val again = Warehouse.newRows(incoming, existing.unionByName(fresh), keys)
      val overlap = fresh.join(existing, keys, "left_semi").count()
      overlap == 0 && again.isEmpty
    }

  property("upsert keeps exactly one row per key, preferring incoming") =
    forAll(genTransfers, genTransfers) { (a, b) =>
      val keys = Seq("tenant", "transaction", "transfer")
      val existing = df(a)
      val incoming = df(b).withColumn("amount", lit(BigDecimal(-1)))
      val merged = Warehouse.upsert(incoming, existing, keys, Seq("amount"))
      val perKey = merged.groupBy(keys.map(col): _*).count()
        .filter(col("count") > 1).count()
      val incomingWon = merged.join(incoming, keys, "left_semi")
        .filter(col("amount") =!= -1).count()
      perKey == 0 && incomingWon == 0
    }

  // ---- greedy subword segmentation (the wordpiece_toks kernel) --------
  // pure JVM kernel, no Spark jobs: properties are cheap, run the default
  // 100 trials by generating fresh vocab+words per trial

  private val genPiece: Gen[String] = for {
    n <- Gen.choose(1, 4)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val genVocabAndWords: Gen[(List[String], List[String])] = for {
    vocab <- Gen.listOfN(12, genPiece).map(_.distinct)
    words <- Gen.listOfN(8, for {
      n <- Gen.choose(1, 12)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString)
  } yield (vocab, words)

  private def segment(vocab: List[String], words: List[String]): List[List[String]] = {
    val table = new graft.functions.WordPieceTable(vocab.toArray)
    val in = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      words.map(w => org.apache.spark.unsafe.types.UTF8String.fromString(w)).toArray[Any])
    val flat = table.segmentAll(in).toArray[AnyRef](
      org.apache.spark.sql.types.StringType).map(_.toString).toList
    // re-split the flattened stream back per word by consuming lengths
    words.foldLeft((flat, List.empty[List[String]])) { case ((rest, acc), w) =>
      var taken = List.empty[String]; var len = 0; var r = rest
      while (len < w.length) { taken = taken :+ r.head; len += r.head.length; r = r.tail }
      (r, acc :+ taken)
    }._2
  }

  property("segmentation concatenates back to the input, totally") =
    forAll(genVocabAndWords) { case (vocab, words) =>
      segment(vocab, words).zip(words)
        .forall { case (toks, w) => toks.mkString == w }
    }

  property("every emitted token is in-vocab or a single char") =
    forAll(genVocabAndWords) { case (vocab, words) =>
      val vs = vocab.toSet
      segment(vocab, words).flatten
        .forall(t => vs.contains(t) || t.length == 1)
    }

  property("greedy: no emitted token admits a longer vocab match at its position") =
    forAll(genVocabAndWords) { case (vocab, words) =>
      val vs = vocab.toSet
      val maxLen = (1 :: vocab.map(_.length)).max
      segment(vocab, words).zip(words).forall { case (toks, w) =>
        toks.foldLeft((0, true)) { case ((p, ok), t) =>
          val longer = ((t.length + 1) to math.min(maxLen, w.length - p))
            .exists(l => vs.contains(w.substring(p, p + l)))
          (p + t.length, ok && !longer)
        }._2
      }
    }

  // ---- BPE sentinel-string merge (the q_bpe_train kernel claim) --------
  // The training loop's load-bearing identity: applying a merge (l, r) to
  // the '||'-sentinel rendering of a symbol sequence via left-to-right
  // non-overlapping string replace() IS the greedy BPE merge on the
  // sequence itself ("aaa" under (a,a) -> [aa, a]). Both engines implement
  // replace() with those semantics, which is what makes the merge a
  // codegen'd scalar op — so the identity deserves a property, not just
  // the corpus example.

  private val genSym: Gen[String] = for {
    n <- Gen.choose(1, 3)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
  } yield cs.mkString

  private val genSeqAndMerge: Gen[(List[String], String, String)] = for {
    syms <- Gen.listOfN(10, genSym).map(_.take(10))
    n <- Gen.choose(1, 10)
    l <- genSym
    r <- genSym
  } yield (syms.take(n), l, r)

  private def vectorMerge(v: List[String], l: String, r: String): List[String] = {
    val b = List.newBuilder[String]; var i = 0
    while (i < v.length) {
      if (i + 1 < v.length && v(i) == l && v(i + 1) == r) { b += (l + r); i += 2 }
      else { b += v(i); i += 1 }
    }
    b.result()
  }

  private def sentinel(v: List[String]): String = v.mkString("||", "||", "||")

  property("sentinel replace() == greedy left-to-right BPE merge") =
    forAll(genSeqAndMerge) { case (syms, l, r) =>
      val viaString = sentinel(syms).replace(s"|$l||$r|", s"|$l$r|")
      viaString == sentinel(vectorMerge(syms, l, r))
    }

  property("self-merge (a,a) never overlaps: runs halve, remainder survives") =
    forAll(Gen.choose(1, 12), genSym) { (n, a) =>
      val merged = sentinel(List.fill(n)(a)).replace(s"|$a||$a|", s"|$a$a|")
      val want = List.fill(n / 2)(a + a) ++ (if (n % 2 == 1) List(a) else Nil)
      merged == sentinel(want)
    }

  // ---- Unigram integer Viterbi fold (the q_unigram_* kernel claim) ----
  // The native unigram_dp kernel behind Unigram.dpFrames must equal the
  // textbook min-plus DP on arbitrary vocab/cost tables, the backward
  // fold's dpb[0] must equal the forward total (both are "the cheapest
  // full segmentation") — the identity the usage-marking rule
  // dpf[j] + cost + dpb[j+l] = total stands on — and the kernel's
  // optimal-path piece marking must equal a naive enumeration of the
  // qualifying (position, length) slots (multiplicity included: the
  // usage fold weights each slot separately).

  private val genVocabWords: Gen[(List[(String, Long)], List[String])] = for {
    nv <- Gen.choose(3, 12)
    pieces <- Gen.listOfN(nv, for {
      l <- Gen.choose(2, 4)
      cs <- Gen.listOfN(l, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString)
    costs <- Gen.listOfN(nv + 4, Gen.choose(1L, 50L))
    nw <- Gen.choose(1, 16)
    words <- Gen.listOfN(nw, for {
      l <- Gen.choose(1, 12)
      cs <- Gen.listOfN(l, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString)
  } yield ((List("a", "b", "c", "d") ++ pieces).distinct.zip(costs),
    words.distinct)

  property("unigram fold DP == naive min-plus DP; backward dpb[0] == total") =
    forAll(genVocabWords) { case (vocab, words) =>
      val wdf = words.toDF("wt").withColumn("f", lit(1L))
      val vdf = vocab.toDF("piece", "cost")
      val out = graft.operators.Unigram.dpFrames(wdf, vdf)
        .select(col("wt"), col("total"), col("d.b0").as("b0"),
          col("d.pieces").as("pieces")).collect()
      val vm = vocab.toMap
      val inf = 1000000000000000L
      def dpTables(w: String): (Array[Long], Array[Long]) = {
        val n = w.length
        val f = Array.fill(n + 1)(inf); f(0) = 0L
        for (i <- 1 to n; l <- 1 to math.min(4, i);
             c <- vm.get(w.substring(i - l, i)))
          f(i) = math.min(f(i), f(i - l) + c)
        val b = Array.fill(n + 1)(inf); b(n) = 0L
        for (i <- (n - 1) to 0 by -1; l <- 1 to math.min(4, n - i);
             c <- vm.get(w.substring(i, i + l)))
          b(i) = math.min(b(i), b(i + l) + c)
        (f, b)
      }
      out.length == words.length && out.forall { r =>
        val w = r.getAs[String]("wt")
        val (f, b) = dpTables(w)
        val t = f(w.length)
        // naive slot enumeration of the engine-free usage-marking rule
        val wantPieces = (for {
          j <- 0 until w.length
          l <- 1 to math.min(4, w.length - j)
          p = w.substring(j, j + l)
          c <- vm.get(p)
          if f(j) + c + b(j + l) == t
        } yield p).sorted
        r.getAs[Long]("total") == t && r.getAs[Long]("b0") == t &&
          r.getAs[Seq[String]]("pieces").sorted == wantPieces
      }
    }
}
