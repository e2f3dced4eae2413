package graft

import graft.operators.Compaction

/** The layout contract a value-compare cannot see: compaction must
  * actually CHANGE the file layout — merging shattered files up toward
  * the advisory target, splitting when the target is smaller than the
  * data — while `q_compaction` (the oracle gate) pins that values are
  * untouched.
  */
class CompactionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def parquetFiles(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter { f =>
        val n = f.getFileName.toString
        n.startsWith("part-") && n.endsWith(".parquet")
      }.toSeq
    } finally s.close()
  }

  test("compaction merges 64 shattered files into few; rows survive") {
    val frag = Compaction.fragmentedDocs(spark, dir)
    val comp = Compaction.compactedDocs(spark, dir)
    assert(parquetFiles(frag).size == 64,
      s"fixture must be genuinely shattered, got ${parquetFiles(frag).size}")
    val outFiles = parquetFiles(comp).size
    // ~150 KB of data under a 128 MB advisory target must land in a
    // handful of files (1 under perfect coalescing; a small number if
    // AQE keeps reducer-count floors) — never the input's 64
    assert(outFiles >= 1 && outFiles <= 4,
      s"compaction must merge toward the target, got $outFiles files")
    assert(spark.read.parquet(comp.toString).count() ==
      spark.read.parquet(frag.toString).count())
  }

  test("snapshot diff: classes are non-empty and reconcile to both snapshot sizes") {
    // the diff algebra a reconciliation must satisfy: |A| = removed +
    // changed + unchanged and |B| = added + changed + unchanged — and the
    // planted fixture exercises every class (the oracle owns membership
    // via the key checksums)
    val dir = "/root/testdata/sf0.001"
    val out = Compaction.queries("q_snapshot_diff")(spark, dir).collect()
      .map(r => r.getAs[String]("change_type") -> r.getAs[Long]("n_rows")).toMap
    assert(out.keySet == Set("added", "removed", "changed", "unchanged"))
    assert(out.values.forall(_ > 0L), s"every class must be planted: $out")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    assert(out("removed") + out("changed") + out("unchanged") == orders.count())
    // class sizes re-derived from the planted arithmetic, independently
    import org.apache.spark.sql.functions.col
    val changed = orders.filter(col("o_orderkey") % 103 === 0).count()
    val removed = orders.filter(col("o_orderkey") % 101 === 0 &&
      col("o_orderkey") % 103 =!= 0).count()
    val added = orders.filter(col("o_orderkey") % 107 === 0).count()
    assert(out("changed") == changed && out("removed") == removed
      && out("added") == added, s"$out")
  }

  test("CDC apply: highest-sequence op wins per key; deletes are data") {
    // the precedence contract replayed in driver Scala over the raw keys
    // (no Spark, no SQL): a key hit by insert+update+delete must end
    // deleted; update beats insert beats the base row; anything %11 is
    // gone regardless of what else touched it
    val dir = "/root/testdata/sf0.001"
    val out = Compaction.queries("q_cdc_apply")(spark, dir).collect()
      .map(r => r.getAs[String]("op") -> r.getAs[Long]("n_rows")).toMap
    val keys = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0))
    def n(p: Long => Boolean) = keys.count(p).toLong
    val exp = Map(
      "S" -> n(k => k % 5 != 0 && k % 7 != 0 && k % 11 != 0),
      "I" -> n(k => k % 5 == 0 && k % 7 != 0 && k % 11 != 0),
      "U" -> n(k => k % 7 == 0 && k % 11 != 0))
    assert(out == exp, s"got $out expected $exp")
    assert(exp.values.forall(_ > 0L), "fixture must exercise every class")
  }

  test("an advisory target below the data size splits the output") {
    val frag = Compaction.fragmentedDocs(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("compact_split")
    // the advisory size meters SHUFFLE bytes (lz4-compressed), which run
    // well under the raw ~150 KB here — 4 KB is comfortably below the
    // compressed total, so AQE must keep several reducers
    Compaction.compact(spark, frag.toString, out.toString, 4 * 1024)
    val n = parquetFiles(out).size
    assert(n >= 2 && n < 64,
      s"a 4 KB target over ~150 KB raw must yield several files, got $n")
    assert(spark.read.parquet(out.toString).count() ==
      spark.read.parquet(frag.toString).count())
  }

  test("versioned root: a reader mid-scan across a swap sees exactly one version") {
    // the swap-while-serving contract of the write-new-then-swap family:
    // a plan pins the version it resolved at build time; a publish that
    // lands before the scan finishes must be invisible to it, and a
    // fresh resolve must serve the new version
    import graft.operators.VersionedRoot
    import org.apache.spark.sql.functions.lit
    val root = VersionedRoot.freshRoot("vroot")
    def writeVersion(tag: Long)(vdir: java.nio.file.Path): Unit =
      // the handed directory EXISTS (it is the publisher's atomic claim),
      // so parquet writes into it must overwrite
      spark.range(100).withColumn("ver", lit(tag))
        .write.mode("overwrite").parquet(vdir.toString)
    VersionedRoot.publish(root, writeVersion(1))
    val pinned = spark.read.parquet(VersionedRoot.resolve(root).toString)
    VersionedRoot.publish(root, writeVersion(2)) // swap lands mid-"scan"
    val seen = pinned.select("ver").distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(seen == Seq(1L), s"mid-scan reader must see exactly v1: $seen")
    val fresh = spark.read.parquet(VersionedRoot.resolve(root).toString)
      .select("ver").distinct().collect().map(_.getLong(0)).toSeq
    assert(fresh == Seq(2L), s"a fresh resolve must serve v2: $fresh")
    // the vacuum horizon: retire drops old versions, never the current
    VersionedRoot.retire(root, keep = 1)
    assert(!java.nio.file.Files.exists(root.resolve("v1")))
    assert(spark.read.parquet(VersionedRoot.resolve(root).toString)
      .count() == 100L)
  }

  test("versioned root: the pointer is never torn under concurrent publishes") {
    // the commit primitive itself: while a writer thread publishes 20
    // versions, every concurrent resolve must return a well-formed,
    // existing version directory — an atomic rename can expose old or
    // new, never a partial pointer
    import graft.operators.VersionedRoot
    val root = VersionedRoot.freshRoot("vroot_race")
    def writeVersion(vdir: java.nio.file.Path): Unit = {
      java.nio.file.Files.createDirectories(vdir)
      java.nio.file.Files.writeString(vdir.resolve("data"), "x"): Unit
    }
    VersionedRoot.publish(root, writeVersion)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val v = VersionedRoot.resolve(root)
          if (!java.nio.file.Files.exists(v.resolve("data"))) {
            failures.incrementAndGet(): Unit
          }
        } catch { case _: Throwable => failures.incrementAndGet(): Unit }
      }
    })
    reader.start()
    (1 to 20).foreach(_ => VersionedRoot.publish(root, writeVersion))
    stop.set(true)
    reader.join(5000)
    assert(failures.get() == 0,
      s"${failures.get()} resolves observed a torn/missing version")
    assert(VersionedRoot.resolve(root).getFileName.toString == "v21")
  }

  test("versioned root: vacuum reclaims exactly the data dirs no surviving manifest references") {
    import graft.operators.VersionedRoot
    import java.nio.file.Files
    val root = VersionedRoot.freshRoot("vroot_vac")
    val Seq(a, b, c) = Seq("a", "b", "c").map { n =>
      val d = root.resolve(s"data_$n")
      Files.createDirectories(d)
      Files.writeString(d.resolve("part.parquet"), "x"): Unit
      d.toString
    }
    VersionedRoot.publishDirs(root, Seq(a, b))     // v1
    VersionedRoot.publishDirs(root, Seq(b, c))     // v2 (the compacted form)
    // before retire, every dir is referenced by SOME version: no-op
    assert(VersionedRoot.vacuumDirs(root, Seq(a, b, c)).isEmpty)
    VersionedRoot.retire(root, keep = 1)           // v1 manifest goes
    val gone = VersionedRoot.vacuumDirs(root, Seq(a, b, c))
    assert(gone == Seq(a), s"only the now-unreferenced dir goes: $gone")
    assert(!Files.exists(java.nio.file.Paths.get(a)))
    assert(Files.exists(java.nio.file.Paths.get(b)) &&
      Files.exists(java.nio.file.Paths.get(c)),
      "dirs the surviving manifest names must stay")
  }

  test("versioned root: retire never drops the pointed-at version after a crashed publish") {
    // a publisher that crashed after writing v3 but before the pointer
    // flip leaves CURRENT at v2; "newest K by number" alone would retire
    // the directory CURRENT points at — retire must pin the resolved
    // version (and anything newer) unconditionally
    import graft.operators.VersionedRoot
    import java.nio.file.Files
    val root = VersionedRoot.freshRoot("vroot_crash")
    def writeVersion(vdir: java.nio.file.Path): Unit = {
      Files.writeString(vdir.resolve("data"), "x"): Unit
    }
    VersionedRoot.publish(root, writeVersion) // v1
    VersionedRoot.publish(root, writeVersion) // v2, CURRENT → v2
    // simulate the crash AFTER the claim (marker + directory, r19 — the
    // reservation is the `v3.claim` marker), before any pointer flip
    Files.createFile(root.resolve("v3.claim"))
    Files.createDirectory(root.resolve("v3"))
    Files.writeString(root.resolve("v3").resolve("data"), "x"): Unit
    VersionedRoot.retire(root, keep = 1)
    assert(!Files.exists(root.resolve("v1")), "v1 is retireable")
    assert(Files.exists(root.resolve("v2")),
      "the pointed-at v2 must survive retire(keep=1) despite the orphan v3")
    assert(VersionedRoot.resolve(root).getFileName.toString == "v2")
    // the next publish must NOT reuse the orphaned v3 claim: it skips to v4
    val published = VersionedRoot.publish(root, writeVersion)
    assert(published.getFileName.toString == "v4",
      s"publish must claim past the orphan, got $published")
    assert(VersionedRoot.resolve(root).getFileName.toString == "v4")
  }

  test("versioned root: racing whole-content publishers both commit without error") {
    // the per-publisher pointer temp name (r18): with a SHARED tmp, one
    // racer's ATOMIC_MOVE could consume the other's file — the loser threw
    // NoSuchFileException for a fully-committed version
    import graft.operators.VersionedRoot
    import java.nio.file.Files
    val root = VersionedRoot.freshRoot("vroot_race_pub")
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        gate.await()
        (1 to 10).foreach { _ =>
          try VersionedRoot.publish(root,
            v => Files.writeString(v.resolve("data"),
              v.getFileName.toString): Unit)
          catch { case _: Throwable => errors.incrementAndGet(): Unit }
        }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join(30000))
    assert(errors.get() == 0, s"${errors.get()} publishes reported failure")
    // CURRENT names a version whose content matches its own name — no
    // cross-installed pointer
    val v = VersionedRoot.resolve(root)
    assert(Files.readString(v.resolve("data")) == v.getFileName.toString)
  }

  test("versioned root: racing manifest appenders lose no delta") {
    // the r17 verdict's lost-update: two appenders resolve the same base
    // list, each publishes base+own-delta, the later flip drops the
    // earlier delta. appendDirs' claim-in-order commit must keep both.
    import graft.operators.VersionedRoot
    import java.nio.file.Files
    val root = VersionedRoot.freshRoot("vroot_race_app")
    val base = root.resolve("data_base")
    Files.createDirectories(base)
    VersionedRoot.publishDirs(root, Seq(base.toString))
    val nThreads = 4; val perThread = 5
    val gate = new java.util.concurrent.CountDownLatch(1)
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        gate.await()
        (0 until perThread).foreach { i =>
          try {
            val d = root.resolve(s"data_t${t}_$i")
            Files.createDirectories(d)
            VersionedRoot.appendDirs(root, Seq(d.toString)): Unit
          } catch { case _: Throwable => errors.incrementAndGet(): Unit }
        }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join(60000))
    assert(errors.get() == 0, s"${errors.get()} appends failed")
    val dirs = VersionedRoot.resolveDirs(root)
    val expected = (base.toString +: (for {
      t <- 0 until nThreads; i <- 0 until perThread
    } yield root.resolve(s"data_t${t}_$i").toString)).toSet
    assert(dirs.toSet == expected,
      s"lost deltas: ${(expected -- dirs.toSet).toSeq.sorted}")
    // every commit claimed its own sequential version
    assert(VersionedRoot.resolve(root).getFileName.toString ==
      s"v${1 + nThreads * perThread}")
  }

  test("versioned root: a wedged (crashed pre-flip) claimer fails the append loudly") {
    // a publisher that claimed v(N+1) but died before its flip blocks the
    // claim-in-order sequence; the commit loop must throw after its wait
    // horizon rather than silently skipping (which could reorder) or
    // spinning forever
    import graft.operators.VersionedRoot
    import java.nio.file.Files
    val root = VersionedRoot.freshRoot("vroot_wedge")
    val base = root.resolve("data_base")
    Files.createDirectories(base)
    VersionedRoot.publishDirs(root, Seq(base.toString)) // v1
    // the crash: claimed (marker + dir, r19), no flip
    Files.createFile(root.resolve("v2.claim"))
    Files.createDirectory(root.resolve("v2"))
    val d = root.resolve("data_d"); Files.createDirectories(d)
    val ex = intercept[IllegalStateException] {
      VersionedRoot.appendDirsWithin(root, Seq(d.toString), waitMs = 300)
    }
    assert(ex.getMessage.contains("v2"))
    // CURRENT is untouched: readers keep serving v1
    assert(VersionedRoot.resolveDirs(root) == Seq(base.toString))
  }

  test("versioned root: replaceDirs keeps deltas appended during the compaction") {
    // compaction read [base, d1], compacted them into cdir; while it was
    // rewriting, an appender landed d2 — the replace must publish
    // [cdir, d2], not [cdir]
    import graft.operators.VersionedRoot
    import java.nio.file.Files
    val root = VersionedRoot.freshRoot("vroot_replace")
    val Seq(b, d1, d2, cdir) = Seq("base", "d1", "d2", "compact").map { n =>
      val d = root.resolve(s"data_$n"); Files.createDirectories(d); d.toString
    }
    VersionedRoot.publishDirs(root, Seq(b, d1))
    val readByCompactor = VersionedRoot.resolveDirs(root)
    VersionedRoot.appendDirs(root, Seq(d2)) // lands mid-compaction
    VersionedRoot.replaceDirs(root, readByCompactor, Seq(cdir))
    assert(VersionedRoot.resolveDirs(root) == Seq(cdir, d2))
  }
}
