package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The swap-while-serving contract for every write-new-then-swap index in
  * this repo (MinHash sets/bands, BM25 postings, SRP sig/vecs, semantic
  * members, image/audio/video bands, the balance MV): a versioned root
  * with a one-file manifest POINTER, the Delta-lite commit shape.
  *
  * The staging discipline (r10 J7: write to `<root>.building`, rename
  * into place) already covers the BUILD race — a reader never sees a
  * half-written directory. What it does not specify is what a SERVING
  * session sees while an update replaces the directory: delete-then-
  * rename on the live root would yank parquet files out from under a
  * mid-scan reader. This object closes that hole:
  *
  *   - every version is an immutable directory `<root>/v<N>`, fully
  *     written BEFORE it becomes visible;
  *   - visibility is one pointer file `<root>/CURRENT` containing the
  *     version name, replaced by an ATOMIC_MOVE rename — the POSIX/HDFS/
  *     object-store-manifest primitive that either wholly happens or
  *     wholly doesn't, so a reader resolving CURRENT can never observe a
  *     torn pointer;
  *   - a reader resolves CURRENT ONCE at plan time and pins that
  *     version's directory for its whole scan — a swap mid-scan is
  *     invisible (the old directory is immutable and still present), so
  *     every query reads exactly one version end to end;
  *   - old versions retire only once no reader can still hold them
  *     ([[retire]] keeps the newest K — the vacuum-horizon policy, a
  *     deployment knob).
  *
  * At 100 TB this is precisely the commit protocol of a table format:
  * data files immutable, commits = one atomic pointer swap, readers pin
  * a snapshot. The gates in this repo keep their freshTempDir layout
  * (each run's updated index is OUTPUT under test, rebuilt per call);
  * this object is the deployment contract CompactionSpec pins — reader
  * isolation across a concurrent publish.
  *
  * Reference analog: none (the reference serves from mutable in-place
  * Slick tables); §2x extension surface.
  */
object VersionedRoot {

  private val Pointer = "CURRENT"

  /** Write a new version under `root` via `write` (handed the INVISIBLE
    * version directory), then atomically flip the pointer to it.
    * Returns the published version directory.
    *
    * Concurrent publishers are safe at the directory level: each claims
    * its version number by `Files.createDirectory` (an atomic
    * reservation — exists means another writer got there first, so this
    * one moves to the next number), so two writers can never interleave
    * files inside one "immutable" version. The POINTER then serializes
    * with last-flip-wins — racing publishers both commit a complete
    * version, and the later flip decides which one serves (the same
    * contract a table format's optimistic-concurrency commit gives two
    * non-conflicting writers). That contract holds for WHOLE-CONTENT
    * versions only: a read-modify-write (e.g. a manifest append built on
    * a resolved base list) racing through this method can lose the other
    * writer's delta — use [[appendDirs]]/[[replaceDirs]], whose
    * claim-in-order commit detects the conflict, for those.
    *
    * Because the claim IS the directory, `write` receives an EXISTING
    * empty directory — parquet writers must use SaveMode.Overwrite (or
    * write into child paths), as ErrorIfExists refuses any existing
    * path. */
  def publish(root: Path, write: Path => Unit): Path = {
    Files.createDirectories(root)
    var next = 1 + currentVersion(root).getOrElse(0L)
    var vdir = root.resolve(s"v$next")
    // atomic claim: createDirectory throws if the version already exists
    // (a concurrent or crashed publisher owns it) — take the next number
    while ({
      try { Files.createDirectory(vdir); false }
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        next += 1; vdir = root.resolve(s"v$next"); true }
    }) ()
    // the version directory is fully written before anything points at it
    write(vdir)
    // per-publisher temp name: two racers sharing one `CURRENT.tmp` could
    // interleave (B overwrites A's tmp before A's move — A installs B's
    // pointer; B's own move then finds no source and throws, reporting
    // failure for a fully-committed version). The claimed version number
    // is unique per publisher, so suffixing it makes the tmp private.
    val tmp = root.resolve(s"$Pointer.tmp.v$next")
    Files.writeString(tmp, s"v$next")
    // the commit: an atomic rename onto the pointer — readers see the
    // old content or the new, never a torn or missing pointer
    Files.move(tmp, root.resolve(Pointer),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING): Unit
    vdir
  }

  /** Resolve the pointer ONCE — the returned directory is immutable, so
    * a plan built over it reads one consistent version no matter how
    * many publishes land while it runs. */
  def resolve(root: Path): Path = {
    val v = Files.readString(root.resolve(Pointer)).trim
    require(v.matches("v\\d+"), s"torn or foreign pointer: '$v'")
    root.resolve(v)
  }

  private def currentVersion(root: Path): Option[Long] = {
    val p = root.resolve(Pointer)
    if (Files.exists(p)) Some(Files.readString(p).trim.stripPrefix("v").toLong)
    else None
  }

  /** Drop all but the newest `keep` versions — never the pointed-at one
    * or anything newer than it (keep >= 1 enforced). A publisher that
    * crashed after writing v<N+1> but before the pointer flip leaves
    * CURRENT at vN; "newest K by number" alone would then retire the
    * directory CURRENT points at, so the pointed-at version and its
    * successors are excluded from the retire set unconditionally. The
    * deployment's vacuum horizon: run it only after the oldest surviving
    * version predates every live reader. */
  def retire(root: Path, keep: Int): Unit = {
    require(keep >= 1, "retire must keep at least the current version")
    val pinned = currentVersion(root).getOrElse(Long.MinValue)
    val stream = Files.list(root)
    val versions =
      try stream.iterator().asScala
        .filter(p => p.getFileName.toString.matches("v\\d+"))
        .toSeq.sortBy(p => p.getFileName.toString.stripPrefix("v").toLong)
      finally stream.close()
    versions.dropRight(keep)
      .filter(_.getFileName.toString.stripPrefix("v").toLong < pinned)
      .foreach { old =>
        org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
      }
  }

  /** True once the root carries a committed pointer. */
  def published(root: Path): Boolean = Files.exists(root.resolve(Pointer))

  /** Resolve `path` through its CURRENT pointer when it is a versioned
    * root, else return it unchanged — the reader-side shim that lets one
    * conf/path key serve both layouts (a flat parquet dir and a
    * [[publish]]ed root). The read is one tiny file — the same per-plan
    * metadata cost a table format pays to pin its latest snapshot. */
  def resolveIfVersioned(path: String): String = {
    val root = Paths.get(path)
    if (published(root)) resolve(root).toString else path
  }

  // ---- manifest versions (multi-directory indexes) ----------------------
  //
  // The append-only index families (minhash sets/bands, bm25 postings,
  // …) grow by landing NEW data directories, never rewriting history —
  // so "a version" of such an index is not one directory of data but a
  // LIST of immutable data directories. A manifest version dir contains
  // a single `dirs` file naming them; publish = write the new list +
  // pointer flip, serve = resolve CURRENT once and read the union of
  // the listed dirs (the existing multi-root varargs serve spelling).
  // Compaction publishes a version whose list is one size-targeted
  // directory; data dirs referenced by no surviving version are the
  // vacuum set.

  private val DirsFile = "dirs"

  /** Publish a manifest version naming `dirs` as the index's data
    * directories (order preserved). This is a WHOLE-LIST publish: the
    * caller asserts `dirs` is the complete truth, independent of what any
    * concurrent writer does. A read-modify-write spelled through it
    * (resolveDirs → append → publishDirs) is NOT race-safe — two
    * appenders both read the same base and the later flip silently drops
    * the earlier delta. Appends must go through [[appendDirs]] and
    * replacements (compaction) through [[replaceDirs]], whose
    * claim-in-order commit serializes racing writers. */
  def publishDirs(root: Path, dirs: Seq[String]): Path =
    publish(root, v => Files.writeString(v.resolve(DirsFile),
      dirs.mkString("\n")): Unit)

  private def dirsOf(vdir: Path): Seq[String] = {
    val f = vdir.resolve(DirsFile)
    if (Files.exists(f))
      Files.readString(f).trim.split("\n").toSeq.filter(_.nonEmpty)
    else Seq.empty
  }

  /** Commit a manifest version whose list is `transform(base)` where
    * `base` is the list of the version the commit lands DIRECTLY after —
    * the optimistic-concurrency loop both [[appendDirs]] and
    * [[replaceDirs]] ride.
    *
    * Protocol: read CURRENT (= vN), try to claim v(N+1) by atomic
    * createDirectory. A successful claim proves NO other writer can
    * commit between our base read and our flip: committing v(N+2) first
    * requires CURRENT to reach v(N+1), which only our flip can make
    * happen. A failed claim means a racer owns v(N+1) — wait for its
    * flip (bounded), then retry from the NEW current list, so the
    * racer's delta is in our base. This is claim-order = flip-order: the
    * table-format commit discipline (detect a moved head, rebase, retry)
    * rather than last-flip-wins.
    *
    * A claimer that crashes pre-flip wedges the sequence; after
    * `waitMs` of no movement this throws rather than silently dropping
    * or reordering — the vacuum/operator decision is explicit. Mixing
    * raw [[publish]]/[[publishDirs]] with this method on one root breaks
    * the sequencing premise: a manifest root must commit exclusively
    * through this loop once concurrent writers are possible. */
  private def commitDirs(root: Path, waitMs: Long = 30000L)
                        (transform: Seq[String] => Seq[String]): Path = {
    Files.createDirectories(root)
    val deadline = System.nanoTime() + waitMs * 1000000L
    while (true) {
      val baseV = currentVersion(root).getOrElse(0L)
      val base = if (baseV > 0) dirsOf(root.resolve(s"v$baseV")) else Seq.empty
      val next = baseV + 1
      val vdir = root.resolve(s"v$next")
      val claimed =
        try { Files.createDirectory(vdir); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      if (claimed) {
        Files.writeString(vdir.resolve(DirsFile),
          transform(base).mkString("\n"))
        val tmp = root.resolve(s"$Pointer.tmp.v$next")
        Files.writeString(tmp, s"v$next")
        Files.move(tmp, root.resolve(Pointer),
          StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        return vdir
      }
      // v(next) belongs to a racer mid-commit: its flip is one small
      // file write away — yield and re-read, with a bounded horizon for
      // the crashed-claimer case.
      if (System.nanoTime() > deadline)
        throw new IllegalStateException(
          s"manifest commit wedged: v$next claimed but never flipped " +
          s"within ${waitMs}ms — crashed publisher at $vdir")
      Thread.sleep(1)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Race-safe manifest APPEND: commit a version whose list is the
    * latest committed list plus `delta` (deduplicated, order preserved).
    * Two racing appenders serialize — neither delta is lost. */
  def appendDirs(root: Path, delta: Seq[String]): Path =
    commitDirs(root)(base => (base ++ delta).distinct)

  /** Test hook: [[appendDirs]] with a bounded wedge horizon, so the
    * crashed-claimer path (a claimed-but-never-flipped version ahead of
    * CURRENT) is spec-exercisable without a 30 s wait. */
  private[graft] def appendDirsWithin(root: Path, delta: Seq[String],
                                      waitMs: Long): Path =
    commitDirs(root, waitMs)(base => (base ++ delta).distinct)

  /** Race-safe manifest REPLACE (the compaction commit): `replaced` is
    * the dir list the caller compacted into `replacement`; any dirs that
    * landed AFTER the caller's read (appends racing the compaction)
    * survive by riding along behind the replacement — an append is pure
    * addition, so the merge is conflict-free. */
  def replaceDirs(root: Path, replaced: Seq[String],
                  replacement: Seq[String]): Path =
    commitDirs(root) { base =>
      (replacement ++ base.filterNot(replaced.contains)).distinct
    }

  /** The CURRENT version's data-directory list — resolved ONCE; the
    * returned dirs are immutable, so a plan over them reads one
    * consistent index no matter how many publishes land while it runs. */
  def resolveDirs(root: Path): Seq[String] =
    Files.readString(resolve(root).resolve(DirsFile)).trim
      .split("\n").toSeq.filter(_.nonEmpty)

  /** Delete data directories that no SURVIVING manifest version
    * references — the vacuum half of the index compaction cycle: after
    * [[retire]] drops old manifest versions, the delta dirs only those
    * versions named become unreachable, and this reclaims them.
    * `candidates` bounds the sweep to dirs the CALLER owns (an index
    * root must never vacuum a shared fixture it merely references).
    * Returns the dirs actually deleted. */
  def vacuumDirs(root: Path, candidates: Seq[String]): Seq[String] = {
    val stream = Files.list(root)
    val versions =
      try stream.iterator().asScala
        .filter(p => p.getFileName.toString.matches("v\\d+")).toSeq
      finally stream.close()
    val live = versions.flatMap { v =>
      val f = v.resolve(DirsFile)
      if (Files.exists(f))
        Files.readString(f).trim.split("\n").toSeq.filter(_.nonEmpty)
      else Seq.empty
    }.toSet
    val doomed = candidates.filterNot(live.contains)
    doomed.foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    doomed
  }

  /** The per-gate deployment shim for an index update/ingest cycle —
    * ONE spelling of "serve through the pointer" for every stored index
    * family (minhash was the r17 template; r18 deploys it on bm25 / srp /
    * semantic / dhash / audio / video): the cycle starts with a manifest
    * whose v1 names the base build, the before-serve resolves CURRENT
    * (pinning the list for its whole probe), the update commits its delta
    * through the race-safe [[appendDirs]], and the after-serve re-resolves.
    * The gates keep their freshTempDir layout; this class is the pointer
    * plumbing, not the data. */
  final class Cycle private[VersionedRoot] (val vroot: Path) {
    /** The pinned dir list for the before-serve (resolved per call —
      * one tiny pointer read, the table-format snapshot cost). */
    def before: Seq[String] = resolveDirs(vroot)
    /** Commit `delta` and return the re-resolved list for the
      * after-serve. */
    def append(delta: String): Seq[String] = {
      appendDirs(vroot, Seq(delta)): Unit
      resolveDirs(vroot)
    }
  }

  /** Open an update cycle under `work` (a per-gate temp root) with
    * `base` as the index's v1 content. */
  def cycle(work: Path, base: String): Cycle = {
    val vroot = work.resolve("vroot")
    publishDirs(vroot, Seq(base)): Unit
    new Cycle(vroot)
  }

  /** Convenience for specs: a fresh root under java.io.tmpdir. */
  private[graft] def freshRoot(prefix: String): Path =
    Files.createTempDirectory(Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp")), prefix)
}
