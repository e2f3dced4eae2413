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
    * non-conflicting writers).
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
    val tmp = root.resolve(s"$Pointer.tmp")
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
    * directories (order preserved). */
  def publishDirs(root: Path, dirs: Seq[String]): Path =
    publish(root, v => Files.writeString(v.resolve(DirsFile),
      dirs.mkString("\n")): Unit)

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

  /** Convenience for specs: a fresh root under java.io.tmpdir. */
  private[graft] def freshRoot(prefix: String): Path =
    Files.createTempDirectory(Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp")), prefix)
}
