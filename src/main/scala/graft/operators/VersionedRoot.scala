package graft.operators

import java.nio.file.{Files, Path, Paths}

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
  *     version name, replaced by an atomic rename — the POSIX/HDFS
  *     primitive that either wholly happens or wholly doesn't, so a
  *     reader resolving CURRENT can never observe a torn pointer;
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
  * a snapshot. STORAGE (r19, the r18 verdict's #1): the protocol is
  * parameterized over [[VStore]] — two primitives (atomic directory
  * claim, atomic pointer swap) behind a backend seam. The java.nio Path
  * API below is the `file://` fast path; the `*At(store, root)` spellings
  * commit the SAME protocol on any Hadoop FileSystem whose rename is
  * atomic (hdfs:// first-class; copy-rename object stores fail fast with
  * adapter guidance — see [[VStore.forRoot]]).
  *
  * CROSS-PROCESS SAFETY: the specs race THREADS in one JVM, but nothing
  * in the protocol is JVM-scoped — both contended primitives bottom out
  * in storage-level atomicity that is process-agnostic by contract:
  * the claim is one creat(2) with O_EXCL on the `v<N>.claim` marker
  * (the kernel serializes racing creators on the parent inode; every
  * loser gets EEXIST — the JVM adds no locking and holds no state the
  * kernel doesn't see), and the flip is one rename(2) via `ATOMIC_MOVE`
  * (atomic within a filesystem, per POSIX). On the Hadoop backend the
  * same two primitives are single NameNode transactions (exclusive
  * create; rename2 with OVERWRITE). Racing processes therefore
  * interleave exactly like racing threads: through the storage
  * primitive, never around it — which VersionedRootProcessSpec
  * demonstrates with two forked JVMs appending concurrently (no lost
  * delta, sequential versions).
  *
  * The gates in this repo keep their freshTempDir layout (each run's
  * updated index is OUTPUT under test, rebuilt per call); this object is
  * the deployment contract CompactionSpec + VersionedRootStoreSpec pin —
  * reader isolation across a concurrent publish, on both backends.
  *
  * Reference analog: none (the reference serves from mutable in-place
  * Slick tables; its atomic-commit analog is the Postgres upsert,
  * SecondaryPersistence.scala:30-127); §2x extension surface.
  */
object VersionedRoot {

  private val Pointer = "CURRENT"
  private val DirsFile = "dirs"

  // ---- core protocol, parameterized over the storage backend ------------

  /** Write a new version under `root` via `write` (handed the INVISIBLE
    * version directory), then atomically flip the pointer to it.
    * Returns the published version directory.
    *
    * Concurrent publishers are safe at the directory level: each claims
    * its version number by [[VStore.claimDir]] (an atomic reservation —
    * "already claimed" means another writer got there first, so this
    * one moves to the next number), so two writers can never interleave
    * files inside one "immutable" version. The POINTER then serializes
    * with last-flip-wins — racing publishers both commit a complete
    * version, and the later flip decides which one serves (the same
    * contract a table format's optimistic-concurrency commit gives two
    * non-conflicting writers). That contract holds for WHOLE-CONTENT
    * versions only: a read-modify-write (e.g. a manifest append built on
    * a resolved base list) racing through this method can lose the other
    * writer's delta — use [[appendDirsAt]]/[[replaceDirsAt]], whose
    * claim-in-order commit detects the conflict, for those.
    *
    * The claim is a MARKER FILE (`v<N>.claim`), not the directory
    * itself (r19): `write` receives an existing empty directory, so
    * parquet writers must use SaveMode.Overwrite (ErrorIfExists refuses
    * any existing path) — and Overwrite's delete-and-recreate of the
    * version directory is SAFE, because the reservation lives in the
    * marker and survives the delete (a directory-as-claim design would
    * hand the vacated name to a racing publisher mid-write — spec'd). */
  def publishAt(st: VStore, root: String, write: String => Unit): String = {
    st.mkdirs(root)
    var next = 1 + currentVersionAt(st, root).getOrElse(0L)
    // atomic claim: claimDir fails if the version already exists (a
    // concurrent or crashed publisher owns it) — take the next number
    while (!st.claimDir(st.child(root, s"v$next"))) next += 1
    val vdir = st.child(root, s"v$next")
    // the version directory is fully written before anything points at it
    write(vdir)
    // per-publisher temp name: two racers sharing one `CURRENT.tmp` could
    // interleave (B overwrites A's tmp before A's move — A installs B's
    // pointer; B's own move then finds no source and throws, reporting
    // failure for a fully-committed version). The claimed version number
    // is unique per publisher, so suffixing it makes the tmp private.
    val tmp = st.child(root, s"$Pointer.tmp.v$next")
    st.writeString(tmp, s"v$next")
    // the commit: an atomic rename onto the pointer — readers see the
    // old content or the new, never a torn or missing pointer
    st.atomicSwap(tmp, st.child(root, Pointer))
    vdir
  }

  /** Resolve the pointer ONCE — the returned directory is immutable, so
    * a plan built over it reads one consistent version no matter how
    * many publishes land while it runs. */
  def resolveAt(st: VStore, root: String): String = {
    val v = st.readString(st.child(root, Pointer)).trim
    require(v.matches("v\\d+"), s"torn or foreign pointer: '$v'")
    st.child(root, v)
  }

  private def currentVersionAt(st: VStore, root: String): Option[Long] = {
    val p = st.child(root, Pointer)
    if (st.exists(p)) Some(st.readString(p).trim.stripPrefix("v").toLong)
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
  def retireAt(st: VStore, root: String, keep: Int): Unit = {
    require(keep >= 1, "retire must keep at least the current version")
    val pinned = currentVersionAt(st, root).getOrElse(Long.MinValue)
    val versions = st.listNames(root)
      .filter(_.matches("v\\d+"))
      .sortBy(_.stripPrefix("v").toLong)
    versions.dropRight(keep)
      .filter(_.stripPrefix("v").toLong < pinned)
      .foreach { v =>
        st.deleteTree(st.child(root, v))
        // sweep the version's claim marker and any orphaned pointer temp
        // (a crashed publisher's leavings) with it — the root must not
        // accumulate per-version junk over a long retire cadence
        st.deleteFile(st.child(root, s"$v.claim"))
        st.deleteFile(st.child(root, s"$Pointer.tmp.$v"))
      }
  }

  /** True once the root carries a committed pointer. */
  def publishedAt(st: VStore, root: String): Boolean =
    st.exists(st.child(root, Pointer))

  /** The sanctioned cleanup for the wedge [[appendDirsAt]]'s horizon
    * reports (r19 verdict): a claimer that crashed AFTER winning the
    * `v<N+1>.claim` marker but BEFORE its pointer flip blocks every
    * subsequent committer (claim-order = flip-order — nobody can claim
    * v<N+2> usefully while CURRENT sits at v<N>). Recovery = delete the
    * wedged claim's marker + directory + orphaned pointer temp, so the
    * next committer can re-claim the number.
    *
    * PRECONDITION (the operator's assertion, not checkable from storage):
    * no LIVE writer holds the claim — run this only after the wedge
    * horizon threw and the claiming process is confirmed dead; recovering
    * a live writer's claim would let two writers share one "immutable"
    * version directory. The method enforces what IS checkable: it only
    * ever touches the first claimed-but-unflipped version STRICTLY AHEAD
    * of CURRENT (a committed version is never recovery-eligible), and it
    * returns false (touching nothing) when there is no wedge.
    */
  def recoverWedgedClaimAt(st: VStore, root: String): Boolean = {
    val next = currentVersionAt(st, root).getOrElse(0L) + 1
    val marker = st.child(root, s"v$next.claim")
    if (!st.exists(marker)) false // no claim ahead of the pointer: no wedge
    else {
      // order matters: the directory and pointer temp go FIRST, the marker
      // LAST — the marker is the reservation, so a crash mid-recovery
      // leaves the name still claimed (safe, re-runnable) rather than
      // re-claimable with the dead writer's partial directory alive
      st.deleteTree(st.child(root, s"v$next"))
      st.deleteFile(st.child(root, s"$Pointer.tmp.v$next"))
      st.deleteFile(marker)
      true
    }
  }

  /** [[recoverWedgedClaimAt]] on the local backend. */
  def recoverWedgedClaim(root: Path): Boolean =
    recoverWedgedClaimAt(VStore.Local, root.toString)

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

  /** Publish a manifest version naming `dirs` as the index's data
    * directories (order preserved). This is a WHOLE-LIST publish: the
    * caller asserts `dirs` is the complete truth, independent of what any
    * concurrent writer does. A read-modify-write spelled through it
    * (resolveDirs → append → publishDirs) is NOT race-safe — two
    * appenders both read the same base and the later flip silently drops
    * the earlier delta. Appends must go through [[appendDirsAt]] and
    * replacements (compaction) through [[replaceDirsAt]], whose
    * claim-in-order commit serializes racing writers. */
  def publishDirsAt(st: VStore, root: String, dirs: Seq[String]): String =
    publishAt(st, root,
      v => st.writeString(st.child(v, DirsFile), dirs.mkString("\n")))

  private def dirsOfAt(st: VStore, vdir: String): Seq[String] = {
    val f = st.child(vdir, DirsFile)
    if (st.exists(f))
      st.readString(f).trim.split("\n").toSeq.filter(_.nonEmpty)
    else Seq.empty
  }

  /** Commit a manifest version whose list is `transform(base)` where
    * `base` is the list of the version the commit lands DIRECTLY after —
    * the optimistic-concurrency loop both [[appendDirsAt]] and
    * [[replaceDirsAt]] ride.
    *
    * Protocol: read CURRENT (= vN), try to claim v(N+1) by the backend's
    * atomic claim. A successful claim proves NO other writer can
    * commit between our base read and our flip: committing v(N+2) first
    * requires CURRENT to reach v(N+1), which only our flip can make
    * happen. A failed claim means a racer owns v(N+1) — wait for its
    * flip (bounded), then retry from the NEW current list, so the
    * racer's delta is in our base. This is claim-order = flip-order: the
    * table-format commit discipline (detect a moved head, rebase, retry)
    * rather than last-flip-wins.
    *
    * The wedge horizon measures genuine NO-MOVEMENT, not total wait:
    * the deadline resets every time CURRENT advances (r18 ADVICE — under
    * sustained healthy contention a writer can lose claims for longer
    * than `waitMs` total while the manifest flips normally; only a
    * claimed-but-never-flipped version ahead of a STALLED pointer should
    * throw). A claimer that crashes pre-flip wedges the sequence; after
    * `waitMs` with no pointer movement this throws rather than silently
    * dropping or reordering — the vacuum/operator decision is explicit.
    * Mixing raw [[publishAt]]/[[publishDirsAt]] with this method on one
    * root breaks the sequencing premise: a manifest root must commit
    * exclusively through this loop once concurrent writers are
    * possible. */
  private def commitDirsAt(st: VStore, root: String, waitMs: Long = 30000L)
                          (transform: Seq[String] => Seq[String]): String = {
    st.mkdirs(root)
    var lastSeen = -1L
    var deadline = Long.MaxValue
    var pollMs = 1L
    while (true) {
      val baseV = currentVersionAt(st, root).getOrElse(0L)
      if (baseV != lastSeen) { // movement (or first look): fresh horizon
        lastSeen = baseV
        deadline = System.nanoTime() + waitMs * 1000000L
        pollMs = 1L // contention is resolving — go back to eager polls
      }
      val base =
        if (baseV > 0) dirsOfAt(st, st.child(root, s"v$baseV")) else Seq.empty
      val next = baseV + 1
      val vdir = st.child(root, s"v$next")
      if (st.claimDir(vdir)) {
        st.writeString(st.child(vdir, DirsFile),
          transform(base).mkString("\n"))
        val tmp = st.child(root, s"$Pointer.tmp.v$next")
        st.writeString(tmp, s"v$next")
        st.atomicSwap(tmp, st.child(root, Pointer))
        return vdir
      }
      // v(next) belongs to a racer mid-commit: its flip is one small
      // file write away — yield and re-read, with a bounded no-movement
      // horizon for the crashed-claimer case.
      if (System.nanoTime() > deadline)
        throw new IllegalStateException(
          s"manifest commit wedged: v$next claimed but never flipped " +
          s"within ${waitMs}ms of pointer movement — crashed publisher " +
          s"at $vdir (verify no live writer, then recoverWedgedClaimAt)")
      // Jittered exponential backoff, reset on pointer movement (r19
      // verdict): every poll is a currentVersionAt READ — one NameNode
      // RPC on hdfs:// — so a flat 1 ms spin under sustained contention
      // is ~1000 RPC/s PER waiting writer hammering the NameNode. 1 ms
      // stays for the first re-reads (a healthy racer's flip is one tiny
      // write away), then the interval doubles to a 64 ms ceiling — two
      // orders of magnitude less RPC pressure, still ~500 polls before a
      // 30 s no-movement horizon expires. Jitter desynchronizes waiters
      // that lost the same claim at the same instant.
      Thread.sleep(pollMs +
        java.util.concurrent.ThreadLocalRandom.current().nextLong(1 + pollMs / 2))
      pollMs = math.min(pollMs * 2, 64L)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Race-safe manifest APPEND: commit a version whose list is the
    * latest committed list plus `delta` (deduplicated, order preserved).
    * Two racing appenders serialize — neither delta is lost. */
  def appendDirsAt(st: VStore, root: String, delta: Seq[String]): String =
    commitDirsAt(st, root)(base => (base ++ delta).distinct)

  /** Test hook: [[appendDirsAt]] with a bounded wedge horizon, so the
    * crashed-claimer path (a claimed-but-never-flipped version ahead of
    * CURRENT) is spec-exercisable without a 30 s wait. */
  private[graft] def appendDirsWithinAt(st: VStore, root: String,
                                        delta: Seq[String],
                                        waitMs: Long): String =
    commitDirsAt(st, root, waitMs)(base => (base ++ delta).distinct)

  /** Race-safe manifest REPLACE (the compaction commit): `replaced` is
    * the dir list the caller compacted into `replacement`; any dirs that
    * landed AFTER the caller's read (appends racing the compaction)
    * survive by riding along behind the replacement — an append is pure
    * addition, so the merge is conflict-free. */
  def replaceDirsAt(st: VStore, root: String, replaced: Seq[String],
                    replacement: Seq[String]): String =
    commitDirsAt(st, root) { base =>
      (replacement ++ base.filterNot(replaced.contains)).distinct
    }

  /** The CURRENT version's data-directory list — resolved ONCE; the
    * returned dirs are immutable, so a plan over them reads one
    * consistent index no matter how many publishes land while it runs. */
  def resolveDirsAt(st: VStore, root: String): Seq[String] =
    st.readString(st.child(resolveAt(st, root), DirsFile)).trim
      .split("\n").toSeq.filter(_.nonEmpty)

  /** Delete data directories that no SURVIVING manifest version
    * references — the vacuum half of the index compaction cycle: after
    * [[retireAt]] drops old manifest versions, the delta dirs only those
    * versions named become unreachable, and this reclaims them.
    * `candidates` bounds the sweep to dirs the CALLER owns (an index
    * root must never vacuum a shared fixture it merely references).
    * Returns the dirs actually deleted. */
  def vacuumDirsAt(st: VStore, root: String,
                   candidates: Seq[String]): Seq[String] = {
    val live = st.listNames(root)
      .filter(_.matches("v\\d+"))
      .flatMap(v => dirsOfAt(st, st.child(root, v)))
      .toSet
    val doomed = candidates.filterNot(live.contains)
    doomed.foreach(st.deleteTree)
    doomed
  }

  // ---- the java.nio fast path (schemeless local roots) ------------------
  //
  // Every gate and the single-node deployment speak these Path spellings;
  // they are the exact protocol above bound to VStore.Local. A root on
  // cluster storage goes through the *At spellings with VStore.forRoot.

  /** [[publishAt]] on the local backend. */
  def publish(root: Path, write: Path => Unit): Path =
    Paths.get(publishAt(VStore.Local, root.toString,
      p => write(Paths.get(p))))

  /** [[resolveAt]] on the local backend. */
  def resolve(root: Path): Path =
    Paths.get(resolveAt(VStore.Local, root.toString))

  /** [[retireAt]] on the local backend. */
  def retire(root: Path, keep: Int): Unit =
    retireAt(VStore.Local, root.toString, keep)

  /** [[publishedAt]] on the local backend. */
  def published(root: Path): Boolean =
    publishedAt(VStore.Local, root.toString)

  /** [[publishDirsAt]] on the local backend. */
  def publishDirs(root: Path, dirs: Seq[String]): Path =
    Paths.get(publishDirsAt(VStore.Local, root.toString, dirs))

  /** [[appendDirsAt]] on the local backend. */
  def appendDirs(root: Path, delta: Seq[String]): Path =
    Paths.get(appendDirsAt(VStore.Local, root.toString, delta))

  private[graft] def appendDirsWithin(root: Path, delta: Seq[String],
                                      waitMs: Long): Path =
    Paths.get(appendDirsWithinAt(VStore.Local, root.toString, delta, waitMs))

  /** [[replaceDirsAt]] on the local backend. */
  def replaceDirs(root: Path, replaced: Seq[String],
                  replacement: Seq[String]): Path =
    Paths.get(replaceDirsAt(VStore.Local, root.toString, replaced,
      replacement))

  /** [[resolveDirsAt]] on the local backend. */
  def resolveDirs(root: Path): Seq[String] =
    resolveDirsAt(VStore.Local, root.toString)

  /** [[vacuumDirsAt]] on the local backend. */
  def vacuumDirs(root: Path, candidates: Seq[String]): Seq[String] =
    vacuumDirsAt(VStore.Local, root.toString, candidates)

  /** Resolve `path` through its CURRENT pointer when it is a versioned
    * root, else return it unchanged — the reader-side shim that lets one
    * conf/path key serve both layouts (a flat parquet dir and a
    * published root). Backend dispatch by scheme ([[VStore.forRead]]):
    * a schemeless root reads through java.nio, an hdfs:// root through
    * the Hadoop API — either way one tiny file, the same per-plan
    * metadata cost a table format pays to pin its latest snapshot. */
  def resolveIfVersioned(path: String): String = {
    // READ dispatch, deliberately permissive: resolving is plain reads,
    // safe on any filesystem — a flat parquet dir on an object store
    // must pass through unchanged (published() false), not throw the
    // COMMIT-side scheme refusal
    val st = VStore.forRead(path)
    if (publishedAt(st, path)) resolveAt(st, path) else path
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
