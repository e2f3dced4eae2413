package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The five storage primitives the [[VersionedRoot]] commit protocol
  * rests on, behind one backend seam (r19, the r18 verdict's #1): every
  * index family plus the balance MV commits through the manifest, so the
  * protocol must commit on the storage a 100 TB lake actually lives on,
  * not only on local POSIX.
  *
  *   - `claimDir`: ATOMICALLY create a directory that must not already
  *     exist — the version-number reservation. Exactly one of N racing
  *     claimers wins; losers observe "already claimed", never a partial.
  *   - `atomicSwap`: rename `src` onto `dst`, replacing it, as one
  *     indivisible operation — the pointer flip. A concurrent reader of
  *     `dst` sees the old content or the new, never a torn file.
  *   - `mkdirs` / `exists` / `readString` / `writeString` / `listNames` /
  *     `deleteTree`: the non-contended plumbing (idempotent, no atomicity
  *     burden beyond their own call).
  *
  * Backends:
  *   - [[VStore.Local]] — java.nio: `Files.createDirectory` (kernel-
  *     atomic mkdir(2): EEXIST for every loser regardless of process) and
  *     `ATOMIC_MOVE` rename (rename(2), atomic within a filesystem).
  *     The fast path for schemeless/`file:` roots — zero Hadoop overhead
  *     per pointer read, which matters because serve paths resolve
  *     CURRENT per plan.
  *   - [[VStore.hadoop]] — the Hadoop FileSystem/FileContext API. On
  *     HDFS both primitives are NameNode-atomic: the claim is a
  *     rename-without-OVERWRITE of a private staging dir onto the version
  *     name (HDFS rename2 fails with FileAlreadyExistsException if the
  *     destination exists — the same reservation semantics as mkdir-
  *     exclusive), and the flip is rename with Options.Rename.OVERWRITE
  *     (atomic replace, the primitive HBase/Iceberg-on-HDFS commits use).
  *     A file:/schemeless path through this store binds the two
  *     contended primitives to the kernel spellings instead (see the
  *     class doc — Hadoop's local connector has no atomic exclusive-
  *     create or overwrite-rename), so the protocol is equally strong on
  *     either scheme. Object stores without atomic rename (s3a://) are
  *     explicitly NOT claimed: their rename is copy+delete, so a manifest
  *     root on raw S3 needs a conditional-PUT (If-None-Match) adapter or
  *     a log-ordered commit service (the S3A committer / DynamoDB-lock
  *     pattern); [[VStore.forPath]] fails fast on those schemes rather
  *     than committing on a non-atomic rename.
  *
  * Reference analog: the reference's atomic-commit primitive is the
  * Postgres upsert (SecondaryPersistence.scala:30-127); a lake engine's
  * equivalent must be exactly as strong on its own storage, which is what
  * this seam provides.
  */
private[graft] sealed trait VStore {
  def mkdirs(p: String): Unit
  /** Atomically create directory `p`; true iff THIS caller created it.
    * False means another (possibly crashed) claimer owns it. */
  def claimDir(p: String): Boolean
  def exists(p: String): Boolean
  def readString(p: String): String
  def writeString(p: String, content: String): Unit
  /** Atomic rename of `src` onto `dst`, replacing any existing `dst`. */
  def atomicSwap(src: String, dst: String): Unit
  /** Immediate-child names of `dir` (files and directories). */
  def listNames(dir: String): Seq[String]
  def deleteTree(p: String): Unit
  def child(dir: String, name: String): String
}

private[graft] object VStore {

  /** java.nio backend — the default for schemeless local roots. */
  object Local extends VStore {
    def mkdirs(p: String): Unit = { Files.createDirectories(Paths.get(p)); () }
    def claimDir(p: String): Boolean =
      try { Files.createDirectory(Paths.get(p)); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    def exists(p: String): Boolean = Files.exists(Paths.get(p))
    def readString(p: String): String = Files.readString(Paths.get(p))
    def writeString(p: String, content: String): Unit = {
      Files.writeString(Paths.get(p), content); ()
    }
    def atomicSwap(src: String, dst: String): Unit = {
      Files.move(Paths.get(src), Paths.get(dst),
        StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING); ()
    }
    def listNames(dir: String): Seq[String] = {
      val s = Files.list(Paths.get(dir))
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }
    def deleteTree(p: String): Unit =
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
    def child(dir: String, name: String): String =
      Paths.get(dir).resolve(name).toString
  }

  /** Hadoop FileSystem backend — hdfs:// and any scheme with an atomic
    * rename contract. One instance per Hadoop Configuration; FileSystem
    * handles come from Hadoop's own per-scheme cache (unwrapped to the
    * RAW filesystem when the scheme wraps a ChecksumFileSystem: `.crc`
    * sidecars are client-side local artifacts that a rename-based commit
    * must not drag along — HDFS stores checksums in the blocks and never
    * takes this branch).
    *
    * Per-scheme primitive binding for the two CONTENDED operations: on
    * hdfs:// the claim is rename-without-OVERWRITE of a private staging
    * dir onto the version name and the flip is rename with OVERWRITE —
    * both single NameNode transactions (rename2). Hadoop's LOCAL
    * connector spells neither atomically (RawLocalFileSystem's
    * exclusive-create and overwrite-rename are exists-check-then-act,
    * and AbstractFileSystem's default OVERWRITE path is delete+rename),
    * while the kernel has atomic spellings of exactly these two —
    * mkdir(2) and rename(2) — so a file:/schemeless path binds claim and
    * swap to java.nio directly: same semantics the NameNode provides
    * natively, no silent weakening. Everything non-contended goes
    * through the Hadoop FileSystem on every scheme. */
  final class Hadoop(conf: org.apache.hadoop.conf.Configuration)
      extends VStore {
    import org.apache.hadoop.fs.{FileContext, FileSystem, Options,
      Path => HPath}

    private def hp(p: String) = new HPath(p)
    private def fs(p: HPath): FileSystem = p.getFileSystem(conf) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }
    private def fc(p: HPath) =
      if (p.toUri.getScheme == null) FileContext.getFileContext(conf)
      else FileContext.getFileContext(p.toUri, conf)
    private def isLocalScheme(p: HPath): Boolean = {
      val s = p.toUri.getScheme
      s == null || s == "file"
    }
    private def nio(p: HPath): java.nio.file.Path =
      java.nio.file.Paths.get(p.toUri.getPath)

    def mkdirs(p: String): Unit = { fs(hp(p)).mkdirs(hp(p)); () }

    /** The claim. hdfs://: stage a private directory, rename it (NO
      * overwrite) onto the version name — the exists-check and move are
      * one NameNode transaction, losers get FileAlreadyExistsException,
      * exactly mkdir-exclusive semantics. (FileSystem.mkdirs cannot
      * claim: it is mkdir -p, success on an existing directory.)
      * file:/schemeless: mkdir(2) via java.nio — the kernel's exclusive
      * create (see class doc for why the Hadoop local connector can't). */
    def claimDir(p: String): Boolean = {
      val dst = hp(p)
      if (isLocalScheme(dst))
        try { Files.createDirectory(nio(dst)); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      else {
        val tmp = new HPath(dst.getParent,
          s".claim-${java.util.UUID.randomUUID()}")
        fs(dst).mkdirs(tmp)
        try { fc(dst).rename(tmp, dst); true }
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException |
               _: java.nio.file.FileAlreadyExistsException =>
            fs(dst).delete(tmp, true); false
          case e: java.io.IOException =>
            // some FS shims report "destination exists" as a bare
            // IOException; a lost claim only if dst now exists
            fs(dst).delete(tmp, true)
            if (fs(dst).exists(dst)) false else throw e
        }
      }
    }

    def exists(p: String): Boolean = fs(hp(p)).exists(hp(p))

    def readString(p: String): String = {
      val in = fs(hp(p)).open(hp(p))
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }

    def writeString(p: String, content: String): Unit = {
      val out = fs(hp(p)).create(hp(p), true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }

    /** The flip. hdfs://: rename with Options.Rename.OVERWRITE — the
      * atomic-replace NameNode transaction (the primitive HBase/Iceberg
      * commits on HDFS use). file:/schemeless: rename(2) via java.nio
      * ATOMIC_MOVE (the AbstractFileSystem default would delete+rename —
      * a torn-pointer window the kernel primitive doesn't have). */
    def atomicSwap(src: String, dst: String): Unit = {
      val d = hp(dst)
      if (isLocalScheme(d)) {
        Files.move(nio(hp(src)), nio(d),
          StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING); ()
      } else fc(d).rename(hp(src), d, Options.Rename.OVERWRITE)
    }

    def listNames(dir: String): Seq[String] =
      fs(hp(dir)).listStatus(hp(dir)).toSeq.map(_.getPath.getName)

    def deleteTree(p: String): Unit = { fs(hp(p)).delete(hp(p), true); () }

    def child(dir: String, name: String): String =
      new HPath(hp(dir), name).toString
  }

  def hadoop(conf: org.apache.hadoop.conf.Configuration): VStore =
    new Hadoop(conf)

  /** The active session's Hadoop conf when there is one (it carries the
    * deployment's fs.defaultFS, credentials, nameservices), else a
    * plain Configuration — matches what Spark's own readers resolve. */
  private def activeHadoopConf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Schemes whose Hadoop "rename" is copy+delete (not atomic): a
    * manifest commit on them would be last-copy-wins corruption, so the
    * dispatch refuses rather than silently weakening the protocol. */
  private val NonAtomicRenameSchemes =
    Set("s3a", "s3", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss")

  /** Backend for a root path: schemeless → the java.nio fast path;
    * file:/hdfs:/any-atomic-rename scheme → the Hadoop backend; known
    * copy-rename object stores → fail fast with the adapter guidance. */
  def forPath(path: String): VStore = {
    val scheme = new org.apache.hadoop.fs.Path(path).toUri.getScheme
    if (scheme == null) Local
    else if (NonAtomicRenameSchemes.contains(scheme.toLowerCase))
      throw new IllegalArgumentException(
        s"versioned-root commits need an atomic rename; scheme '$scheme' " +
          "renames by copy+delete. Route this root through a " +
          "conditional-PUT adapter or a table-format commit instead " +
          "(see VStore scaladoc).")
    else hadoop(activeHadoopConf)
  }
}
