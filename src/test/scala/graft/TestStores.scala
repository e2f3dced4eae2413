package graft

import java.net.URI
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path => HPath,
  RawLocalFileSystem}

/** Test storage backends for the VersionedRoot/VStore protocol matrix.
  *
  * [[MockDfsFileSystem]]/[[MockDfsFs]] register a NON-LOCAL scheme
  * (`mockdfs://`) backed by local disk, closing the r19 verdict's #1:
  * VStore.Hadoop rebinds its two CONTENDED primitives to java.nio on
  * local/file schemes, so the hdfs:// branch's actual lines —
  * `fs.create(marker, overwrite=false)` and
  * `FileContext.rename(…, Options.Rename.OVERWRITE)` — executed in no
  * test. Under `mockdfs://` the scheme dispatch takes the hdfs branch,
  * so those exact lines now run under every protocol pin, with the two
  * primitives spelled ATOMICALLY (kernel creat(2)+O_EXCL / rename(2)) —
  * the same semantics a NameNode provides, which is the premise the
  * scaladoc argues; a real-HDFS run would differ only in RPC transport.
  * (Hadoop's own RawLocalFileSystem spells exclusive-create as
  * exists-check-then-act and OVERWRITE-rename as delete+rename — racy —
  * which is exactly why VStore.Hadoop refuses to use them on local
  * schemes; the mock restores the atomic contract the allowlisted
  * schemes guarantee, without a NameNode.)
  */
class MockDfsFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mockdfs"
  override def getUri: URI = URI.create("mockdfs:///")

  // exclusive create must be ATOMIC (the hdfs:// contract this scheme
  // models): claim the path with kernel-atomic creat(2)+O_EXCL first,
  // then open the stream over the file we now own. nio's
  // FileAlreadyExistsException is what VStore.Hadoop.claimDir catches.
  private def claimIfExclusive(f: HPath, overwrite: Boolean): Boolean = {
    if (!overwrite) { Files.createFile(pathToFile(f).toPath); () }
    true
  }

  override def create(f: HPath, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    claimIfExclusive(f, overwrite)
    super.create(f, true, bufferSize, replication, blockSize, progress)
  }

  override def create(f: HPath,
                      permission: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    claimIfExclusive(f, overwrite)
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
  }
}

/** The AbstractFileSystem binding for `mockdfs://` (FileContext side):
  * rename with OVERWRITE is one atomic rename(2) — the NameNode's
  * rename2 contract — instead of AbstractFileSystem's default
  * delete-then-rename. */
class MockDfsFs(uri: URI, conf: Configuration)
    extends DelegateToFileSystem(uri, new MockDfsFileSystem(), conf,
      "mockdfs", false) {
  override def renameInternal(src: HPath, dst: HPath,
                              overwrite: Boolean): Unit =
    if (overwrite) {
      Files.move(Paths.get(src.toUri.getPath), Paths.get(dst.toUri.getPath),
        StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING); ()
    } else super.renameInternal(src, dst)
}

object MockDfs {
  /** A Configuration that binds `mockdfs://` for both the FileSystem and
    * the FileContext resolution paths. */
  def conf(): Configuration = {
    val c = new Configuration()
    c.set("fs.mockdfs.impl", classOf[MockDfsFileSystem].getName)
    c.set("fs.AbstractFileSystem.mockdfs.impl", classOf[MockDfsFs].getName)
    c
  }
}

/** In-memory [[graft.operators.VStore.ConditionalPutStore]]: the
  * conditional-PUT semantics every major object store exposes
  * (S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`), spelled on a
  * ConcurrentHashMap so `putIfAbsent` is genuinely atomic under the
  * race specs and `put` is an atomic whole-value replace — the two
  * properties the ObjectStore adapter's commit protocol rests on. */
class MemPutStore extends graft.operators.VStore.ConditionalPutStore {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    m.putIfAbsent(key, bytes) == null
  def put(key: String, bytes: Array[Byte]): Unit = { m.put(key, bytes); () }
  def get(key: String): Array[Byte] = {
    val v = m.get(key)
    if (v == null) throw new java.io.FileNotFoundException(key)
    v
  }
  def exists(key: String): Boolean = m.containsKey(key)
  def listPrefix(prefix: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    m.keySet().asScala.iterator.filter(_.startsWith(prefix)).toSeq
  }
  def delete(key: String): Unit = { m.remove(key); () }
}
