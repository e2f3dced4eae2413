package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{VStore, VersionedRoot}

/** Cross-PROCESS race evidence for the manifest commit (r19, the r18
  * verdict's #6): CompactionSpec/VersionedRootStoreSpec race threads in
  * one JVM; this spec forks two real JVMs (graft.operators
  * .AppendRaceMain) appending concurrently against one root. The
  * protocol's two contended primitives — the atomic directory claim and
  * the atomic pointer swap — are single syscalls (mkdir(2)/rename(2))
  * with no JVM-side locking, so processes must interleave exactly like
  * threads: every delta survives, the version sequence is gapless.
  */
class VersionedRootProcessSpec extends AnyFunSuite {

  test("two JVMs racing appendDirs lose no delta; versions are gapless") {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/tmp"), "vroot_proc")
      .toString
    val st = VStore.Local
    val base = st.child(root, "data_base")
    st.mkdirs(base)
    VersionedRoot.publishDirsAt(st, root, Seq(base)) // v1
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val perProc = 6
    def fork(tag: String): Process =
      new ProcessBuilder(javaBin, "-cp", sys.props("java.class.path"),
        "graft.operators.AppendRaceMain", root, tag, perProc.toString)
        .redirectErrorStream(true)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .start()
    val (p1, p2) = (fork("p1"), fork("p2"))
    assert(p1.waitFor(60, java.util.concurrent.TimeUnit.SECONDS)
      && p2.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
      "racing appender processes must terminate")
    assert(p1.exitValue() == 0 && p2.exitValue() == 0,
      s"appender exit codes: ${p1.exitValue()} / ${p2.exitValue()}")
    val dirs = VersionedRoot.resolveDirsAt(st, root)
    val expected = (base +: (for {
      tag <- Seq("p1", "p2"); i <- 0 until perProc
    } yield st.child(root, s"data_${tag}_$i"))).toSet
    assert(dirs.toSet == expected,
      s"lost deltas across processes: ${(expected -- dirs.toSet).toSeq.sorted}")
    // gapless claim-in-order sequence: v1 (the base publish) + one
    // version per append, none skipped, none orphaned
    assert(VersionedRoot.resolveAt(st, root).endsWith(s"v${1 + 2 * perProc}"))
  }
}
