package graft.operators

/** Cross-process commit drill for the [[VersionedRoot]] manifest (r19,
  * the r18 verdict's #6): the single-JVM racing-appender spec exercises
  * the kernel/NameNode primitives the protocol rests on, but "threads
  * interleave like processes" deserves a direct demonstration — this
  * main is one racing appender as its OWN process. Each invocation
  * lands `n` data directories through the race-safe [[VersionedRoot
  * .appendDirsAt]] loop; VersionedRootProcessSpec forks two of these
  * JVMs against one root and asserts no delta was lost and the version
  * sequence is gapless — the claim-in-order contract across real
  * process boundaries (mkdir(2)/rename(2) atomicity, nothing JVM-scoped).
  *
  * Also the operational recovery drill a deployment runs after a crash:
  * point it at a manifest root and it either commits past the wreckage
  * or fails loudly on a wedged claim.
  *
  * Usage: AppendRaceMain <root> <tag> <n>
  */
private[graft] object AppendRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(root, tag, nStr) = args
    val (st, rootPath) = VStore.forRoot(root)
    (0 until nStr.toInt).foreach { i =>
      val d = st.child(rootPath, s"data_${tag}_$i")
      st.mkdirs(d)
      VersionedRoot.appendDirsAt(st, rootPath, Seq(d)): Unit
    }
    println(s"appended ${nStr.toInt} deltas as $tag")
  }
}
