package graft.operators

/** Run independent Spark ACTIONS concurrently from a small driver-side
  * thread pool — optimization guide §2.6 ("overlap independent jobs"):
  * Spark's scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because driver code calls
  * them sequentially. Within one index-lifecycle gate, the delta-table
  * writes land in DISJOINT output dirs with no data dependency between
  * them, so submitting them sequentially leaves the cluster idle through
  * every job's straggler tail. Overlapping them changes only WHEN each
  * job runs, never what it computes: results are byte-identical, and
  * callers keep ordering across groups (a write that reads a prior
  * write's output goes in a later group).
  *
  * Shared cached frames are safe to reference from several jobs: an
  * InMemoryRelation fill is per-partition locked (one job computes, the
  * others wait on the filled block).
  *
  * Failures propagate loudly: every job settles, then the first failed
  * job's cause is rethrown — never a silent partial delta.
  */
private[graft] object ParallelJobs {
  def inParallel(jobs: (() => Unit)*): Unit = {
    if (jobs.lengthCompare(1) <= 0) { jobs.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(jobs.size)
    try {
      val futs = jobs.map { j =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = j()
        })
      }
      var firstFailure: Throwable = null
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure == null) firstFailure = e.getCause
          case e: InterruptedException =>
            Thread.currentThread().interrupt()
            if (firstFailure == null) firstFailure = e
        }
      }
      if (firstFailure != null) throw firstFailure
    } finally { pool.shutdownNow(): Unit }
  }
}
