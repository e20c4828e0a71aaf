package graft.operators

/** Overlap INDEPENDENT eager member constructions (optimization guide
  * §2.6, "Overlap independent jobs"): Spark's scheduler happily runs
  * several jobs at once inside one application — the member sheets of
  * a composition like [[Ensemble.sourceScorecard]] were only built
  * sequentially because the driver code called their (eagerly
  * materializing) constructors sequentially. Submitting the
  * constructions from a small thread pool lets each member's jobs
  * back-fill executor slots freed by another member's stage tail —
  * identical results, wall-clock ≈ the slowest member instead of the
  * sum.
  *
  * Safety: every thunk must be independent (no thunk may read another
  * thunk's result) and all Spark state touched here is thread-safe —
  * job groups/descriptions are thread-local by design (the guide's
  * documented pattern), `DataFrame` construction and
  * checkpoint/localCheckpoint actions go through `df.sparkSession`,
  * never the thread-local active session. FIFO scheduling (the
  * default) gives the earlier-submitted member priority and later
  * members the leftover slots — exactly the back-fill behaviour the
  * guide describes.
  *
  * Failure contract: the FIRST failing thunk's own exception
  * propagates (unwrapped from ExecutionException); remaining threads
  * are interrupted best-effort via shutdownNow. */
object Par {

  /** Run the thunks concurrently, one thread each, and return their
    * results in declaration order. Degenerates to plain sequential
    * evaluation for 0 or 1 thunks. */
  def run[T](thunks: (() => T)*): Seq[T] = {
    if (thunks.sizeIs <= 1) thunks.map(_()).toSeq
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
      try {
        val futs = thunks.map { t =>
          pool.submit(new java.util.concurrent.Callable[T] {
            def call(): T = t()
          })
        }
        futs.map { f =>
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }.toSeq
      } finally pool.shutdownNow()
    }
  }
}
