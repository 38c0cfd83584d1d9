package graft.ext

/** Concurrent driver actions for INDEPENDENT sub-jobs of one gate
  * (optimization guide §2.6 "overlap independent jobs"): Spark's
  * scheduler runs several jobs at once inside one application —
  * actions are only sequential because driver code calls them
  * sequentially, so a gate that eagerly materializes several
  * independent frames (exact pass / routed pass / ground-truth pass)
  * can submit them from a small pool and let the later jobs' tasks
  * back-fill executors freed by the earlier jobs' tails. FIFO
  * scheduling keeps the first job prioritized — exactly the
  * back-fill behavior wanted.
  *
  * Build the DataFrames SEQUENTIALLY first, then hand only the
  * ACTIONS (localCheckpoint(true), count, ...) to [[run]]: actions on
  * already-constructed Datasets are thread-safe; concurrent plan
  * CONSTRUCTION against one session is not worth auditing.
  */
object Par {

  /** Run the thunks concurrently, return results in order. Exceptions
    * propagate (first failing thunk's cause). Degenerate sizes run
    * inline.
    */
  def run[A](thunks: Seq[() => A]): Seq[A] = {
    if (thunks.sizeIs <= 1) thunks.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
      try {
        val futs = thunks.map { t =>
          pool.submit(new java.util.concurrent.Callable[A] {
            def call(): A = t()
          })
        }
        futs.map { f =>
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }
      } finally pool.shutdown()
    }
  }
}
