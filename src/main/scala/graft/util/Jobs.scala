package graft.util

/** Overlap INDEPENDENT eager Spark jobs (optimization guide §2.6).
  *
  * Spark's scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because the driver calls
  * them sequentially. Several operators and query bodies materialize
  * independent artifacts with EAGER actions (localCheckpoint rounds,
  * connected-components loops) that otherwise run strictly
  * one-after-another during DataFrame construction — each a
  * multi-stage job whose short stages leave most cores idle. A
  * thread pool sized to the artifact count lets each job's tasks
  * back-fill executors freed by the others' straggler tails (FIFO
  * scheduling = exactly the back-fill behaviour wanted; 2-6 jobs in
  * flight, never unbounded). Rows are identical — only job
  * submission overlap changes.
  */
object Jobs {

  /** Run the thunks concurrently and return their results in order.
    * A failing thunk rethrows its ORIGINAL exception (not the
    * ExecutionException wrapper) so error surfaces are unchanged. */
  def concurrently[A](thunks: (() => A)*): Seq[A] =
    if (thunks.sizeIs <= 1) thunks.map(_()).toSeq
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
      try {
        val futs = thunks.map(t =>
          pool.submit(new java.util.concurrent.Callable[A] { def call(): A = t() }))
        futs.map { f =>
          try f.get()
          catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
        }.toSeq
      } finally pool.shutdown()
    }
}
