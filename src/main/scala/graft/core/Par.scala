package graft.core

/** Driver-side helper for overlapping two INDEPENDENT Spark action
  * chains (optimization guide §2.6: the scheduler happily runs several
  * jobs at once — actions are only sequential because driver code calls
  * them sequentially, and on a wide local pool each chain's small
  * stages leave most cores idle for the other to back-fill).
  *
  * Use ONLY when the two thunks share no mutable state and touch
  * disjoint output locations: concurrency must move scheduling, never
  * bytes. Failures propagate: if the async side fails, its cause
  * rethrows (unwrapped) after the calling-thread side settles, so
  * caller cleanup (cache scopes, store invariants) runs exactly as in
  * the sequential form. */
object Par {

  def both[A, B](fa: => A, fb: => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val fut = pool.submit(new java.util.concurrent.Callable[A] {
        def call(): A = fa
      })
      val b = fb
      val a =
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException => throw e.getCause
        }
      (a, b)
    } finally { pool.shutdown(); () }
  }
}
