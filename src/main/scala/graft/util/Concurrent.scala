package graft.util

/** Bounded-concurrency driver-side fan-out for file-system side effects
  * (archive moves, head reads). The reference's ADF copy activity runs
  * with `batchCount: 10` concurrent workers
  * (ADF/pipeline/archive_inbound_files.json:15-16); this is the same
  * semantics for the engine's driver-side movers. Data-plane work never
  * goes through here — only metadata/FS operations.
  */
object Concurrent {

  /** Apply `f` to every item with up to `parallelism` concurrent
    * workers, preserving input order in the result. The first failure
    * propagates after all submitted work settles. */
  def forEach[A, B](items: Seq[A], parallelism: Int)(f: A => B): Seq[B] = {
    if (items.isEmpty) return Nil
    if (items.size == 1 || parallelism <= 1) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, items.size))
    try {
      val futures = items.map { a =>
        pool.submit(new java.util.concurrent.Callable[B] { def call(): B = f(a) })
      }
      futures.map(_.get())
    } finally pool.shutdown()
  }
}
