package graft

/** Bounded overlap of INDEPENDENT Spark actions from driver threads —
  * optimization-guide §2.6: actions are only sequential because driver
  * code calls them sequentially; submitting independent jobs concurrently
  * lets the scheduler back-fill one job's straggler tail with the next
  * job's tasks. FIFO scheduling (the default) keeps the first job's
  * resource priority, which is exactly the back-fill behaviour wanted.
  *
  * Used where a composed pipeline runs several ALREADY-INDEPENDENT legs
  * (writes to disjoint roots, aggregates over pinned snapshots): results
  * and any produced on-disk state are unchanged — only the wall-clock
  * interleaving differs. Legs that mutate the SAME state must stay
  * sequential; callers own that analysis (documented per call site).
  *
  * Failure semantics: every leg is awaited (no job outlives the call),
  * and the first failure rethrows its original cause.
  */
private[graft] object Par {

  def all[T](thunks: (() => T)*): Seq[T] = {
    if (thunks.sizeIs <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futures = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          def call(): T = t()
        })
      }
      // await ALL legs before propagating anything, so a failed leg never
      // leaves a sibling running past the call
      val results = futures.map { f =>
        try Right(f.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Left(Option(e.getCause).getOrElse(e))
        }
      }
      results.collectFirst { case Left(e) => throw e }
      results.map(_.toOption.get)
    } finally pool.shutdown()
  }

  /** Two heterogeneous legs. */
  def both[A, B](a: () => A, b: () => B): (A, B) = {
    val r = all[Any](() => a(), () => b())
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }

  /** Three heterogeneous legs. */
  def three[A, B, C](a: () => A, b: () => B, c: () => C): (A, B, C) = {
    val r = all[Any](() => a(), () => b(), () => c())
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B], r(2).asInstanceOf[C])
  }
}
