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
    // per-call job group: a driver-thread interrupt alone cannot stop a
    // Spark job the leg already SUBMITTED (the job runs on in the
    // scheduler), so each leg tags its jobs with this call's group and
    // the interrupt path cancels the group — firm cancellation instead
    // of the previous thread-interrupt-only best effort (r16 ADVICE).
    // Job-group state is thread-local to the leg, so sibling work on the
    // calling thread is untouched. Nested Par calls cancel their own
    // groups when the outer cancellation interrupts their awaiting leg.
    val sc = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext)
    val groupId = s"graft-par-${java.util.UUID.randomUUID()}"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futures = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          def call(): T = {
            sc.foreach(_.setJobGroup(groupId, "graft.Par leg",
              interruptOnCancel = true))
            t()
          }
        })
      }
      // await ALL legs before propagating anything, so a failed leg never
      // leaves a sibling running past the call. If the AWAITING thread is
      // itself interrupted (test timeout, job cancel, shutdown hook), the
      // legs' submitted jobs are cancelled via the group and the leg
      // threads interrupted (cancel(true) + shutdownNow) before
      // rethrowing — a detached leg no longer keeps running silently past
      // the call and the caller's claim scope
      val results = try {
        futures.map { f =>
          try Right(f.get())
          catch {
            case e: java.util.concurrent.ExecutionException =>
              Left(Option(e.getCause).getOrElse(e))
          }
        }
      } catch {
        case e: InterruptedException =>
          sc.foreach(_.cancelJobGroup(groupId))
          futures.foreach(_.cancel(true))
          pool.shutdownNow()
          throw e
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
