package graft

/** Two-process race harness for [[IncrementalPipeline.publishDay]]'s
  * cycle claim — spawned by IncrementalRepairSpec as REAL second and
  * third JVMs (the PublishWorker discipline: in-process thread races
  * share one JVM's FileSystem instance and can mask cross-process
  * windows). The scenario under proof is the stale-claim sweep race:
  * both workers find an AGED `.cycle-claim` (a crashed cycle's debris),
  * both judge it sweep-eligible, and the rename-atomic sweep must let
  * exactly one of them through — a plain delete would let the slower
  * sweeper remove the faster one's FRESH claim and put two folding
  * cycles live at once (the double-fold the claim exists to prevent).
  *
  * args: storeRoot idxRoot statsRoot logDir barrierDir tag graceMs
  *
  * Protocol: touch `<barrierDir>/ready-<tag>`, spin until
  * `<barrierDir>/go` exists, then run ONE publishDay with the given
  * claim grace, printing `DAY <tag> ok <version>` on success or
  * `REFUSED <tag>` when the claim is held (the allowed loser outcome).
  */
object CycleWorker {
  def main(args: Array[String]): Unit = {
    val Array(store, idx, stats, log, barrierDir, tag, graceStr) = args
    val spark = EngineSession.local("2")
    try {
      val ready = new java.io.File(barrierDir, s"ready-$tag")
      ready.getParentFile.mkdirs()
      ready.createNewFile()
      val go = new java.io.File(barrierDir, "go")
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (!go.exists()) {
        if (System.nanoTime() > deadline)
          sys.error(s"worker $tag: barrier never opened")
        Thread.sleep(20)
      }
      try {
        val d = IncrementalPipeline.publishDay(spark, store, idx, stats,
          log, cycleClaimGraceMs = graceStr.toLong)
        println(s"DAY $tag ok ${d.corpusVersion}")
      } catch {
        case e: IllegalStateException if e.getMessage.contains("cycle") =>
          println(s"REFUSED $tag")
      }
    } finally spark.stop()
  }
}
