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
  *       nRounds plant
  *
  * Protocol: touch `<barrierDir>/ready-<tag>`, spin until
  * `<barrierDir>/go` exists, then run `nRounds` LOCKSTEP rounds (the
  * PublishWorker repetition discipline — the JVM spawn is the expensive
  * part, so one spawn buys nRounds aligned race windows). Per round:
  * the `plant=plant` worker re-plants an AGED `.cycle-claim` if the
  * path is free (a fresh crashed-cycle's debris), both workers meet a
  * `round-<i>-<tag>` barrier, then race publishDay, printing
  * `DAY <tag> ok <version>` or `REFUSED <tag>` (the allowed loser
  * outcome). An end-of-round `done-<i>-<tag>` barrier keeps the next
  * plant strictly after both racers finished the previous round.
  */
object CycleWorker {
  def main(args: Array[String]): Unit = {
    val Array(store, idx, stats, log, barrierDir, tag, graceStr,
      nRoundsStr, plant) = args
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
      val bd = new java.io.File(barrierDir)
      def meet(prefix: String, i: Int): Unit = {
        new java.io.File(bd, s"$prefix-$i-$tag").createNewFile()
        val rd = System.nanoTime() + 120L * 1000000000L
        // File.list() returns null on a transient IO error — an NPE here
        // would fail the race suite spuriously mid-barrier
        while (Option(bd.list()).getOrElse(Array.empty[String])
          .count(_.startsWith(s"$prefix-$i-")) < 2) {
          if (System.nanoTime() > rd)
            sys.error(s"worker $tag: $prefix-$i barrier never filled")
          Thread.sleep(2)
        }
      }
      (0 until nRoundsStr.toInt).foreach { i =>
        if (plant == "plant") {
          val c = new java.io.File(store, ".cycle-claim")
          if (c.createNewFile())
            c.setLastModified(System.currentTimeMillis() - 1000000L)
        }
        meet("round", i)
        try {
          val d = IncrementalPipeline.publishDay(spark, store, idx, stats,
            log, cycleClaimGraceMs = graceStr.toLong)
          println(s"DAY $tag ok ${d.corpusVersion}")
        } catch {
          case e: IllegalStateException if e.getMessage.contains("cycle") =>
            println(s"REFUSED $tag")
        }
        meet("done", i)
      }
    } finally spark.stop()
  }
}
