package graft

import org.apache.spark.sql.functions._

/** Two-process race harness for [[sources.VersionedStore.publish]] —
  * spawned by VersionedStoreSpec as a REAL second (and third) JVM.
  * In-process thread races share one JVM's Hadoop FileSystem instance
  * and lock tables, which can mask check-then-create windows that two
  * independent processes hit for real; this worker is the honest proof
  * for the claim-first protocol's contract (distinct versions, loser
  * stays readable, no cross-contamination of slot contents).
  *
  * args: root barrierDir tag nPublishes nWorkers
  *
  * Protocol: touch `<barrierDir>/ready-<tag>`, spin until
  * `<barrierDir>/go` exists (so both workers' publish loops overlap
  * regardless of JVM startup jitter), then publish `nPublishes`
  * 10-row frames whose text rows carry the worker's tag, printing
  * `PUBLISHED <tag> <version>` per publish.
  *
  * LOCKSTEP rounds: before publish `i`, each worker touches
  * `<barrierDir>/round-<i>-<tag>` and spins until `nWorkers` such
  * markers exist for round `i`. Without this, workers drift apart after
  * the initial barrier and later publishes stop overlapping — one JVM
  * spawn then buys ONE race window instead of `nPublishes`. With it,
  * every round's claim/stage/pointer-flip sequences race for real,
  * which is what makes a green run meaningful for a ~40%-per-window
  * defect (the r13 ChecksumFs flip race reproduced in 2 of 5
  * single-shot runs; 20 aligned windows push a survivor's escape
  * probability below 1e-4 at that rate).
  */
object PublishWorker {
  def main(args: Array[String]): Unit = {
    val Array(root, barrierDir, tag, nStr, nWorkersStr) = args
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
      val nWorkers = nWorkersStr.toInt
      val bd = new java.io.File(barrierDir)
      (0 until nStr.toInt).foreach { i =>
        new java.io.File(bd, s"round-$i-$tag").createNewFile()
        val rd = System.nanoTime() + 120L * 1000000000L
        // File.list() returns null on a transient IO error — an NPE here
        // would fail the race suite spuriously mid-barrier
        while (Option(bd.list()).getOrElse(Array.empty[String])
          .count(_.startsWith(s"round-$i-")) < nWorkers) {
          if (System.nanoTime() > rd)
            sys.error(s"worker $tag: round-$i barrier never filled")
          Thread.sleep(2)
        }
        val df = spark.range(10).select(col("id").as("doc_id"),
          concat(lit(s"$tag-"), col("id").cast("string")).as("text"))
        val v = sources.VersionedStore.publish(df, root)
        // parsed by the spec; println is the worker's only channel
        println(s"PUBLISHED $tag $v")
      }
    } finally spark.stop()
  }
}
