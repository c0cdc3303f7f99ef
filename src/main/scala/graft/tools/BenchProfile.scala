package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query execution profile for the optimization loop (guide §1/§7.1 —
  * the UI is disabled in bench runs, so a listener stands in for the
  * stage/event-timeline view): for every registered query, one warm-up
  * run then one timed run with per-query counters —
  *
  *   wall        timed-run wall seconds (same `count()` action as Bench)
  *   plan_ms     driver-side time to BUILD the DataFrame (analysis; the
  *               `fn(spark, sfDir)` call — catalyst planning of the final
  *               physical plan happens under the action and lands in wall)
  *   jobs/stages/tasks   scheduler round-trips the action needed
  *   task_ms     sum of task wall (executor compute incl. fetch)
  *   cpu_ms      sum of task executor CPU time
  *
  * wall − task_ms/cores ≈ orchestration floor (scheduling + planning +
  * AQE re-optimization + driver work); queries where that dominates are
  * overhead-bound, not compute-bound — different fixes (guide §1.2 step 1
  * vs step 3).
  *
  *   java -cp "classes:SPARK_JARS" graft.tools.BenchProfile <sfDir> <out.tsv> [q1,...]
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val only = args.lift(2).map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val cpuMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          cpuMs.addAndGet(m.executorCpuTime / 1000000L)
        }
      }
    })

    val qs = graft.QueryCatalog.all
      .filter(q => only.forall(_.contains(q.name)))
    // warm-up pass (JIT + codegen cache), same as Bench
    qs.foreach { q =>
      try q.run(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val sb = new StringBuilder(
      "name\twall_s\tplan_ms\tjobs\tstages\ttasks\ttask_ms\tcpu_ms\n")
    qs.foreach { q =>
      try {
        spark.sparkContext.setJobDescription(s"profile: ${q.name}")
        val tPlan0 = System.nanoTime()
        val df = q.run(spark, sfDir)
        val planMs = (System.nanoTime() - tPlan0) / 1000000L
        // settle listener lag from the previous query
        Thread.sleep(30)
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); cpuMs.set(0)
        val t0 = System.nanoTime()
        df.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(30) // let the bus drain before snapshotting
        sb.append(f"${q.name}\t$wall%.3f\t$planMs\t${jobs.get}\t" +
          s"${stages.get}\t${tasks.get}\t${taskMs.get}\t${cpuMs.get}\n")
      } catch {
        case e: Throwable => sb.append(s"${q.name}\tFAILED\t${e.getClass}\n")
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(sb.toString)
    spark.stop()
  }
}
