package graft.tools

import java.nio.file.{Files, Paths}

/** Catalog-wide plan dump for the optimization loop (guide §1/§7.2):
  * writes each registered query's `.explain("formatted")` output to
  * `<outDir>/<name>.txt` and prints one summary line per query with the
  * operator counts the optimization checklist tracks (Exchange, reused
  * exchanges, scans, SortAggregate, BroadcastNestedLoopJoin, SortMergeJoin,
  * BroadcastHashJoin, WholeStageCodegen spans).
  *
  * By default the query is also EXECUTED (`count()` — the bench's timed
  * action) so the summary counts come from the AQE-final plan, which is
  * what actually ran; the formatted dump is the pre-execution plan (the
  * judge-checkable artifact, stable across boxes). `SPARK_GRAFT_NOEXEC=1`
  * skips execution for a fast structural sweep.
  *
  *   java -cp "classes:SPARK_JARS" graft.tools.PlanDump <sfDir> <outDir> [q1,q2,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only = args.lift(2).map(_.split(",").map(_.trim).toSet)
    val noExec = sys.env.contains("SPARK_GRAFT_NOEXEC")
    Files.createDirectories(Paths.get(outDir))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineSession.local(cpus)
    val names = graft.QueryCatalog.all.map(_.name)
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      try {
        spark.sparkContext.setJobDescription(s"plandump: $name")
        val df = graft.QueryCatalog.byName(name).run(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"$name.txt"), formatted)
        val p =
          if (noExec) formatted
          else { df.count(); df.queryExecution.executedPlan.toString }
        def c(pat: String) = pat.r.findAllIn(p).size
        // "Exchange" matches ReusedExchange/BroadcastExchange too; count the
        // shuffle ones explicitly so the checklist's "Exchange count" is
        // the number of shuffles actually paid.
        println(s"$name shuffles=${c("(?m)^[^R]*Exchange (hash|range|Single)")} " +
          s"bcast=${c("BroadcastExchange")} reused=${c("ReusedExchange")} " +
          s"scans=${c("Scan parquet")} smj=${c("SortMergeJoin")} " +
          s"bhj=${c("BroadcastHashJoin")} shj=${c("ShuffledHashJoin")} " +
          s"bnlj=${c("BroadcastNestedLoopJoin")} sortagg=${c("SortAggregate")} " +
          s"wsc=${c("WholeStageCodegen")}")
      } catch {
        case e: Throwable =>
          println(s"$name FAILED ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
