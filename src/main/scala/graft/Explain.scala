package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: runs one registered query at a scale factor and
  * prints the AQE-final physical plan plus scan/exchange/reuse counts —
  * the `.explain("formatted")` feedback loop the scale audits use.
  *
  * Usage: graft.Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = EngineSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = QueryCatalog.byName(name).run(spark, sfDir)
    df.collect() // materialize so AQE finalizes every stage
    val p = df.queryExecution.executedPlan.toString
    println(s"scans=${"Scan parquet".r.findAllIn(p).size} " +
      s"exchanges=${"Exchange".r.findAllIn(p).size} " +
      s"reused=${"ReusedExchange".r.findAllIn(p).size} " +
      s"bnlj=${"BroadcastNestedLoopJoin".r.findAllIn(p).size} " +
      s"sortagg=${"SortAggregate".r.findAllIn(p).size}")
    println(df.queryExecution.executedPlan.treeString.linesIterator
      .map(_.take(160)).mkString("\n"))
    spark.stop()
  }
}
