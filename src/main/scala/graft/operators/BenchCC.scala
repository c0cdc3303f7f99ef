package graft.operators

import org.apache.spark.sql.SparkSession

/** Local-vs-distributed connected-components bench on REAL near-dup
  * pairs (the same `jaccardPairs` graph d07 rides), answering the r7
  * verdict's open question: what does the pointer-jumping loop cost at
  * the scale where the adaptive threshold would hand over to it?
  *
  * Method: materialize the Jaccard-confirmed pair graph once
  * (localCheckpoint — neither CC run re-pays pair generation), then run
  * [[Dedup.connectedComponentsStats]] twice on the SAME input — once
  * with the default threshold (driver-local union-find) and once with
  * `localEdgeThreshold = 0` (the distributed loop) — assert the labels
  * identical, and print one JSON line with both walls, the edge count,
  * and the distributed round count. Results land in BASELINE.md's CC
  * section.
  */
object BenchCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.EngineSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    // same parameterization as d07 (jaccardClusters defaults)
    val pairs = Dedup.jaccardPairs(docs, jaccardThreshold = 0.6, dfCap = 50)
      .localCheckpoint()
    val nPairs = pairs.count()
    def labelsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm-up: one throwaway run per path JIT-compiles the shared codepaths
    Dedup.connectedComponentsStats(pairs)._1.count()
    Dedup.connectedComponentsStats(pairs, localEdgeThreshold = 0L)._1.count()
    val ((localLabels, localPath), localSec) = time {
      val (df, _, p) = Dedup.connectedComponentsStats(pairs)
      (labelsOf(df), p)
    }
    val ((distLabels, distIters, distPath), distSec) = time {
      val (df, i, p) = Dedup.connectedComponentsStats(pairs, localEdgeThreshold = 0L)
      (labelsOf(df), i, p)
    }
    require(localPath == "local" && distPath == "distributed",
      s"unexpected paths: $localPath / $distPath")
    require(localLabels == distLabels,
      "local and distributed labels differ — adaptive CC is broken")
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"cc_local_vs_distributed","edges":$nPairs,""" +
      s""""local_sec":${f3(localSec)},"distributed_sec":${f3(distSec)},""" +
      s""""distributed_iters":$distIters,"sf":"$sfDir"}""")
    spark.stop()
  }
}
