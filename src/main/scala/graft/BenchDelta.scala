package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Delta-proportionality measurement for the incremental dedup lane
  * (BASELINE.md r12 table; r11 review item 1's done-criterion).
  *
  * For one sf directory, times three things over a FIXED-SIZE delta (the
  * same 385 documents at every scale — `doc_id % 13 = 0 AND doc_id <
  * 5000` picks replica-0 rows only, which scaled stores keep verbatim):
  *
  *   - `build_sec`:   [[graft.operators.Dedup.writeBandIndex]] over the
  *                    corpus — the once-per-snapshot cost, expected to
  *                    scale with the CORPUS;
  *   - `screen_sec`:  the artifact-path screen
  *                    ([[graft.operators.Dedup.deduplicateAgainst]] on a
  *                    BandIndex) — the per-batch cost, expected ~FLAT as
  *                    the corpus grows at fixed delta;
  *   - `inline_sec`:  the self-contained overload that re-fingerprints
  *                    the corpus per batch — the i03 shape, expected to
  *                    scale with the corpus (the gap is the artifact's
  *                    point).
  *
  * Prints ONE JSON line. Usage: BenchDelta <sfDir> [deltaIdBound].
  * `deltaIdBound` (default 5000 = replica 0 only) widens the delta to
  * more replicas — the axis that shows screen cost tracking DELTA size
  * at a fixed corpus.
  */
object BenchDelta {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val deltaIdBound = args.drop(1).headOption.map(_.toLong).getOrElse(5000L)
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = EngineSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = Tables.parallel(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    // fixed absolute delta at every scale: replica-0 ids only
    val delta = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 13 === 0 && col("doc_id") < deltaIdBound)
      .select((-col("doc_id") - 1).as("doc_id"),
        when(col("doc_id") % 26 === 0,
          concat(lit("entirely fresh content row "),
            col("doc_id").cast("string")))
          .otherwise(concat(col("text"), lit(" appended"))).as("text"))
      .localCheckpoint()
    val nCorpus = corpus.count()
    val nDelta = delta.count()

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def minOf2(f: => Long): Double = {
      f // untimed warm-up
      math.min(time(f)._1, time(f)._1)
    }

    val root = java.nio.file.Files.createTempDirectory("graft-benchdelta")
      .toString
    val (buildSec, _) = time(operators.Dedup.writeBandIndex(corpus, root))
    val idx = operators.Dedup.loadBandIndex(spark, root)
    var screenKept = -1L
    val screenSec = minOf2 {
      screenKept = operators.Dedup.deduplicateAgainst(delta, idx, 0.6).count()
      screenKept
    }
    var inlineKept = -1L
    val inlineSec = minOf2 {
      inlineKept = operators.Dedup.deduplicateAgainst(delta, corpus, 0.6).count()
      inlineKept
    }
    require(screenKept == inlineKept,
      s"artifact/inline divergence: $screenKept vs $inlineKept")

    println(s"""{"sf_dir":"$sfDir","n_corpus":$nCorpus,"n_delta":$nDelta,""" +
      s""""kept":$screenKept,"build_sec":${f"$buildSec%.3f"},""" +
      s""""screen_sec":${f"$screenSec%.3f"},""" +
      s""""inline_sec":${f"$inlineSec%.3f"}}""")
    spark.stop()
  }
}
