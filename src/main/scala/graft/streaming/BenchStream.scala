package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sustained-throughput bench for the composed streaming curation
  * pipeline ([[DocStream.curationPipeline]]) — the number the r7 verdict
  * noted was missing: the pipeline is correctness-proven (stream ≡
  * batch, CurationPipelineSpec) but had no recorded docs/sec.
  *
  * Method: stage the SF dir's documents table as `nFiles` equal parquet
  * files with strictly increasing mtimes (so `maxFilesPerTrigger = 1`
  * yields `nFiles` real micro-batches — state carried across triggers,
  * not one big batch), run the full pipeline (span lane + screened
  * near-dup lane + shard finalization) over a fresh workDir, and report
  * wall, docs/sec, per-lane state sizes, and the kept fraction as one
  * JSON line. Timestamps are synthesized co-trigger (one distinct ts
  * per staged file, matching the span lane's watermark contract).
  */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nFiles = sys.env.get("SPARK_GRAFT_STREAM_FILES").map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.EngineSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "bench-stream").toString
    val inDir = s"$work/in"

    // stage: docs bucketed into nFiles by hash, one ts per file so span
    // duplicates are co-trigger (the operator contract the spec pins)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val baseTs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    (0 until nFiles).foreach { i =>
      docs.filter(pmod(hash(col("doc_id")), lit(nFiles)) === i)
        .withColumn("ts", lit(new java.sql.Timestamp(
          baseTs.getTime + i * 60000L)))
        .coalesce(1).write.parquet(s"$work/stage$i")
      val src = new java.io.File(s"$work/stage$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(inDir, f"part-$i%03d.parquet")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - (nFiles - i) * 60000L)
    }

    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      if (!d.exists()) 0L
      else d.listFiles().map(f =>
        if (f.isDirectory) dirBytes(f.toString) else f.length()).sum
    }

    val t0 = System.nanoTime()
    val shards = DocStream.curationPipeline(
      spark, inDir, s"$work/pipe", "ts",
      capacityDocs = math.max(1024L, nDocs * 2))
    val wallSec = (System.nanoTime() - t0) / 1e9

    val keptDocs = spark.read.parquet(s"$work/pipe/kept").count()
    val shardDocs = spark.read.parquet(shards).count()
    require(shardDocs == keptDocs, s"shards $shardDocs != kept $keptDocs")
    def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"stream_curation_docs_per_sec",""" +
      s""""value":${f1(nDocs / wallSec)},"wall_sec":${f3(wallSec)},""" +
      s""""docs_in":$nDocs,"docs_kept":$keptDocs,"triggers":$nFiles,""" +
      s""""index_bytes":${dirBytes(s"$work/pipe/index")},""" +
      s""""span_profile_bytes":${dirBytes(s"$work/pipe/span-profile")},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
