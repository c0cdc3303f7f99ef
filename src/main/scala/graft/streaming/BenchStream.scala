package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sustained-throughput bench of the composed streaming curation pipeline
  * ([[DocStream.curationPipeline]]: gate → classifier → span dedup →
  * screened near-dup ingest → shards).
  *
  * Stream ≡ batch CORRECTNESS is CurationPipelineSpec's job; this main
  * records the numbers BASELINE.md cites: sustained docs/sec over a
  * multi-batch file stream of the real `documents` table, plus the
  * on-disk footprint of the pipeline's durable state (near-dup index,
  * span profile, streaming checkpoints) — the quantity that has to stay
  * bounded for the ingest loop to run indefinitely.
  *
  * Method: hash-split the sf documents table into `numBatches` single-file
  * parquet batches with arrival order pinned by mtime (the same staging
  * contract the spec uses), one synthetic ingest timestamp per batch so
  * the span lane's watermark advances batch-to-batch, then time ONE
  * end-to-end `curationPipeline` run. The wall covers both streaming
  * lanes (each drains all `numBatches` triggers) and shard finalization —
  * the figure is end-to-end curation throughput, not single-lane
  * microbenchmark throughput.
  */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val numBatches =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "10").toInt
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.EngineSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory(Paths.get("target"), "bench-stream")
      .toString
    val in = s"$root/in"
    new java.io.File(in).mkdirs()
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val nDocs = docs.count()
    val now = System.currentTimeMillis()
    (0 until numBatches).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(numBatches)) === i)
        .withColumn("ts",
          lit(f"2026-01-01 10:$i%02d:00").cast("timestamp"))
        .coalesce(1)
        .write.parquet(s"$root/stage$i")
      val f = new java.io.File(s"$root/stage$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(in, f"part-$i%03d.parquet")
      Files.copy(f.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(now - (numBatches - i).toLong * 60000L)
    }

    val t0 = System.nanoTime()
    val shardsDir = DocStream.curationPipeline(
      spark, in, s"$root/stream", "ts", capacityDocs = 2L * nDocs,
      maxDupFraction = 0.5, jaccardThreshold = 0.6, numShards = 8,
      maxFilesPerTrigger = 1)
    val wallSec = (System.nanoTime() - t0) / 1e9

    val fs = graft.hep.HadoopIo.fs(spark, root)
    def bytesOf(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
    }
    val stateBytes = Seq("index", "span-profile")
      .map(s => bytesOf(s"$root/stream/$s")).sum
    val checkpointBytes =
      bytesOf(s"$root/stream") - stateBytes - bytesOf(s"$root/stream/kept") -
        bytesOf(s"$root/stream/shards")
    val keptDocs = spark.read.parquet(s"$root/stream/kept").count()
    val shardRows = spark.read.parquet(shardsDir).count()
    require(shardRows == keptDocs,
      s"shards ($shardRows) != kept ($keptDocs) — pipeline lost rows")

    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"stream_curation_throughput","docs":$nDocs,""" +
      s""""batches":$numBatches,"wall_sec":${f3(wallSec)},""" +
      s""""docs_per_sec":${f3(nDocs / wallSec)},"kept_docs":$keptDocs,""" +
      s""""state_bytes":$stateBytes,"checkpoint_bytes":$checkpointBytes,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
