package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming corpus curation ≡ batch curation: the same operator code
  * (quality gate + fingerprint dedup) over the file stream produces the
  * same surviving set as the batch pipeline, including across duplicates
  * planted in a SECOND micro-batch file (cross-batch dedup state).
  */
class DocStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  /** documents staged into a directory, plus a second file that replays
    * some of the same texts (exact duplicates across micro-batches).
    */
  lazy val docsDir: String = {
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "stream-docs")
    Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      d.resolve("part-0.parquet"))
    val replay = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    replay.coalesce(1).write.parquet(d.resolve("extra").toString)
    val f = new java.io.File(d.resolve("extra").toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(f.toPath, d.resolve("part-1.parquet"))
    org.apache.commons.io.FileUtils.deleteQuietly(d.resolve("extra").toFile)
    d.toString
  }

  override def afterAll(): Unit = spark.stop()

  test("streaming curation equals the batch gate + dedup, across batches") {
    val q = DocStream.curate(DocStream.documents(spark, docsDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("curated").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curated")
      .select(xxhash64(col("text")).as("fp")).collect()
      .map(_.getLong(0)).toSet

    val all = spark.read.parquet(docsDir)
    val batch = graft.operators.TextAnalysis.classifierScore(
        graft.operators.TextAnalysis.qualityFilter(all))
      .filter(col("quality_pass") && col("label") === "keep")
      .select(xxhash64(col("text")).as("fp")).distinct()
      .collect().map(_.getLong(0)).toSet

    assert(streamed == batch,
      s"stream kept ${streamed.size} fingerprints, batch ${batch.size}")
    // the replayed duplicates must NOT survive twice: every fingerprint
    // is unique in the streamed output
    val n = spark.table("curated").count()
    assert(n == streamed.size, s"$n rows but ${streamed.size} fingerprints")
  }

  test("incremental near-dup ingest equals the per-batch batch kernel") {
    import spark.implicits._
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "neardup-ingest")
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten eleven"
    val aNear = "alpha beta gamma delta epsilon zeta eta theta iota mu"
    val c = "completely unrelated content about engines and oracles here"
    val f1 = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val f2 = Seq((10L, aNear), (11L, c), (12L, b)).toDF("doc_id", "text")
    f1.coalesce(1).write.parquet(d.resolve("in1").toString)
    f2.coalesce(1).write.parquet(d.resolve("in2").toString)
    val in = d.resolve("in").toString
    new java.io.File(in).mkdirs()
    def onlyParquet(dir: String): java.io.File =
      new java.io.File(dir).listFiles().find(_.getName.endsWith(".parquet")).get
    // two files staged in arrival order; maxFilesPerTrigger=1 forces one
    // micro-batch per file, so batch 2 must screen against batch 1's index
    Files.copy(onlyParquet(d.resolve("in1").toString).toPath,
      java.nio.file.Paths.get(in, "part-0.parquet"))
    Files.copy(onlyParquet(d.resolve("in2").toString).toPath,
      java.nio.file.Paths.get(in, "part-1.parquet"))
    // the file source orders batches by modification time — pin the
    // arrival order explicitly so the test is filesystem-independent
    val now = System.currentTimeMillis()
    new java.io.File(in, "part-0.parquet").setLastModified(now - 60000)
    new java.io.File(in, "part-1.parquet").setLastModified(now)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = DocStream.nearDupIngest(stream,
      d.resolve("index").toString, d.resolve("out").toString, 0.6)
    q.awaitTermination()
    val streamed = spark.read.parquet(d.resolve("out").toString)
      .collect().map(_.getLong(0)).toSet
    // batch composition of the same two arrivals
    val kept1 = graft.operators.Dedup.deduplicateAgainst(f1, f1.limit(0), 0.6)
    val kept2 = graft.operators.Dedup.deduplicateAgainst(f2, kept1, 0.6)
    val batch = (kept1.collect() ++ kept2.collect()).map(_.getLong(0)).toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    // the exact replay of b never survives; the unique doc always does
    assert(!streamed.contains(12L) && streamed.contains(11L))
    org.apache.commons.io.FileUtils.deleteQuietly(d.toFile)
  }

  private def tokens(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("screened incremental ingest equals the unscreened loop, screen merged per batch") {
    import spark.implicits._
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "screened-ingest")
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val aNear = "alpha beta gamma delta epsilon zeta eta theta iota mu"
    val b = "one two three four five six seven eight nine ten eleven"
    val c = "completely unrelated content about engines and oracles here"
    // batch 1 seeds; batch 2 mixes near-dup-of-1 + novel; batch 3 replays
    // batch-2 content exactly (exercises the MERGED screen's text leg —
    // doc 20's fingerprint entered the screen incrementally, not via a
    // full rebuild) plus one more novel doc
    val batches = Seq(
      Seq((1L, a), (2L, b)),
      Seq((10L, aNear), (11L, c)),
      Seq((20L, c), (21L, "entirely fresh closing content nine words long exactly")))
    batches.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text").coalesce(1)
        .write.parquet(d.resolve(s"stage$i").toString)
    }
    def stagedInput(sub: String): String = {
      val in = d.resolve(sub).toString
      new java.io.File(in).mkdirs()
      val now = System.currentTimeMillis()
      batches.indices.foreach { i =>
        val f = new java.io.File(d.resolve(s"stage$i").toString).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(in, s"part-$i.parquet")
        Files.copy(f.toPath, dst.toPath)
        dst.setLastModified(now - (batches.size - i) * 60000)
      }
      in
    }
    def run(sub: String)(
        start: org.apache.spark.sql.DataFrame => org.apache.spark.sql.streaming.StreamingQuery): Set[Long] = {
      val in = stagedInput(sub)
      val schema = spark.read.parquet(in).schema
      val q = start(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in))
      q.awaitTermination()
      spark.read.parquet(d.resolve(s"$sub-out").toString)
        .collect().map(_.getLong(0)).toSet
    }
    val plain = run("plain")(s => DocStream.nearDupIngest(
      s, d.resolve("plain-index").toString, d.resolve("plain-out").toString, 0.6))
    val screened = run("scr")(s => DocStream.nearDupIngestScreened(
      s, d.resolve("scr-index").toString, d.resolve("scr-out").toString,
      capacityDocs = 64L, jaccardThreshold = 0.6))
    assert(screened === plain, s"screened $screened != unscreened $plain")
    // the scenario itself: near-dup and exact replays die, novelty lives
    assert(screened === Set(1L, 2L, 11L, 21L))
    org.apache.commons.io.FileUtils.deleteQuietly(d.toFile)
  }

  test("screened ingest restart: screen rebuilds from the index, parity holds") {
    import spark.implicits._
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "screened-restart")
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten eleven"
    def stage(sub: String, rows: Seq[(Long, String)]): String = {
      val in = d.resolve(sub).toString
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(in)
      in
    }
    def runOnce(in: String): Unit = {
      val schema = spark.read.parquet(in).schema
      val q = DocStream.nearDupIngestScreened(
        spark.readStream.schema(schema).parquet(in),
        d.resolve("index").toString, d.resolve("out").toString,
        capacityDocs = 64L, jaccardThreshold = 0.6)
      q.awaitTermination()
    }
    // run 1 seeds the index, then the query STOPS (driver restart):
    // run 2 is a fresh query whose carried screen starts null and must
    // rebuild from the on-disk index before screening its batch
    runOnce(stage("in1", Seq((1L, a), (2L, b))))
    runOnce(stage("in2", Seq(
      (10L, a), // exact replay of run-1 content: the rebuilt screen's text leg
      (11L, "wholly novel content that the rebuilt screen waves through"))))
    val kept = spark.read.parquet(d.resolve("out").toString)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 11L), s"got $kept")
    org.apache.commons.io.FileUtils.deleteQuietly(d.toFile)
  }

  test("index compaction shrinks files, preserves content, keeps screening") {
    import spark.implicits._
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "index-compact")
    val idx = d.resolve("index").toString
    // simulate a long-lived ingest loop: many tiny append batches
    (0 until 12).foreach { i =>
      Seq((i.toLong, s"accepted document number $i with its own words here"))
        .toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(idx)
    }
    val contentBefore = spark.read.parquet(idx)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val (before, after) = DocStream.compactIndex(spark, idx)
    assert(before >= 12 && after < before && after >= 1,
      s"expected compaction, got $before -> $after")
    val contentAfter = spark.read.parquet(idx)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(contentAfter === contentBefore)
    // the compacted index still screens: an exact replay dies, novelty lives
    val index = spark.read.parquet(idx)
    val screen = graft.operators.Dedup.buildIndexScreen(index, 64L)
    val batch = Seq(
      (100L, "accepted document number 3 with its own words here"),
      (101L, "wholly new closing document content for the compaction test"))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .deduplicateAgainst(batch, index, screen, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(101L))
    // absent directory is a no-op
    assert(DocStream.compactIndex(spark, d.resolve("missing").toString) === ((0, 0)))
    org.apache.commons.io.FileUtils.deleteQuietly(d.toFile)
  }

  test("bloom merge ORs membership; mismatched sizes fail loudly") {
    import spark.implicits._
    val s1 = graft.operators.Dedup.buildIndexScreen(
      Seq((1L, "first corpus text body")).toDF("doc_id", "text"), 64L)
    val s2 = graft.operators.Dedup.buildIndexScreen(
      Seq((2L, "second corpus text body")).toDF("doc_id", "text"), 64L)
    val m = graft.operators.Dedup.mergeScreens(s1, s2)
    val bf = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(m.textBloom))
    def h(t: String): Long = Seq(t).toDF("text")
      .select(xxhash64(col("text"))).head.getLong(0)
    assert(bf.mightContainLong(h("first corpus text body")))
    assert(bf.mightContainLong(h("second corpus text body")))
    val other = graft.operators.Dedup.buildIndexScreen(
      Seq((3L, "third text")).toDF("doc_id", "text"), 4096L)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.mergeScreens(s1, other)
    }
    assert(e.getMessage.contains("identically-sized"))
  }

  test("streaming span dedup: one trigger equals the batch d13 profile") {
    import spark.implicits._
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "span-stream")
    val boiler = tokens("b", 30) // ≥ SpanWords+WinnowS-1: guaranteed shared fp
    val rows = Seq(
      (1L, boiler),
      (2L, tokens("p", 5) + " " + boiler),
      (3L, tokens("u", 30)),
      (4L, tokens("v", 30)))
    rows.toDF("doc_id", "text")
      .withColumn("ts", lit("2026-01-01 00:00:00").cast("timestamp"))
      .coalesce(1).write.parquet(d.resolve("in").toString)
    val schema = spark.read.parquet(d.resolve("in").toString).schema
    val stream = spark.readStream.schema(schema)
      .parquet(d.resolve("in").toString)
    val q = DocStream.spanDedupIngest(stream, "ts",
      d.resolve("profile").toString, maxDupFraction = 0.5)
    q.awaitTermination()
    val streamed = spark.read.parquet(d.resolve("profile").toString)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_fp"), r.getAs[Long]("n_dup_fp"),
          r.getAs[Boolean]("keep")))).toMap
    val batchProfile = graft.operators.Paragraphs
      .spanProfile(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_fp"), r.getAs[Long]("n_dup_fp"),
          r.getAs[Double]("dup_fraction") <= 0.5))).toMap
    // within one trigger the streamed decisions ARE the batch profile:
    // n_occ >= 2 flags every occurrence, first included
    assert(streamed === batchProfile)
    assert(streamed(1L)._2 > 0 && streamed(2L)._2 > 0,
      "the planted boilerplate run must flag in both carriers")
    assert(streamed(3L)._2 === 0L && streamed(4L)._2 === 0L)
    org.apache.commons.io.FileUtils.deleteQuietly(d.toFile)
  }

  test("span dedup across triggers: later copies flag, the first does not") {
    import spark.implicits._
    val boiler = tokens("c", 30)
    def occ(id: Long, sec: Int, text: String) = (id,
      java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$sec%02d"), text)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)](
        spark)
    val q = DocStream.spanFlags(
        input.toDF().toDF("doc_id", "ts", "text"), "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("spanflags").start()
    input.addData(occ(1L, 0, boiler))
    q.processAllAvailable()
    input.addData(occ(2L, 30, boiler), occ(3L, 30, tokens("w", 30)))
    q.processAllAvailable()
    q.stop()
    val byDoc = spark.table("spanflags")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), count(when(col("is_dup"), 1)).as("nd"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1's spans were emitted (unflagged) before any duplicate existed —
    // the inherent first-wins asymmetry; doc 2 repeats every span of doc 1
    // in a LATER trigger, so all of them flag via carried state
    assert(byDoc(1L)._2 === 0L)
    assert(byDoc(2L)._1 === byDoc(2L)._2 && byDoc(2L)._2 > 0L)
    assert(byDoc(3L)._2 === 0L)
  }

  test("span dedup eviction: a span recurring past the TTL is forgotten") {
    import spark.implicits._
    val boiler = tokens("e", 30)
    def at(id: Long, t: String, text: String) =
      (id, java.sql.Timestamp.valueOf(t), text)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)](
        spark)
    val q = DocStream.spanFlags(
        input.toDF().toDF("doc_id", "ts", "text"), "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("spanevict").start()
    // t0: the span lands; state timeout = t0 + 2 h (StateTtlMs)
    input.addData(at(1L, "2026-01-01 00:00:00", boiler))
    q.processAllAvailable()
    // +10 h advances the watermark to +8 h (2 h horizon) — past the timeout
    input.addData(at(2L, "2026-01-01 10:00:00", tokens("x", 30)))
    q.processAllAvailable()
    // next trigger fires the timeout for doc 1's fingerprints (keys with
    // no data in the trigger), removing their state
    input.addData(at(3L, "2026-01-01 10:01:00", tokens("y", 30)))
    q.processAllAvailable()
    // the SAME span returns after eviction: state is gone, so it does NOT
    // flag — the documented emission sacrificed for bounded state
    input.addData(at(4L, "2026-01-01 10:02:00", boiler))
    q.processAllAvailable()
    q.stop()
    val dupDocs = spark.table("spanevict")
      .filter(col("is_dup")).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(dupDocs.isEmpty,
      s"span recurring past TTL must be forgotten, but flagged: $dupDocs")
  }

  test("watermark-bounded dedup collapses duplicates within the horizon") {
    import spark.implicits._
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "stream-wm")
    // three copies of one text inside a 1-minute span, one unique text
    Seq(
      (1L, "replayed body", "2026-01-01 00:00:00"),
      (2L, "replayed body", "2026-01-01 00:00:10"),
      (3L, "replayed body", "2026-01-01 00:00:40"),
      (4L, "unique body", "2026-01-01 00:00:20"))
      .toDF("doc_id", "text", "t_raw")
      .withColumn("ingest_t", col("t_raw").cast("timestamp")).drop("t_raw")
      .coalesce(1).write.parquet(d.resolve("in").toString)
    val schema = spark.read.parquet(d.resolve("in").toString).schema
    val stream = spark.readStream.schema(schema)
      .parquet(d.resolve("in").toString)
    val q = DocStream.dedupeWithin(stream, "ingest_t", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_dedup").start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("wm_dedup").select("text").collect()
      .map(_.getString(0)).sorted
    assert(kept.toSeq == Seq("replayed body", "unique body"),
      s"expected one survivor per text within the horizon, got ${kept.toSeq}")
    org.apache.commons.io.FileUtils.deleteQuietly(d.toFile)
  }
}
