package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The materialized BAND-KEY INDEX ([[Dedup.writeBandIndex]] /
  * [[Dedup.loadBandIndex]]) — the seam that makes incremental dedup
  * delta-proportional (r11 review item 1):
  *
  *  - screening a delta from the artifact is keep/drop-identical to the
  *    inline [[Dedup.deduplicateAgainst]] (which unions + re-fingerprints
  *    the whole corpus per batch) — on real sf data AND on planted
  *    exact/near/in-batch duplicate edges;
  *  - both confirm-leg read paths (IN-pushdown point read vs broadcast
  *    semi-join scan) agree;
  *  - [[Dedup.appendBandIndex]] maintenance composes: screen → append
  *    survivors → screen the next batch ≡ rebuilding the artifact from
  *    the grown corpus;
  *  - a banding-config mismatch fails loudly at load;
  *  - the delta screen's plan never re-shingles corpus rows: the only
  *    md5/explode work sits above the (batch-sized) delta side.
  */
class BandIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory(Paths.get("target"), "bandidx").toString

  private def corpus: DataFrame =
    graft.Tables.documents(spark, sf).select("doc_id", "text")

  // i03's delta construction: fresh rows, appended-suffix near-dups, and
  // (via % 26) exact-collision candidates against the corpus
  private def delta: DataFrame =
    corpus.filter(col("doc_id") % 13 === 0)
      .select((-col("doc_id") - 1).as("doc_id"),
        when(col("doc_id") % 26 === 0,
          concat(lit("entirely fresh content row "),
            col("doc_id").cast("string")))
          .otherwise(concat(col("text"), lit(" appended"))).as("text"))

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private lazy val artifact: String = {
    val dir = tmp()
    Dedup.writeBandIndex(corpus, dir)
    dir
  }

  test("artifact screen ≡ inline screen on the sf corpus delta") {
    val inline = ids(Dedup.deduplicateAgainst(delta, corpus, 0.6))
    val fromArtifact = ids(
      Dedup.deduplicateAgainst(delta, Dedup.loadBandIndex(spark, artifact), 0.6))
    assert(fromArtifact.nonEmpty)
    assert(fromArtifact === inline)
  }

  test("both confirm-leg read paths agree (IN point read vs semi-join scan)") {
    val idx = Dedup.loadBandIndex(spark, artifact)
    val inList = ids(Dedup.deduplicateAgainst(delta, idx, 0.6, inListMax = 1000000))
    val semiJoin = ids(Dedup.deduplicateAgainst(delta, idx, 0.6, inListMax = 0))
    assert(inList === semiJoin)
  }

  test("planted edges: exact copy drops, near-dup drops, in-batch keep-min, " +
    "fresh text survives") {
    import spark.implicits._
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val dir = tmp()
    Dedup.writeBandIndex(base, dir)
    val idx = Dedup.loadBandIndex(spark, dir)
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // exact copy
      (11L, "one two three four five six seven eight nine ten extra"), // near-dup of 2
      (12L, "completely novel content nothing shared with anything here"),
      (13L, "completely novel content nothing shared with anything here"), // in-batch exact
      (14L, "totally different fresh words again for the second survivor")
    ).toDF("doc_id", "text")
    val inline = ids(Dedup.deduplicateAgainst(batch, base, 0.6))
    val got = ids(Dedup.deduplicateAgainst(batch, idx, 0.6))
    assert(got === inline)
    assert(got === Set(12L, 14L))
  }

  test("appendBandIndex maintenance ≡ full rebuild on the grown corpus") {
    import spark.implicits._
    val dir = tmp()
    Dedup.writeBandIndex(corpus, dir)
    // batch 1 screens, survivors append to corpus AND artifact
    val b1 = delta
    val s1 = Dedup.deduplicateAgainst(
      b1, Dedup.loadBandIndex(spark, dir), 0.6).localCheckpoint()
    Dedup.appendBandIndex(s1, dir, "b1")
    val grown = corpus.unionByName(s1)
    // batch 2: near-dups of batch-1 survivors + fresh rows, ids disjoint
    val b2 = s1.limit(5)
      .select((col("doc_id") - 1000000L).as("doc_id"),
        concat(col("text"), lit(" trailing")).as("text"))
      .unionByName(Seq(
        (-2000001L, "second day document with its own unseen vocabulary"))
        .toDF("doc_id", "text"))
    val viaMaintained = ids(Dedup.deduplicateAgainst(
      b2, Dedup.loadBandIndex(spark, dir), 0.6))
    val viaRebuild = {
      val dir2 = tmp()
      Dedup.writeBandIndex(grown, dir2)
      ids(Dedup.deduplicateAgainst(b2, Dedup.loadBandIndex(spark, dir2), 0.6))
    }
    val viaInline = ids(Dedup.deduplicateAgainst(b2, grown, 0.6))
    assert(viaMaintained === viaRebuild)
    assert(viaMaintained === viaInline)
  }

  test("batch commit protocol: a torn (uncommitted) batch is invisible, " +
    "a retried appendBandIndex repairs it, a committed one is final") {
    import spark.implicits._
    val dir = tmp()
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    Dedup.writeBandIndex(base, dir)
    val survivors = Seq(
      (10L, "entirely novel accepted document with distinct vocabulary"))
      .toDF("doc_id", "text")

    // simulate the crash: texts written, bands/tris missing, NO marker —
    // exactly what a JVM kill between the relation writes leaves behind
    survivors.select(xxhash64(col("text")).as("text_hash"), col("text"))
      .write.mode("overwrite").parquet(s"$dir/batches/b-crash/texts")
    assert(Dedup.bandIndexBatches(spark, dir).isEmpty,
      "uncommitted batch must be invisible")
    // the loader sees the torn batch's doc in NEITHER leg (never torn):
    // an exact copy of it still survives the screen
    val probe = Seq(
      (20L, "entirely novel accepted document with distinct vocabulary"))
      .toDF("doc_id", "text")
    assert(ids(Dedup.deduplicateAgainst(
      probe, Dedup.loadBandIndex(spark, dir), 0.6)) === Set(20L))

    // the retry deletes the debris and lands the batch atomically
    Dedup.appendBandIndex(survivors, dir, "b-crash")
    assert(Dedup.bandIndexBatches(spark, dir) === Seq("b-crash"))
    assert(ids(Dedup.deduplicateAgainst(
      probe, Dedup.loadBandIndex(spark, dir), 0.6)).isEmpty,
      "committed batch screens its exact copy")

    // committed = final: a re-delivery with DIFFERENT content is a no-op
    Dedup.appendBandIndex(
      Seq((30L, "imposter content that must not enter the index"))
        .toDF("doc_id", "text"), dir, "b-crash")
    assert(ids(Dedup.deduplicateAgainst(
      Seq((31L, "imposter content that must not enter the index"))
        .toDF("doc_id", "text"),
      Dedup.loadBandIndex(spark, dir), 0.6)) === Set(31L))

    // sweep removes only uncommitted debris
    Seq((40L, "stranded")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/batches/b-dead/texts")
    assert(Dedup.sweepBandIndex(spark, dir) === Seq("b-dead"))
    assert(Dedup.bandIndexBatches(spark, dir) === Seq("b-crash"))
  }

  test("in-place base rebuild sweeps stale committed batches: the fresh " +
    "base alone defines the index") {
    import spark.implicits._
    val dir = tmp()
    val v1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    Dedup.writeBandIndex(v1, dir)
    Dedup.appendBandIndex(
      Seq((10L, "batch document accepted in the artifact's previous life"))
        .toDF("doc_id", "text"), dir, "b-old")
    val batchCopy = Seq(
      (20L, "batch document accepted in the artifact's previous life"))
      .toDF("doc_id", "text")
    assert(ids(Dedup.deduplicateAgainst(
      batchCopy, Dedup.loadBandIndex(spark, dir), 0.6)).isEmpty)

    // the corpus moved on: docs 1 and 10 left, only doc 2 remains. An
    // in-place rebuild must cover EXACTLY the new corpus — stale batches
    // unioned in would keep screening by departed documents forever
    Dedup.writeBandIndex(v1.filter(col("doc_id") === 2L), dir)
    assert(Dedup.bandIndexBatches(spark, dir).isEmpty,
      "stale committed batches must sweep on an in-place rebuild")
    val idx = Dedup.loadBandIndex(spark, dir)
    assert(ids(Dedup.deduplicateAgainst(batchCopy, idx, 0.6)) === Set(20L),
      "a copy of the DEPARTED batch doc must survive the rebuilt index")
    assert(ids(Dedup.deduplicateAgainst(
      Seq((21L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"), idx, 0.6)) === Set(21L))
    assert(ids(Dedup.deduplicateAgainst(
      Seq((22L, "one two three four five six seven eight nine ten"))
        .toDF("doc_id", "text"), idx, 0.6)).isEmpty)
  }

  test("banding-config mismatch fails loudly at load") {
    val dir = tmp()
    Dedup.writeBandIndex(corpus.limit(10), dir)
    // overwrite the meta relation with a foreign banding config
    spark.range(1)
      .select(lit(16).as("sigs"), lit(4).as("bands"))
      .write.mode("overwrite").parquet(s"$dir/meta")
    val e = intercept[IllegalArgumentException] {
      Dedup.loadBandIndex(spark, dir)
    }
    assert(e.getMessage.contains("rebuild the artifact"))
  }

  test("delta screen plan re-shingles only the batch, never the corpus") {
    val idx = Dedup.loadBandIndex(spark, artifact)
    // pin the delta first: the production delta arrives as its own batch,
    // not as a projection of the corpus files
    val kept = Dedup.deduplicateAgainst(delta.localCheckpoint(), idx, 0.6)
    val plan = kept.queryExecution.executedPlan.toString
    // the corpus enters only through the three artifact scans
    assert(plan.contains("texts") || plan.contains("tris"),
      "expected artifact scans in the plan")
    // no md5 over a corpus-rooted subtree: every Generate/md5 in the final
    // screen plan hangs off the (localCheckpointed, batch-sized) delta.
    // The artifact relations surface as plain parquet scans; if corpus
    // re-fingerprinting leaked in, a scan of documents.parquet would too.
    assert(!plan.contains("documents.parquet"),
      "the delta screen must not rescan the raw corpus")
  }

  test("a file:-scheme-QUALIFIED artifact root round-trips: build, " +
    "append, commit-marker visibility, screen ≡ bare-path artifact") {
    // the Hadoop-FS honesty check (r13 verdict item 7) applied to the
    // band-index protocol: every control path (meta delete, batch dirs,
    // _COMMITTED marker create/probe) must survive explicit scheme
    // qualification, not just bare local paths.
    val qdir = "file:" + new java.io.File(tmp()).getAbsolutePath
    Dedup.writeBandIndex(corpus, qdir)
    val probe = delta
    val bare = ids(Dedup.deduplicateAgainst(
      probe, Dedup.loadBandIndex(spark, artifact), 0.6))
    assert(ids(Dedup.deduplicateAgainst(
      probe, Dedup.loadBandIndex(spark, qdir), 0.6)) === bare)
    // maintenance on the qualified root: append a batch, marker commits,
    // an exact copy of the appended doc now screens out
    val extra = spark.range(1).select(lit(900001L).as("doc_id"),
      lit("a qualified-root appended document with distinct words").as("text"))
    Dedup.appendBandIndex(extra, qdir, "q1")
    assert(Dedup.bandIndexBatches(spark, qdir) === Seq("q1"))
    val copy = spark.range(1).select(lit(-900002L).as("doc_id"),
      lit("a qualified-root appended document with distinct words").as("text"))
    assert(ids(Dedup.deduplicateAgainst(
      copy, Dedup.loadBandIndex(spark, qdir), 0.6)) === Set.empty)
  }
}
