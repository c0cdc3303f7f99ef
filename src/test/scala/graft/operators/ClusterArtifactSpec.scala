package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The materialized cluster artifact ([[Dedup.writeClusters]] /
  * [[Dedup.loadClusters]]) — the production seam where clustering runs
  * once per corpus snapshot and consumers join the artifact:
  *
  *  - the artifact round-trips the d07 cluster table exactly;
  *  - p18-from-artifact is row-identical to the inline p18 query;
  *  - d14-from-artifact is row-identical to the inline d14 query;
  *  - the consumer plans are JOIN-ONLY: no Generate (shingle explode)
  *    and no iterative-CC subtree survives — the expensive work stays
  *    in the artifact build.
  */
class ClusterArtifactSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private lazy val artifactPath: String = {
    val dir = Files.createTempDirectory(Paths.get("target"), "clusters").toString
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    Dedup.writeClusters(Dedup.jaccardClusters(docs, 0.2, 50), dir)
    dir
  }

  test("artifact round-trips the d07 cluster table exactly") {
    val direct = Dedup.jaccardClusters(
      graft.Tables.documents(spark, sf).select("doc_id", "text"), 0.2, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val loaded = Dedup.loadClusters(spark, artifactPath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loaded.nonEmpty)
    assert(loaded === direct)
  }

  test("p18 from the artifact is row-identical to the inline query") {
    val inline = graft.QueryCatalog.byName("p18_leakage_safe_split")
      .run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val fromArtifact =
      Dedup.splitByCluster(docs, Dedup.loadClusters(spark, artifactPath))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(fromArtifact === inline)
  }

  test("d14 from the artifact is row-identical to the inline query") {
    val inline = graft.QueryCatalog.byName("d14_canonical_keep")
      .run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
      .toSet
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("n_chars"))
    val fromArtifact = Dedup.keepCanonical(
      docs, Dedup.loadClusters(spark, artifactPath), col("n_chars"))
      .select("doc_id", "cluster", "n_chars", "keep")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
      .toSet
    assert(fromArtifact === inline)
  }

  test("artifact consumers are join-only: no shingle explode, no CC " +
      "iteration in the executed plan") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val plan = Dedup.splitByCluster(docs, Dedup.loadClusters(spark, artifactPath))
      .queryExecution.executedPlan.toString
    // (no Generate control against inline p18: its adaptive CC runs the
    // pair scaffold in SEPARATE jobs and below the edge threshold the
    // cluster table re-enters as a LocalTableScan, so the inline FINAL
    // plan is also Generate-free — the cost lives in the side jobs the
    // artifact path never launches)
    assert(!plan.contains("Generate"), s"shingle explode in consumer plan:\n$plan")
    assert(plan.contains("Scan parquet"), "consumer should scan the artifact")
  }

  test("schema guards fail loudly on a non-artifact input") {
    val bad = Files.createTempDirectory(Paths.get("target"), "notclusters").toString
    graft.Tables.documents(spark, sf).select("doc_id", "lang")
      .write.mode("overwrite").parquet(bad)
    val ex = intercept[IllegalArgumentException] {
      Dedup.loadClusters(spark, bad)
    }
    assert(ex.getMessage.contains("cluster artifact"), ex.getMessage)
    val ex2 = intercept[IllegalArgumentException] {
      Dedup.writeClusters(
        graft.Tables.documents(spark, sf).select("doc_id", "lang"), bad)
    }
    assert(ex2.getMessage.contains("doc_id, cluster"), ex2.getMessage)
  }
}
