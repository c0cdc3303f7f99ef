package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Executes docs/quickstart.md's snippets as written (modulo val names),
  * so the quickstart can never drift from the API: if a snippet stops
  * compiling or behaving, this suite fails and the doc gets fixed with
  * the code. Section numbers mirror the doc.
  */
class QuickstartSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = EngineSession.local("4") // §0
  lazy val tmp: String =
    Files.createTempDirectory(Paths.get("target"), "quickstart").toString
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("§1 + §2: write a hep store, read it back via the EP1 trace") {
    import graft.hep._, graft.hep.Schemas._

    val w = new HepWriter(spark, s"$tmp/store", evtsPerChunk = 1000)
    val procW = w.newProcess("higgs")
    procW.setProcessString("p p > h > b b~")
    procW.setSignalPdgs(Seq(25))
    procW.setComEnergy(13000.0, "GeV")

    val ev = procW.newEvent()
    ev.setPmu(Array(Pmu(0.1, 0.2, 30.0, 30.1), Pmu(-0.1, -0.2, 10.0, 10.2)))
    ev.setPdg(Array(5, -5))
    ev.setStatus(Array[Short](1, 1))
    ev.setMask("final", Array(true, true))
    procW.commitEvent(ev)

    w.close()

    val r = new HepReader(spark, s"$tmp/store")
    val proc = r.process("higgs")
    assert(proc.processString == "p p > h > b b~")
    assert(proc.signalPdgs == Seq(25))
    assert(proc.comEnergy == ((13000.0, "GeV")))
    assert(proc.length == 1L)
    val event = proc.event(0L)
    assert(event.pmu.count() == 2L)
    assert(event.finalParticles.count() == 2L)
  }

  test("§3: per-event logic as vectorized grouped aggregates (EP2)") {
    val r = new graft.hep.HepReader(spark, s"$tmp/store")
    val proc = r.process("higgs")
    val perEvent = proc.particles
      .where(col("fin"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_final"),
        sum(col("pmu.e")).as("e_total"))
    val row = perEvent.collect().head
    assert(row.getAs[Long]("n_final") == 2L)
    assert(math.abs(row.getAs[Double]("e_total") - 40.3) < 1e-9)
  }

  test("§4: hepmc read + write round-trip") {
    val fixture = s"$tmp/in.hepmc"
    Files.write(Paths.get(fixture),
      graft.sources.HepMcFixture.text.getBytes("UTF-8"))
    val events = spark.read.format("hepmc").load(fixture)
    graft.sources.HepMcWriter.write(events, s"$tmp/out")
    val back = spark.read.format("hepmc").load(s"$tmp/out")
    assert(back.count() == events.count())
  }

  test("§5: curation operators compose over DataFrames") {
    import graft.operators._

    val docs = graft.Tables.documents(spark, sfDir)

    val gated = TextAnalysis.classifierScore(TextAnalysis.qualityFilter(docs))
      .filter(col("quality_pass") && col("label") === "keep")

    val clusters = Dedup.duplicateClusters(
      gated.select("doc_id", "text"), jaccardThreshold = 0.6).persist()

    val keep = Dedup.keepCanonical(
      gated.select(col("doc_id"), length(col("text")).as("n_chars")),
      clusters, col("n_chars"))
    assert(keep.columns.contains("keep"))
    // exactly one canonical member per cluster
    val perCluster = keep.groupBy("cluster")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"))
    assert(perCluster.filter(col("n_keep") =!= 1).count() == 0)

    val heldOut = docs.filter(col("doc_id") < 50)
    val clean = Dedup.decontaminate(gated, benchmark = heldOut)
    assert(clean.count() <= gated.count())

    val splits = Sampling.split(clean, col("doc_id"))
    assert(splits.select("split").distinct().count() >= 2)
    Sampling.writeTrainingShards(clean, col("doc_id"), 4, s"$tmp/shards")
    assert(spark.read.parquet(s"$tmp/shards").count() == clean.count())

    val chunks = TextAnalysis.chunk(docs, window = 64, stride = 48)
    assert(chunks.count() >= docs.count(), "at least one chunk per doc")
    clusters.unpersist()
  }

  test("§5b: trained IVF index / search / recall audit") {
    import graft.operators._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
    val model = Similarity.ivfIndex(emb, nlist = 8)
    val hits = Similarity.ivfSearch(model, queries, k = 10, nprobe = 4)
    assert(hits.select("qid").distinct().count() == 5)
    val audit = Similarity.ivfRecall(model, emb, queries, k = 10, nprobe = 4)
    assert(audit.count() == 5)
  }

  test("§7: the registered query catalog runs by name") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    assert(df.count() > 0)
  }
}
