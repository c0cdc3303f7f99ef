package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.hep.HepReader

/** Reads the converter-produced fixture store through [[HepReader]] —
  * end-to-end proof of the HDF5 interchange contract
  * (docs/hdf5-interchange.md).
  *
  * The fixture at `src/test/resources/interchange_store` is emitted by
  * `tools/make_interchange_fixture.py`, which drives the REAL converter
  * (`tools/hdf5_to_parquet.py convert()`) with an h5py.File-shaped
  * in-memory store — including the reference writer's
  * metadata-on-the-chunk-group quirk (`write/hdf.py:465`), structured
  * pmu/color/edge dtypes, and typed custom datasets. Only h5py itself is
  * absent offline; every converter line from layout walk to parquet
  * emission ran to produce what this spec reads.
  */
class HepInterchangeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val store = "src/test/resources/interchange_store"

  override def afterAll(): Unit = spark.stop()

  test("process metadata round-trips, including chunk-group attr rescue") {
    val r = new HepReader(spark, store)
    assert(r.evtsPerChunk === 2, "_meta.json evts_per_chunk")
    val p = r.process("higgs")
    assert(p.processString === "p p > h")
    assert(p.signalPdgs === Seq(25))
    assert(p.comEnergy === ((13000.0, "GeV")))
    assert(p.length === 3L, "finalized num_evts")
    // non-string process attrs JSON-encode into custom_meta
    assert(p.customMeta === Map("generator" -> "pythia", "run" -> "7"))
    // legacy decay surface from in_pcls/out_pcls
    assert((p.decay: @annotation.nowarn) ===
      Map("in_pcls" -> Seq(2212, 2212), "out_pcls" -> Seq(25)))
  }

  test("event point lookup: divmod addressing, columns, masks, count") {
    val r = new HepReader(spark, store)
    // event 2 = chunk 1, idx 0 (epc = 2)
    val e = r.process("higgs").event(2L)
    assert(e.count === 2L, "num_pcls attr, not a scan")
    assert(e.customMeta === Map("sample" -> "1.0", "tag" -> "evt2"))

    val pmu = e.pmu.orderBy("idx").collect()
    assert(pmu.length === 2)
    val first = pmu(0).getStruct(1)
    // seed=2: pmu row i = (seed+i, 0.5i, -i, seed+i+1)
    assert(first.getDouble(0) === 2.0 && first.getDouble(3) === 3.0)

    assert(e.pdg.orderBy("idx").collect().map(_.getInt(1)).toSeq === Seq(11, 12))
    assert(e.helicity.orderBy("idx").collect().map(_.getShort(1)).toSeq ===
      Seq(1.toShort, -1.toShort))
    assert(e.colorCol.orderBy("idx").collect()
      .map(_.getStruct(1).getInt(0)).toSeq === Seq(500, 501))

    // final lifted to fin; extra masks in the map
    assert(e.finalMask.orderBy("idx").collect().map(_.getBoolean(1)).toSeq ===
      Seq(false, true))
    assert(e.mask("sig").orderBy("idx").collect().map(_.getBoolean(1)).toSeq ===
      Seq(true, false))
    assert(e.finalParticles.count() === 1)

    val edges = e.edges.orderBy("src").collect()
      .map(r0 => (r0.getInt(0), r0.getInt(1), r0.getDouble(2)))
    assert(edges.toSeq === Seq((-1, -2, 2.0), (0, -1, 1.0)))
  }

  test("typed custom datasets: f8, i8, f8_2d payloads") {
    val r = new HepReader(spark, store)
    val e = r.process("higgs").event(2L)
    def one(name: String) = e.custom(name).collect().head

    val f8 = one("wts")
    assert(f8.getAs[String]("dtype") === "f8")
    assert(f8.getAs[Seq[Double]]("values") === Seq(1.0, 2.0))

    val i8 = one("hits")
    assert(i8.getAs[String]("dtype") === "i8")
    assert(i8.getAs[Seq[Long]]("values_long") === Seq(2L, 20L))

    val grid = one("grid")
    assert(grid.getAs[String]("dtype") === "f8_2d")
    assert(grid.getAs[Seq[Seq[Double]]]("values_2d") ===
      Seq(Seq(1.0, 2.0), Seq(3.0, 2.0)))
  }

  test("full scans agree with per-event sums; partition pruning applies") {
    val r = new HepReader(spark, store)
    val p = r.process("higgs")
    assert(p.particles.count() === 7, "2 + 3 + 2 particles")
    assert(p.edges.count() === 7)
    assert(p.events.count() === 3)
    // chunk pruning reaches the scan for a point lookup
    val plan = r.process("higgs").event(2L).particles
      .queryExecution.executedPlan.toString
    assert(plan.contains("chunk"), plan)
  }
}
