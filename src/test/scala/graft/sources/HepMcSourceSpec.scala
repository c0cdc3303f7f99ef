package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The HepMC3 ASCII source against a hand-computed fixture: the standard
  * pp → W(→qq̄)γ example event from the HepMC papers, plus a second event
  * exercising vertex elision (positive parent = mother particle id).
  */
class HepMcSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  lazy val dir: String =
    Files.createTempDirectory(Paths.get("target"), "hepmc").toString

  override def afterAll(): Unit = spark.stop()

  // Event 0: 8 particles, 4 explicit vertices (the HepMC manual example).
  // Event 1: beam → elided chain: p2's production vertex is elided (parent
  // = mother particle id 1); p3 decays at a real vertex -1 fed by p2.
  private val fixture = HepMcFixture.text

  private def writeFixture(name: String, content: String = fixture): String = {
    val p = Paths.get(dir, name)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("one row per particle; parent and end-vertex resolution is exact") {
    val df = spark.read.format("hepmc").load(writeFixture("evt.hepmc"))
    assert(df.count() === 11)

    val e0 = df.filter("event_id = 0").collect()
      .map(r => r.getAs[Int]("pcl_id") -> r).toMap
    assert(e0.size === 8)
    // beams: no production vertex; end at their scatter vertices
    assert(e0(1).getAs[Int]("prod_vtx") === 0)
    assert(e0(1).getAs[Int]("mother_id") === 0)
    assert(e0(1).getAs[Int]("end_vtx") === -1)
    assert(e0(2).getAs[Int]("end_vtx") === -2)
    // hard partons: produced at the beam vertices, merge at -3
    assert(e0(3).getAs[Int]("prod_vtx") === -1)
    assert(e0(3).getAs[Int]("end_vtx") === -3)
    assert(e0(4).getAs[Int]("prod_vtx") === -2)
    assert(e0(4).getAs[Int]("end_vtx") === -3)
    // final-state photon: no end vertex
    assert(e0(5).getAs[Int]("pdg") === 22)
    assert(e0(5).getAs[Int]("end_vtx") === 0)
    // W- decays at -4 into two final quarks
    assert(e0(6).getAs[Int]("pdg") === -24)
    assert(e0(6).getAs[Int]("end_vtx") === -4)
    assert(e0(7).getAs[Int]("prod_vtx") === -4)
    assert(e0(7).getAs[Int]("end_vtx") === 0)
    // momentum and metadata columns
    val p6 = e0(6)
    val pmu = p6.getAs[org.apache.spark.sql.Row]("pmu")
    assert(pmu.getDouble(0) === 1.517 && pmu.getDouble(3) === 85.925)
    assert(p6.getAs[Double]("mass") === 80.799)
    assert(p6.getAs[Int]("status") === 3)
    assert(p6.getAs[String]("momentum_unit") === "GEV")
    assert(p6.getAs[String]("length_unit") === "MM")
    assert(p6.getAs[Seq[Double]]("weights") === Seq(0.75))

    // event 1: vertex elision — parent recorded as mother particle id
    val e1 = df.filter("event_id = 1").collect()
      .map(r => r.getAs[Int]("pcl_id") -> r).toMap
    assert(e1(2).getAs[Int]("prod_vtx") === 0)
    assert(e1(2).getAs[Int]("mother_id") === 1)
    assert(e1(2).getAs[Int]("end_vtx") === -1)
    assert(e1(1).getAs[Int]("end_vtx") === 0, "elided vertex: no V record")
    assert(e1(2).getAs[String]("momentum_unit") === "MEV")
    assert(e1(2).getAs[Seq[Double]]("weights") === Seq(1.0, 2.0))
  }

  test("column pruning reaches the reader; multi-file input parallelizes") {
    Files.createDirectories(Paths.get(dir, "multi"))
    writeFixture("multi/a.hepmc")
    writeFixture("multi/b.hepmc")
    val df = spark.read.format("hepmc").load(s"$dir/multi")
    assert(df.rdd.getNumPartitions >= 2, "one partition per file")
    assert(df.count() === 22)
    // pruned scan: only pdg materialized, still correct
    val pdgs = df.select("pdg").collect().map(_.getInt(0))
    assert(pdgs.count(_ == 2212) === 4)
    val scan = df.select("pdg").queryExecution.executedPlan.toString
    assert(scan.contains("columns=pdg"), scan)
  }

  test("storeTables closes the DAG over elided vertices") {
    val df = spark.read.format("hepmc").load(writeFixture("c.hepmc"))
    val (particles, edges) = HepMcIngest.storeTables(df, "wgamma")

    val p1 = particles.filter("event_id = 1").orderBy("idx").collect()
    assert(p1.map(_.getAs[Int]("idx")).toSeq === Seq(0, 1, 2))
    // fin: p1 has an elided end vertex (child p2) → NOT final; p2 ends at
    // the real vertex -1; only p3 is final
    assert(p1.map(_.getAs[Boolean]("fin")).toSeq === Seq(false, false, true))
    assert(p1.map(_.getAs[String]("process")).distinct.toSeq === Seq("wgamma"))

    val e1 = edges.filter("event_id = 1").collect()
      .map(r => (r.getAs[Int]("src"), r.getAs[Int]("dst"))).toSet
    // synthetic vertex -2 (below the event's real min id -1) replaces the
    // elided one: p1 flows 0→-2, p2 flows -2→-1, p3 flows -1→0
    assert(e1 === Set((0, -2), (-2, -1), (-1, 0)))

    // event 0 has no elision: src/dst match the file's vertex ids
    val e0 = edges.filter("event_id = 0").collect()
      .map(r => (r.getAs[Int]("src"), r.getAs[Int]("dst"))).toSet
    assert(e0 === Set((0, -1), (0, -2), (-1, -3), (-2, -3),
      (-3, 0), (-3, -4), (-4, 0)))

    // schema parity with the store model
    val cols = particles.schema.fieldNames.toSeq
    assert(cols === Seq("process", "event_id", "idx", "pmu", "pdg",
      "status", "helicity", "color", "fin", "masks"))
  }

  test("tolerant parsing: attributes, run info, blank lines are skipped") {
    val noisy = fixture.replace("W 0.75\n",
      "W 0.75\nA -1 GenCrossSection 1.0 2.0\nN 1 \"nominal\"\nT tool\\|v1\\|x\n\n")
    val df = spark.read.format("hepmc").load(writeFixture("noisy.hepmc", noisy))
    assert(df.count() === 11)
  }

  test("tolerant parsing: truncated and garbage records never crash") {
    // 1-char P/V, no-space prefixes, W with non-numeric payload, truncated
    // P — all skipped like unknown kinds; events stay intact
    val noisy = fixture.replace("W 0.75\n",
      "W 0.75\nP\nV\nWeights are not a record\nW a b c\nP 9 0\nVertexes\n")
    val df = spark.read.format("hepmc").load(writeFixture("trunc.hepmc", noisy))
    assert(df.count() === 11)
    // the well-formed W before the garbage one is the kept payload
    assert(df.select("weights").where("event_id = 0")
      .head().getSeq[Double](0) === Seq(0.75))
  }

  test("directory listing recurses into nested shard dirs") {
    Files.createDirectories(Paths.get(dir, "nest/run-a/part-0"))
    Files.createDirectories(Paths.get(dir, "nest/run-b"))
    Files.createDirectories(Paths.get(dir, "nest/.hiddenrun"))
    writeFixture("nest/run-a/part-0/a.hepmc")
    writeFixture("nest/run-b/b.hepmc")
    writeFixture("nest/.hiddenrun/skipme.hepmc")
    val df = spark.read.format("hepmc").load(s"$dir/nest")
    assert(df.rdd.getNumPartitions === 2, "hidden dir skipped, nested found")
    assert(df.count() === 22)
  }
}
