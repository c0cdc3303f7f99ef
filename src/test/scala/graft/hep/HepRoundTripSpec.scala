package graft.hep

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import Schemas._

class HepRoundTripSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  lazy val dir: String =
    Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "hepstore").toString

  override def afterAll(): Unit = spark.stop()

  private def mkEvent(
      b: HepWriter#EventBuilder, n: Int, seedBase: Long): Unit = {
    val rnd = new scala.util.Random(seedBase)
    b.setPmu(Array.tabulate(n)(i =>
        Pmu(rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble(), i + 1.0)))
      .setPdg(Array.tabulate(n)(i => 11 + i))
      .setStatus(Array.tabulate(n)(i => (i % 3).toShort))
      .setHelicity(Array.fill(n)(1.toShort))
      .setColor(Array.tabulate(n)(i => ColorPair(i, -i)))
      .setMask("final", Array.tabulate(n)(_ % 2 == 0))
      .setMask("signal", Array.tabulate(n)(_ < 2))
    b.setEdges(Array.tabulate(n)(i => (i, i + 1)))
    b.setEdgeWeights(Array.tabulate(n)(_ * 0.5))
    b.setCustom("weights2", Array.tabulate(n)(_ * 2.0))
    b.setCustomMeta("note", s"event-${b.eventId}")
  }

  test("write then read round-trips particles, masks, edges, metadata") {
    val w = new HepWriter(spark, dir, evtsPerChunk = 10)
    val p = w.newProcess("higgs")
      .setProcessString("p p > h z")
      .setSignalPdgs(Seq(25, 23))
      .setComEnergy(13000.0, "GeV")
    p.setCustomMeta("generator", "pythia")
    for (e <- 0 until 25) { // crosses chunk boundaries (cpk=10 → 3 chunks)
      val b = p.newEvent()
      mkEvent(b, n = 4 + (e % 3), seedBase = e.toLong)
      p.commitEvent(b)
    }
    w.close()

    val r = new HepReader(spark, dir)
    assert(r.evtsPerChunk == 10)
    val proc = r.process("higgs")
    assert(proc.length == 25)
    assert(proc.processString == "p p > h z")
    assert(proc.signalPdgs == Seq(25, 23))
    assert(proc.comEnergy == ((13000.0, "GeV")))
    assert(proc.customMeta("generator") == "pythia")

    // point lookup vs scan agreement (S4 vs S5)
    val ev7 = proc.event(7)
    assert(ev7.count == 4 + (7 % 3))
    val pdgRows = ev7.pdg.orderBy("idx").collect().map(_.getInt(1)).toSeq
    assert(pdgRows == (0 until ev7.count.toInt).map(11 + _))

    // final mask semantics: pmu[final]
    val fin = ev7.finalParticles.orderBy("idx").collect()
    assert(fin.map(_.getAs[Int]("idx")).toSeq == (0 until ev7.count.toInt).filter(_ % 2 == 0))

    // extra mask via map column
    val sig = ev7.mask("signal").orderBy("idx").collect().map(_.getBoolean(1)).toSeq
    assert(sig == (0 until ev7.count.toInt).map(_ < 2))

    // edges + weights
    val ed = ev7.edges.orderBy("src").collect()
    assert(ed.length == ev7.count.toInt)
    assert(ed.head.getAs[Double]("weight") == 0.0)

    // custom dataset + event custom metadata
    val cu = ev7.custom("weights2").collect()
    assert(cu.nonEmpty)
    assert(cu.head.getSeq[Double](0) == (0 until ev7.count.toInt).map(_ * 2.0))
    assert(ev7.customMeta("note") == "event-7")

    // full-scan totals match per-event counts (A1/A2 parity)
    val total = proc.particles.count()
    assert(total == (0 until 25).map(e => 4 + (e % 3)).sum)
  }

  test("typed custom datasets and decay legacy surface round-trip") {
    val d2 = dir + "-typed"
    val w = new HepWriter(spark, d2, evtsPerChunk = 5)
    val p = w.newProcess("zmumu").setProcessString("p p > z")
    p.setDecay(Seq(2212, 2212), Seq(13, -13))
    val b = p.newEvent()
    b.setPdg(Array(13, -13))
    // int custom data must NOT coerce through doubles: 1L<<60 is above
    // 2^53 and would round
    b.setCustom("hits", Array(5L, 1L << 60))
    // 2-D (and ragged) custom data, reference any-shape passthrough
    b.setCustom2d("cov", Array(Array(1.0, 0.5), Array(0.5, 2.0, 9.0)))
    b.setCustom("wgt", Array(0.25, 0.75))
    p.commitEvent(b)
    w.close()

    val r = new HepReader(spark, d2)
    val proc = r.process("zmumu")
    assert(proc.decay == Map(
      "in_pcls" -> Seq(2212, 2212), "out_pcls" -> Seq(13, -13)))
    val ev = proc.event(0)
    val hits = ev.custom("hits").collect().head
    assert(hits.getAs[String]("dtype") == "i8")
    assert(hits.getSeq[Long](1) == Seq(5L, 1L << 60))
    val cov = ev.custom("cov").collect().head
    assert(cov.getAs[String]("dtype") == "f8_2d")
    assert(cov.getSeq[scala.collection.Seq[Double]](2).map(_.toSeq) ==
      Seq(Seq(1.0, 0.5), Seq(0.5, 2.0, 9.0)))
    val wgt = ev.custom("wgt").collect().head
    assert(wgt.getAs[String]("dtype") == "f8")
    assert(wgt.getSeq[Double](0) == Seq(0.25, 0.75))
  }

  test("pre-decay stores open with empty decay arrays (schema evolution)") {
    val d2 = dir + "-typed"
    val d3 = dir + "-legacy"
    // simulate a store written before the decay columns existed
    spark.read.parquet(s"$d2/processes").drop("in_pcls", "out_pcls")
      .write.parquet(s"$d3/processes")
    val proc = new HepReader(spark, d3).process("zmumu")
    assert(proc.decay == Map("in_pcls" -> Nil, "out_pcls" -> Nil))
    assert(proc.processString == "p p > z")
  }

  test("row-count invariant: second column with different length throws") {
    val w = new HepWriter(spark, dir + "-inv")
    val p = w.newProcess("x")
    val b = p.newEvent()
    b.setPdg(Array(1, 2, 3))
    val e = intercept[IllegalArgumentException] {
      b.setStatus(Array[Short](1, 2))
    }
    assert(e.getMessage.contains("num_pcls"))
  }

  test("edge-weight length invariant throws") {
    val w = new HepWriter(spark, dir + "-inv2")
    val b = w.newProcess("x").newEvent()
    b.setEdges(Array((0, 1), (1, 2)))
    intercept[IllegalArgumentException] {
      b.setEdgeWeights(Array(0.5))
    }
  }

  test("mask counts toward num_pcls (reference _mask_setter)") {
    val w = new HepWriter(spark, dir + "-inv3")
    val b = w.newProcess("x").newEvent()
    b.setMask("final", Array(true, false))
    intercept[IllegalArgumentException] {
      b.setPdg(Array(1, 2, 3))
    }
  }

  test("reopening a finalized store is refused (no silent corruption)") {
    val d2 = dir + "-reopen"
    val w = new HepWriter(spark, d2)
    val p = w.newProcess("zz")
    val b = p.newEvent()
    b.setPmu(Array(Pmu(1, 2, 3, 4)))
    p.commitEvent(b)
    w.close()
    intercept[IllegalArgumentException] { new HepWriter(spark, d2) }
  }

  test("per-store compression codec reaches the parquet files") {
    val d2 = dir + "-gz"
    val w = new HepWriter(spark, d2, evtsPerChunk = 10, compression = "gzip")
    val p = w.newProcess("cz")
    val b = p.newEvent()
    b.setPmu(Array(Pmu(1, 2, 3, 4)))
    p.commitEvent(b)
    w.close()
    def parquetFiles(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(parquetFiles)
      else if (f.getName.endsWith(".parquet")) Seq(f.getName) else Nil
    val files = parquetFiles(new java.io.File(d2))
    assert(files.nonEmpty)
    assert(files.forall(_.endsWith(".gz.parquet")),
      s"expected gzip-coded files, got: $files")
  }

  test("compression level knob round-trips and reaches the codec") {
    def writeStore(d: String, level: Int): Long = {
      val w = new HepWriter(spark, d, evtsPerChunk = 10,
        compression = "zstd", compressionLevel = Some(level))
      val p = w.newProcess("lvl")
      for (e <- 0 until 20) {
        val b = p.newEvent()
        // medium-entropy payload: level differences only show on data the
        // dictionary/RLE encodings don't already flatten
        val n = 40
        b.setPmu(Array.tabulate(n)(i =>
          Pmu(math.sin(e * 37 + i), math.cos(e * 13 + i), i * 0.37, i + e * 0.11)))
          .setPdg(Array.tabulate(n)(i => (e * 7 + i * 3) % 400))
          .setStatus(Array.tabulate(n)(i => ((e + i) % 5).toShort))
        p.commitEvent(b)
      }
      w.close()
      def size(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(size).sum
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      size(new java.io.File(d))
    }
    val s1 = writeStore(dir + "-zl1", 1)
    val s19 = writeStore(dir + "-zl19", 19)
    // level must actually reach the codec: max-level output is no larger
    assert(s19 <= s1, s"zstd level ignored: level-19 store $s19 B > level-1 $s1 B")
    // and a level-9 gzip store round-trips intact
    val d9 = dir + "-gz9"
    val w = new HepWriter(spark, d9, evtsPerChunk = 10,
      compression = "gzip", compressionLevel = Some(9))
    val p = w.newProcess("g9")
    val b = p.newEvent()
    mkEvent(b, n = 5, seedBase = 99L)
    p.commitEvent(b)
    w.close()
    val r = new HepReader(spark, d9)
    assert(r.process("g9").length == 1)
    assert(r.process("g9").event(0).count == 5)
  }

  test("key formats match the reference (utils.py:7-14)") {
    assert(Keys.eventKey(7, 1000) == "evt-007")
    assert(Keys.eventKey(1234, 1000) == "evt-234")
    assert(Keys.chunkKey(3) == "evt-set-000003")
    assert(Keys.eventKey(5, 10) == "evt-5")
    assert(Keys.chunkOf(1234, 1000) == 1)
  }

  test("point lookup plan prunes partitions (chunk) and pushes event_id") {
    val r = new HepReader(spark, dir)
    val plan = r.process("higgs").event(7).pmu
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("event_id"), "event_id filter should reach the scan")
  }

  test("evtsPerChunk reads the sidecar once per reader, not per lookup") {
    val r = new HepReader(spark, dir)
    val proc = r.process("higgs")
    val before = HadoopIo.readCount.get()
    val e1 = proc.event(3) // each lookup divides by evtsPerChunk
    val e2 = proc.event(17)
    assert(e1.name == "evt-3" && e2.name == "evt-7") // forces key math too
    val after = HadoopIo.readCount.get()
    assert(after - before <= 1,
      s"expected at most one sidecar read across two point lookups, " +
        s"got ${after - before}")
  }
}
