package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Write direction of the hepmc interchange: [[HepMcWriter]] emits
  * Asciiv3 records that [[HepMcSource]] reads back EXACTLY, and the
  * canonical form is a fixpoint (write∘read∘write is byte-stable).
  */
class HepMcWriterSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  lazy val dir: String =
    Files.createTempDirectory(Paths.get("target"), "hepmc-w").toString

  override def afterAll(): Unit = spark.stop()

  private def fixtureFile: String = {
    val p = Paths.get(dir, "in.hepmc")
    if (!Files.exists(p))
      Files.write(p, HepMcFixture.text.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  private def rowsOf(df: DataFrame) = df.collect().map { r =>
    val pmu = r.getStruct(6)
    (r.getLong(0), r.getString(1), r.getString(2),
      Option(r.getSeq[Double](3)).map(_.toSeq),
      r.getInt(4), r.getInt(5),
      (pmu.getDouble(0), pmu.getDouble(1), pmu.getDouble(2), pmu.getDouble(3)),
      r.getDouble(7), r.getInt(8), r.getInt(9), r.getInt(10), r.getInt(11))
  }.sortBy(t => (t._1, t._5)).toSeq

  test("write-then-read round-trips the fixture events exactly") {
    val df0 = spark.read.format("hepmc").load(fixtureFile)
    HepMcWriter.write(df0, s"$dir/out1")
    val df1 = spark.read.format("hepmc").load(s"$dir/out1")
    assert(rowsOf(df1) === rowsOf(df0))
  }

  test("canonical form is a fixpoint: second write is byte-identical") {
    val df0 = spark.read.format("hepmc").load(fixtureFile)
    HepMcWriter.write(df0, s"$dir/fix1")
    val df1 = spark.read.format("hepmc").load(s"$dir/fix1")
    HepMcWriter.write(df1, s"$dir/fix2")
    def bytes(d: String): String = {
      val fs = new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".hepmc")).sortBy(_.getName)
      fs.map(f => new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8)).mkString("\n---\n")
    }
    assert(bytes(s"$dir/fix2") === bytes(s"$dir/fix1"))
    // vertex elision survives the round trip: the elided mother link in
    // event 1 is re-emitted as a mother-id parent, not a synthetic vertex
    assert(bytes(s"$dir/fix1").contains("P 2 1 22"))
  }

  test("multi-file write: every event lands whole, all rows survive") {
    val df0 = spark.read.format("hepmc").load(fixtureFile)
    HepMcWriter.write(df0, s"$dir/multi", numFiles = 2)
    val back = spark.read.format("hepmc").load(s"$dir/multi")
    assert(rowsOf(back) === rowsOf(df0))
    // each .hepmc file is independently parseable (events are contiguous)
    new java.io.File(s"$dir/multi").listFiles()
      .filter(_.getName.endsWith(".hepmc")).foreach { f =>
        spark.read.format("hepmc").load(f.toString).count()
      }
  }
}
