package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.hep.{HepWriter, Schemas}

class HepCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  lazy val root: String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "hepcat").toString

  override def afterAll(): Unit = spark.stop()

  private def writeStore(path: String, nEvents: Int): Unit = {
    val w = new HepWriter(spark, path, evtsPerChunk = 10)
    val p = w.newProcess("higgs").setProcessString("p p > h z")
      .setComEnergy(13000.0, "GeV")
    for (e <- 0 until nEvents) {
      val b = p.newEvent()
      b.setPmu(Array.tabulate(3)(i => Schemas.Pmu(e + i, i, i, i + 1.0)))
        .setPdg(Array.tabulate(3)(i => 11 + i))
      p.commitEvent(b)
    }
    w.close()
  }

  test("stores are namespaces, member tables are SQL-addressable") {
    writeStore(s"$root/run1", nEvents = 25)
    writeStore(s"$root/run2", nEvents = 5)
    spark.conf.set("spark.sql.catalog.hep", classOf[HepCatalog].getName)
    spark.conf.set("spark.sql.catalog.hep.path", root)

    val ns = spark.sql("SHOW NAMESPACES IN hep").collect().map(_.getString(0))
    assert(ns.toSet == Set("run1", "run2"))

    val tables = spark.sql("SHOW TABLES IN hep.run1").collect().map(_.getString(1))
    assert(tables.toSet.subsetOf(
      Set(Schemas.ParticlesTable, Schemas.EventsTable, Schemas.ProcessesTable,
        Schemas.EdgesTable, Schemas.CustomTable)))
    assert(tables.contains(Schemas.ParticlesTable))

    assert(spark.sql("SELECT count(*) AS n FROM hep.run1.events")
      .collect().head.getLong(0) == 25)
    assert(spark.sql("SELECT count(*) AS n FROM hep.run2.events")
      .collect().head.getLong(0) == 5)
    // join across catalog tables
    val joined = spark.sql(
      """SELECT count(*) AS n FROM hep.run1.particles p
        |JOIN hep.run1.events e
        |  ON p.process = e.process AND p.event_id = e.event_id""".stripMargin)
      .collect().head.getLong(0)
    assert(joined == 25 * 3)
  }

  test("single-store root maps to the default namespace") {
    val single = s"$root/solo"
    writeStore(single, nEvents = 3)
    spark.conf.set("spark.sql.catalog.hep2", classOf[HepCatalog].getName)
    spark.conf.set("spark.sql.catalog.hep2.path", single)
    assert(spark.sql("SHOW NAMESPACES IN hep2").collect()
      .map(_.getString(0)).toSeq == Seq("default"))
    assert(spark.sql("SELECT count(*) FROM hep2.default.events")
      .collect().head.getLong(0) == 3)
  }

  test("reads inherit parquet pushdown; writes are rejected") {
    spark.conf.set("spark.sql.catalog.hep", classOf[HepCatalog].getName)
    spark.conf.set("spark.sql.catalog.hep.path", root)
    val plan = spark.sql(
      "SELECT pdg FROM hep.run1.particles WHERE event_id = 7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), EqualTo(event_id,7)]"),
      s"expected event_id pushdown in:\n$plan")
    intercept[Exception] {
      spark.sql("DROP TABLE hep.run1.particles")
    }
  }
}
