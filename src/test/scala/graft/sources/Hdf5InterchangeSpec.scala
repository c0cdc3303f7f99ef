package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The `hdf5` short name resolves (service-registered) and fails with the
  * interchange-contract message — the boundary is an interface, not an
  * unknown-format error.
  */
class Hdf5InterchangeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("2")

  override def afterAll(): Unit = spark.stop()

  test("hdf5 format resolves to the stub and explains the converter path") {
    val e = intercept[Exception] {
      spark.read.format("hdf5").load("/tmp/nonexistent.h5").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(e).mkString("\n")
    assert(all.contains("docs/hdf5-interchange.md"),
      s"expected the interchange pointer, got: $all")
    assert(all.contains("no JVM HDF5 library"), all)
  }
}
