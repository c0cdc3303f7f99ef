package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The SparkSessionExtensions path: long_dot must resolve in pure SQL in a
  * session built with the extension (no imperative register call).
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    // getOrCreate would reuse another suite's session and skip the
    // extension — make sure we build fresh
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = graft.EngineSession.builder("4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("long_dot resolves via SQL in an extension-built session") {
    val r = spark.sql(
      "SELECT long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect().head.getLong(0)
    assert(r == 4 + 10 + 18)
  }

  test("long_dot handles length mismatch by truncating to the shorter") {
    val r = spark.sql("SELECT long_dot(array(2L, 3L), array(10L)) AS d")
      .collect().head.getLong(0)
    assert(r == 20)
  }

  test("long_dot is null on null input") {
    val r = spark.sql(
      "SELECT long_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS d")
      .collect().head
    assert(r.isNullAt(0))
  }
}
