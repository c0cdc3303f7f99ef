package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** [[OrcStore]]: the ORC interchange path — round-trip fidelity on real
  * tables plus the two plan properties that make a columnar format worth
  * shipping (pushdown + pruning), asserted on the actual scan.
  */
class OrcStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  test("documents and events tables survive an ORC round-trip bit-for-bit") {
    for ((name, df, cols) <- Seq(
        ("documents", graft.Tables.documents(spark, sfDir),
          "doc_id, text, lang, source, n_chars"),
        ("events", graft.Tables.events(spark, sfDir),
          "event_id, ts, user_id, event_type, value"))) {
      val out = Files.createTempDirectory(Paths.get("target"), s"orc-$name").toString
      OrcStore.write(df, out)
      val back = OrcStore.read(spark, out)
      assert(back.count() === df.count(), name)
      def sig(d: org.apache.spark.sql.DataFrame) =
        d.agg(expr(s"bit_xor(xxhash64($cols))")).head().getLong(0)
      assert(sig(back) === sig(df), s"$name content checksum")
    }
  }

  test("filters push down to the ORC scan and projections prune columns") {
    val out = Files.createTempDirectory(Paths.get("target"), "orc-push").toString
    OrcStore.write(graft.Tables.documents(spark, sfDir), out)
    val q = OrcStore.read(spark, out)
      .filter(col("n_chars") > 500)
      .select("doc_id", "n_chars")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,500)]"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), p)
    assert(!p.contains("text"), "pruned column must not be read:\n" + p)
    // and the pushed plan returns the same rows as an unpushed filter
    val expected = graft.Tables.documents(spark, sfDir)
      .filter(col("n_chars") > 500).count()
    assert(q.count() === expected)
  }
}
