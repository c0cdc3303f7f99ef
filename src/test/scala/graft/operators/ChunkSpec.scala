package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Contracts of [[TextAnalysis.chunk]] beyond the t14 oracle gate
  * (which pins the exact slicing/joining semantics at sf scale): the
  * overlap/coverage invariants on planted fixtures, the short-document
  * edge, and the map-only plan shape the 100 TB argument rests on.
  */
class ChunkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")

  override def afterAll(): Unit = spark.stop()

  private def doc(n: Int): (Long, String) =
    (n.toLong, (1 to n).map(i => s"w$i").mkString(" "))

  test("chunk: coverage, overlap, and tail-chunk invariants") {
    import spark.implicits._
    // 100 tokens, window 10, stride 7 -> starts 0,7,...,98 (15 chunks)
    val out = TextAnalysis.chunk(Seq(doc(100)).toDF("doc_id", "text"),
        window = 10, stride = 7)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.length === 15)
    assert(out.map(_._1).toSeq === (0L until 15L))
    // every chunk is full-window except the tail ones past 100 - 10
    out.foreach { case (idx, n, text) =>
      val start = idx * 7
      val expectN = math.min(10L, 100 - start)
      assert(n === expectN, s"chunk $idx token count")
      val toks = text.split(" ")
      assert(toks.length.toLong === expectN)
      // exact content: tokens start+1 .. start+n of the document
      assert(toks.head === s"w${start + 1}" && toks.last === s"w${start + expectN}")
    }
    // overlap: consecutive full chunks share window - stride = 3 tokens
    out.sliding(2).foreach {
      case Array((_, n1, t1), (_, n2, t2)) if n1 == 10 && n2 >= 3 =>
        assert(t1.split(" ").takeRight(3).sameElements(t2.split(" ").take(3)),
          "consecutive chunks must overlap by window - stride tokens")
      case _ => ()
    }
  }

  test("chunk: short docs yield exactly one whole-document chunk") {
    import spark.implicits._
    val out = TextAnalysis.chunk(
        Seq(doc(1), doc(48), (99L, "solo")).toDF("doc_id", "text"),
        window = 64, stride = 48)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out.size === 3, "one chunk per short doc")
    assert(out(1L) === ((0L, 1L, "w1")))
    assert(out(48L)._2 === 48L)
    assert(out(99L) === ((0L, 1L, "solo")))
  }

  test("chunk: map-only plan — no exchange, no aggregate") {
    val plan = TextAnalysis.chunk(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunk must not shuffle:\n$plan")
    assert(plan.contains("Generate"), "expected the sequence+explode Generate")
  }

  test("chunk: rejects stride > window") {
    import spark.implicits._
    val df = Seq(doc(5)).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunk(df, window = 8, stride = 9)
    }
  }
}
