package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Paragraph-level dedup semantics (d12 + the removal transform): fixed
  * 4-word windows stand in for `\n\n` paragraphs; a paragraph occurrence
  * is duplicated when its text occurs ≥ 2 times corpus-wide; removal
  * keeps the first occurrence by (doc_id, pos) and rebuilds the text.
  */
class ParagraphDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")

  private val dir = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), "graft-para")
    .toString

  // paragraph windows are 4 words: P1/P2/P3 are distinct 4-word blocks
  private val P1 = "alpha beta gamma delta"
  private val P2 = "epsilon zeta eta theta"
  private val P3 = "iota kappa lambda mu"

  override def beforeAll(): Unit = {
    import spark.implicits._
    Seq(
      (0L, s"$P1 $P2"), // doc 0: P1 (first occurrence) + unique P2
      (1L, s"$P1 $P3"), // doc 1: duplicate P1 + unique P3
      (2L, s"$P1 $P1"), // doc 2: P1 twice (both duplicates)
      (3L, "nu xi omicron")) // doc 3: one short unique paragraph
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("d12 profile counts duplicate paragraph occurrences corpus-wide") {
    val rows = graft.QueryCatalog.byName("d12_paragraph_dedup")
      .run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(0L) == ((2L, 1L)), "doc 0: P1 duplicated, P2 unique")
    assert(rows(1L) == ((2L, 1L)), "doc 1: P1 duplicated, P3 unique")
    assert(rows(2L) == ((2L, 2L)), "doc 2: both windows are P1")
    assert(rows(3L) == ((1L, 0L)), "doc 3: single unique short paragraph")
  }

  test("removal keeps the first occurrence and rebuilds surviving text") {
    val docs = graft.Tables.documents(spark, dir)
    val out = Paragraphs.dedupParagraphs(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == s"$P1 $P2", "doc 0 holds P1's first occurrence")
    assert(out(1L) == P3, "doc 1 loses its duplicate P1")
    assert(!out.contains(2L) || out(2L).isEmpty,
      "doc 2 was nothing but duplicates")
    assert(out(3L) == "nu xi omicron")
    // removed mass: exactly the non-first P1 occurrences (3 of 4)
    val kept = out.values.map(t => if (t.isEmpty) 0 else t.split(" ").length / 4 +
      (if (t.split(" ").length % 4 == 0) 0 else 1)).sum
    assert(kept == 4, s"4 of 7 paragraph occurrences survive, got $kept")
  }

  test("short final windows keep their words (no padding, no loss)") {
    import spark.implicits._
    val occ = Paragraphs.paragraphOcc(
      Seq((9L, "one two three four five six")).toDF("doc_id", "text"), 4)
      .orderBy("pos").collect()
    assert(occ.map(_.getString(2)).toSeq ==
      Seq("one two three four", "five six"))
  }

  test("regex-boundary paragraphs: the production \\n\\n contract") {
    import spark.implicits._
    val docs = Seq(
      (0L, s"$P1\n\n$P2"),        // P1 first occurrence
      (1L, s"$P1\n\n\n\n$P3"),    // boundary RUN + duplicate P1
      (2L, s"\n\n$P2"))           // leading boundary → empty segment dropped
      .toDF("doc_id", "text")
    val prof = Paragraphs.paragraphProfileBy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(prof(0L) == ((2L, 2L)), "P1 and P2 both duplicated corpus-wide")
    assert(prof(1L) == ((2L, 1L)), "doc 1: dup P1 + unique P3")
    assert(prof(2L) == ((1L, 1L)), "doc 2: single P2 occurrence, duplicated")
    val out = Paragraphs.dedupParagraphsBy(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == s"$P1\n\n$P2")
    assert(out(1L) == P3, "doc 1 loses its duplicate P1; runs normalized")
    assert(!out.contains(2L), "doc 2 was nothing but a duplicate")
  }

  test("property: paragraphs of a dup-free corpus reconstruct every text") {
    import spark.implicits._
    // word counts straddling every window-boundary case; texts made unique
    // with distinct word alphabets so no cross-doc dedup fires
    val docs = (1 to 23).map { n =>
      (n.toLong, (1 to n).map(i => s"w$n-$i").mkString(" "))
    }.toDF("doc_id", "text")
    for (p <- Seq(1, 3, 4, 7)) {
      val occ = Paragraphs.paragraphOcc(docs, p)
        .groupBy("doc_id")
        .agg(expr(
          "array_join(transform(sort_array(collect_list(struct(pos, para))), x -> x.para), ' ')")
          .as("rebuilt"))
      val bad = occ.join(docs, "doc_id")
        .filter(col("rebuilt") =!= col("text")).count()
      assert(bad == 0, s"paragraph windows of width $p lost or reordered words")
      // and the removal transform is the identity on a dup-free corpus
      val out = Paragraphs.dedupParagraphs(docs, p)
      assert(out.join(docs.select(col("doc_id"), col("text").as("orig")), "doc_id")
        .filter(col("text") =!= col("orig")).count() == 0)
      assert(out.count() == 23)
    }
  }

  test("spanScrub excises a shared run from every copy; unique text survives") {
    import spark.implicits._
    // a shared run long enough for the Schleimer guarantee
    // (>= SpanWords + WinnowS - 1 = 23 tokens), embedded at DIFFERENT
    // offsets in two docs, plus a doc with no duplication
    val run = (1 to 30).map(i => s"dup$i").mkString(" ")
    val a = s"lead1 lead2 lead3 $run tail1 tail2"
    val b = s"$run other1 other2 other3 other4"
    val c = (1 to 40).map(i => s"uniq$i").mkString(" ")
    val docs = Seq((0L, a), (1L, b), (2L, c)).toDF("doc_id", "text")
    val out = Paragraphs.spanScrub(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // the unique doc is untouched, byte-for-byte
    assert(out(2L) == ((40L, 40L, 0L, c)))
    // both copies lose spans; the scrubbed text contains no dup token
    Seq(0L, 1L).foreach { id =>
      val (nTok, nKept, nDup, clean) = out(id)
      assert(nDup >= 1, s"doc $id must have duplicated spans")
      assert(nKept < nTok)
      assert(!clean.contains("dup15"),
        s"the interior of the shared run must be excised from doc $id: $clean")
    }
    // determinism under repartitioning
    val again = Paragraphs.spanScrub(docs.repartition(5)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(again == out)
  }
}
