package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Paragraph-level deduplication — the production LLM-curation modality
  * from Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better" (public knowledge): duplication lives INSIDE documents
  * (boilerplate headers, license blocks, navigation chrome), so document-
  * level dedup (d01–d11) misses it. Docs are split into paragraphs, each
  * paragraph is hashed, and a paragraph occurrence is *duplicated* when
  * its text occurs ≥ 2 times anywhere in the corpus.
  *
  * PARAGRAPH CONTRACT: production corpora split on the `\n\n` boundary
  * (the Lee et al. convention — see [[paragraphOcc]]'s `splitter`
  * parameter). The harness's synthetic texts are single-line, so the
  * registered query uses the deterministic stand-in of fixed
  * [[ParaWords]]-word windows; the operator itself takes the splitter as
  * input and the scale shape is identical either way.
  *
  * Scale shape (100 TB rules):
  *   - paragraph extraction is row-local (a `transform` over the word
  *     array fused into the scan projection) — no corpus shuffle before
  *     the paragraph-hash aggregate;
  *   - the occurrence count is a plain count aggregate keyed on the
  *     64-bit paragraph hash — O(1) state per key (never a list), and the
  *     occurrence→count join reuses the same hash-partitioned exchange;
  *   - paragraphs travel as xxhash64 longs, same documented collision
  *     posture as d05 (`Dedup.jaccardPairs`): a 64-bit collision perturbs
  *     one count at p ≈ n²/2^65 — below every other noise floor;
  *   - the removal transform's per-doc rebuild aggregate holds one doc's
  *     paragraphs — bounded by max document size, the same state any
  *     per-doc aggregate carries.
  */
object Paragraphs {

  /** Words per synthetic paragraph window (the `\n\n` stand-in). */
  val ParaWords = 4

  /** Paragraph occurrences: (doc_id, pos, para, h) — one row per
    * paragraph instance, extracted row-locally. `paraWords`-word
    * non-overlapping windows; the final window may be shorter.
    */
  private[operators] def paragraphOcc(docs: DataFrame, paraWords: Int): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, cast(ceil(size(ws) / $paraWords.0) as int)),
           |  i -> concat_ws(' ', slice(ws, (i-1)*$paraWords+1, $paraWords)))""".stripMargin)))
      .select(col("doc_id"), col("pos"), col("col").as("para"),
        xxhash64(col("col")).as("h"))

  /** Paragraph occurrences split on a BOUNDARY REGEX — the production
    * contract (`\n\n+` for real corpora, per Lee et al.). Same output
    * shape as [[paragraphOcc]]; empty segments (leading boundary, runs)
    * are dropped. Row-local, scan-fused, like the window variant.
    */
  def paragraphOccBy(docs: DataFrame, boundary: String = "\\n\\n+"): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), boundary)).as(Seq("pos", "para")))
      .filter(length(col("para")) > 0)
      .select(col("doc_id"), col("pos"), col("para"),
        xxhash64(col("para")).as("h"))

  /** Per-doc duplicate-paragraph profile over regex-boundary paragraphs —
    * the production form of d12 (which pins the window variant to its
    * oracle). Returns (doc_id, n_paras, n_dup_paras, dup_fraction).
    */
  def paragraphProfileBy(docs: DataFrame, boundary: String = "\\n\\n+"): DataFrame = {
    val occ = paragraphOccBy(docs.select(col("doc_id"), col("text")), boundary)
    val cnt = occ.groupBy(col("h")).agg(count(lit(1)).as("n_occ"))
    occ.join(cnt, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        count(when(col("n_occ") >= 2, 1)).as("n_dup_paras"))
      .select(col("doc_id"), col("n_paras"), col("n_dup_paras"),
        (col("n_dup_paras") * lit(1.0) / col("n_paras")).as("dup_fraction"))
  }

  /** Remove all but the FIRST occurrence (smallest (doc_id, pos)) of every
    * duplicated paragraph and rebuild each doc's text from its surviving
    * paragraphs — the Lee et al. removal semantic. A doc whose every
    * paragraph is removed disappears from the result (the paper's
    * behavior: substring dedup may empty a document).
    *
    * The first-occurrence winner is a min-over-window on the paragraph
    * hash — sort-based, spillable, no driver state; the rebuild aggregate
    * is per-doc (bounded by document size).
    */
  def dedupParagraphs(docs: DataFrame, paraWords: Int = ParaWords): DataFrame =
    removeDupOccurrences(
      paragraphOcc(docs.select(col("doc_id"), col("text")), paraWords), " ")

  /** [[dedupParagraphs]] over regex-boundary paragraphs, rebuilding with
    * the canonical `\n\n` joiner (boundary runs are not preserved —
    * removal normalizes them, which is the Lee et al. behavior).
    */
  def dedupParagraphsBy(docs: DataFrame,
      boundary: String = "\\n\\n+", joiner: String = "\n\n"): DataFrame =
    removeDupOccurrences(
      paragraphOccBy(docs.select(col("doc_id"), col("text")), boundary), joiner)

  private def removeDupOccurrences(occ: DataFrame, joiner: String): DataFrame = {
    val firstOcc = min(struct(col("doc_id"), col("pos")))
      .over(Window.partitionBy(col("h")))
    occ.withColumn("first_occ", firstOcc)
      .filter(struct(col("doc_id"), col("pos")) === col("first_occ"))
      .groupBy(col("doc_id"))
      .agg(array_join(expr(
        "transform(sort_array(collect_list(struct(pos, para))), x -> x.para)"),
        joiner).as("text"))
  }

  /** d12: per-doc paragraph-duplication profile — total paragraphs,
    * duplicated-paragraph occurrences (text occurs ≥ 2 times corpus-wide),
    * and the duplicate fraction a curation pipeline gates on.
    */
  val paragraphProfile: QueryDef = QueryDef(
    "d12_paragraph_dedup",
    Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |p AS (SELECT doc_id,
       |        unnest(list_transform(range(1, CAST(ceil(len(ws) / $ParaWords.0) AS INT) + 1),
       |          i -> array_to_string(ws[((i-1)*$ParaWords+1):least(i*$ParaWords, len(ws))], ' '))) AS para
       |      FROM w),
       |c AS (SELECT para, count(*) AS n_occ FROM p GROUP BY para)
       |SELECT doc_id, count(*) AS n_paras,
       |       count(CASE WHEN n_occ >= 2 THEN 1 END) AS n_dup_paras,
       |       count(CASE WHEN n_occ >= 2 THEN 1 END) * 1.0 / count(*) AS dup_fraction
       |FROM p JOIN c USING (para)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val occ = paragraphOcc(
        Tables.documents(s, d).select("doc_id", "text"), ParaWords)
      val cnt = occ.groupBy(col("h")).agg(count(lit(1)).as("n_occ"))
      occ.join(cnt, "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_paras"),
          count(when(col("n_occ") >= 2, 1)).as("n_dup_paras"))
        .select(col("doc_id"), col("n_paras"), col("n_dup_paras"),
          (col("n_dup_paras") * lit(1.0) / col("n_paras")).as("dup_fraction"))
        .orderBy("doc_id")
    })

  def defs: Seq[QueryDef] = Seq(paragraphProfile)
}
