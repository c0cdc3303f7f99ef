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
        Tables.parallel(Tables.documents(s, d).select("doc_id", "text")),
        ParaWords)
      val cnt = occ.groupBy(col("h")).agg(count(lit(1)).as("n_occ"))
      occ.join(cnt, "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_paras"),
          count(when(col("n_occ") >= 2, 1)).as("n_dup_paras"))
        .select(col("doc_id"), col("n_paras"), col("n_dup_paras"),
          (col("n_dup_paras") * lit(1.0) / col("n_paras")).as("dup_fraction"))
        .orderBy("doc_id")
    })

  /** Span window width (tokens) and winnowing window (hashes) for the
    * substring-level profile. Guarantee threshold: shared runs of
    * ≥ SpanWords + WinnowS − 1 = 23 tokens are always detected.
    */
  val SpanWords = 16
  val WinnowS = 8

  /** WINNOWED span fingerprints — the substring-level granularity of Lee
    * et al. 2022, made alignment-robust the standard public way
    * (Schleimer, Wilkerson & Aiken, SIGMOD 2003 "Winnowing: Local
    * Algorithms for Document Fingerprinting"):
    *
    *   1. every [[SpanWords]]-token window at stride 1 is hashed (md5);
    *   2. over each run of [[WinnowS]] consecutive window hashes, the
    *      minimum hash is SELECTED (first position on ties);
    *   3. a document's fingerprints are the selected hashes.
    *
    * Fixed-stride windows on both sides miss duplicates whose offsets
    * differ by a non-multiple of the stride; winnowing's selection is a
    * pure function of local CONTENT, so two copies of a run of
    * ≥ SpanWords + WinnowS − 1 tokens contain a full hash window inside
    * the run on both sides and select the SAME minimum — the Schleimer
    * guarantee, alignment-free. Expected density ≈ 2/(WinnowS+1) of all
    * windows, so fingerprint volume is ~linear in token count scaled down
    * 4-5×.
    *
    * Everything here is ROW-LOCAL array arithmetic (windows, hashes,
    * argmin selection all inside one projection, fused into the scan);
    * cross-engine determinism comes from md5 (identical hex in both
    * engines) and lexicographic min over fixed-width hex strings. Docs
    * shorter than [[SpanWords]] contribute one whole-doc fingerprint.
    * One row out per SELECTED fingerprint occurrence.
    */
  def spanFingerprints(docs: DataFrame, width: Int = SpanWords,
      winnow: Int = WinnowS): DataFrame =
    spanOccurrences(docs, width, winnow).drop("p")

  /** [[spanFingerprints]] with the selected window's START POSITION kept
    * (`p`, 1-based into the token array) — what span REMOVAL needs: `p`
    * locates the duplicated `width`-token run inside the document.
    */
  def spanOccurrences(docs: DataFrame, width: Int = SpanWords,
      winnow: Int = WinnowS): DataFrame = {
    // every non-text input column rides along unchanged (doc_id, and e.g.
    // an event-time column for the streaming twin in DocStream) — the
    // winnowing arithmetic itself stays row-local in one projection chain
    val keep = docs.columns.filterNot(_ == "text").map(col)
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("hs", expr(
        s"""transform(
           |  if(size(ws) >= $width,
           |     transform(sequence(1, size(ws) - ${width - 1}),
           |       i -> concat_ws(' ', slice(ws, i, $width))),
           |     array(concat_ws(' ', ws))),
           |  w -> md5(w))""".stripMargin))
      .withColumn("sel", expr(
        s"""array_distinct(transform(
           |  sequence(1, greatest(size(hs) - ${winnow - 1}, 1)),
           |  j -> j - 1 + array_position(slice(hs, j, $winnow),
           |                              array_min(slice(hs, j, $winnow)))))"""
          .stripMargin))
      .select(keep :+ col("hs") :+ explode(col("sel")).as("p"): _*)
      .select(keep :+ col("p") :+
        expr("element_at(hs, cast(p as int))").as("fp"): _*)
  }

  /** Per-doc duplicate-span profile: winnowed fingerprints whose hash
    * occurs ≥ 2 times corpus-wide (cross-doc boilerplate runs AND
    * intra-doc repetition). Same bounded shape as d12: count aggregate
    * keyed on the fingerprint (O(1) state, no lists), occurrences
    * re-join the count.
    */
  def spanProfile(docs: DataFrame, width: Int = SpanWords,
      winnow: Int = WinnowS): DataFrame = {
    val occ = spanFingerprints(docs.select(col("doc_id"), col("text")),
      width, winnow)
    val cnt = occ.groupBy(col("fp")).agg(count(lit(1)).as("n_occ"))
    occ.join(cnt, "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"),
        count(when(col("n_occ") >= 2, 1)).as("n_dup_fp"))
      .select(col("doc_id"), col("n_fp"), col("n_dup_fp"),
        (col("n_dup_fp") * lit(1.0) / col("n_fp")).as("dup_fraction"))
  }

  /** Gate form: drop documents whose duplicated-fingerprint fraction
    * exceeds `maxDupFraction` — the curation filter that removes
    * template/mirror pages wholesale where per-span excision would shred
    * the text.
    */
  def dropSpanDuplicates(docs: DataFrame, maxDupFraction: Double,
      width: Int = SpanWords, winnow: Int = WinnowS): DataFrame = {
    val keep = spanProfile(docs, width, winnow)
      .filter(col("dup_fraction") <= maxDupFraction)
      .select(col("doc_id"))
    docs.join(keep, "doc_id")
  }

  /** d13: substring-level duplication profile over winnowed
    * [[SpanWords]]-token window fingerprints ([[WinnowS]]-hash selection
    * windows). The oracle mirrors the full winnowing computation.
    */
  val spanDedup: QueryDef = QueryDef(
    "d13_span_dedup",
    Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |hx AS (SELECT doc_id,
       |         list_transform(
       |           CASE WHEN len(ws) >= $SpanWords
       |                THEN list_transform(range(1, len(ws) - ${SpanWords - 1} + 1),
       |                       i -> array_to_string(ws[CAST(i AS INT):CAST(i + ${SpanWords - 1} AS INT)], ' '))
       |                ELSE [array_to_string(ws, ' ')] END,
       |           x -> md5(x)) AS hs
       |       FROM w),
       |se AS (SELECT doc_id, hs,
       |         list_distinct(list_transform(
       |           range(1, greatest(len(hs) - ${WinnowS - 1}, 1) + 1),
       |           j -> j - 1 + list_position(hs[CAST(j AS INT):CAST(j + ${WinnowS - 1} AS INT)],
       |                  list_aggregate(hs[CAST(j AS INT):CAST(j + ${WinnowS - 1} AS INT)], 'min')))) AS sel
       |       FROM hx),
       |fp AS (SELECT doc_id, unnest(list_transform(sel, i -> hs[CAST(i AS INT)])) AS fp
       |       FROM se),
       |c AS (SELECT fp, count(*) AS n_occ FROM fp GROUP BY fp)
       |SELECT doc_id, count(*) AS n_fp,
       |       count(CASE WHEN n_occ >= 2 THEN 1 END) AS n_dup_fp,
       |       count(CASE WHEN n_occ >= 2 THEN 1 END) * 1.0 / count(*) AS dup_fraction
       |FROM fp JOIN c USING (fp)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin),
    (s, d) => spanProfile(
      // scan-level parallel guard: ~n md5 evaluations per doc make this
      // the hash-densest per-row pipeline in the suite
      Tables.parallel(Tables.documents(s, d).select("doc_id", "text")))
      .orderBy("doc_id"))

  /** Duplicated-span SCRUBBING — the removal form of substring dedup (Lee
    * et al. 2022 remove duplicated substrings from the training corpus
    * rather than whole documents; d13 only FLAGS them). Every winnowed
    * span whose fingerprint occurs ≥ 2 times corpus-wide is excised from
    * its document: tokens covered by any duplicated `width`-window are
    * dropped and the document is rebuilt from the survivors.
    *
    * Scale shape: fingerprint counts are an O(1)-state hash aggregate;
    * the duplicated positions per doc are a bounded per-row list (≤ the
    * doc's own winnowed-span count — row-local scale, like holding the
    * text itself); the excision is one scan-fused higher-order-function
    * projection (`filter`/`exists` over token indices). No corpus
    * self-join anywhere — the only corpus-keyed exchanges are the fp
    * count and the doc_id re-group.
    *
    * Returns (doc_id, n_tok, n_kept, n_dup_spans, clean_text). A short
    * doc (< width tokens) that exactly duplicates another collapses to
    * empty text — whole-doc duplicate removal as the degenerate case.
    */
  def spanScrub(docs: DataFrame, width: Int = SpanWords,
      winnow: Int = WinnowS): DataFrame = {
    val occ = spanOccurrences(docs.select(col("doc_id"), col("text")),
      width, winnow)
    val cnt = occ.groupBy(col("fp")).agg(count(lit(1)).as("n_occ"))
    val dup = occ.join(cnt, "fp").filter(col("n_occ") >= 2)
      .groupBy(col("doc_id")).agg(collect_list(col("p")).as("dup"))
    docs.select(col("doc_id"), col("text"))
      .join(dup, Seq("doc_id"), "left")
      .withColumn("dup",
        coalesce(col("dup"), expr("cast(array() as array<bigint>)")))
      .withColumn("ws", split(col("text"), " "))
      .withColumn("ki", expr(
        s"""filter(sequence(1, size(ws)),
           |       i -> NOT exists(dup, p -> i >= p AND i < p + $width))"""
          .stripMargin))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tok"),
        size(col("ki")).cast("long").as("n_kept"),
        size(col("dup")).cast("long").as("n_dup_spans"),
        expr("concat_ws(' ', transform(ki, i -> element_at(ws, cast(i as int))))")
          .as("clean_text"))
  }

  /** d17: the scrub audit — per-doc before/after token counts, removed
    * span count, and an md5 of the rebuilt text (pins the exact excision
    * without hauling full texts through the compare). The oracle repeats
    * the entire winnowing + counting + excision in SQL.
    */
  val spanScrubAudit: QueryDef = QueryDef(
    "d17_span_scrub",
    Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |hx AS (SELECT doc_id, ws,
       |         list_transform(
       |           CASE WHEN len(ws) >= $SpanWords
       |                THEN list_transform(range(1, len(ws) - ${SpanWords - 1} + 1),
       |                       i -> array_to_string(ws[CAST(i AS INT):CAST(i + ${SpanWords - 1} AS INT)], ' '))
       |                ELSE [array_to_string(ws, ' ')] END,
       |           x -> md5(x)) AS hs
       |       FROM w),
       |se AS (SELECT doc_id, ws, hs,
       |         list_distinct(list_transform(
       |           range(1, greatest(len(hs) - ${WinnowS - 1}, 1) + 1),
       |           j -> j - 1 + list_position(hs[CAST(j AS INT):CAST(j + ${WinnowS - 1} AS INT)],
       |                  list_aggregate(hs[CAST(j AS INT):CAST(j + ${WinnowS - 1} AS INT)], 'min')))) AS sel
       |       FROM hx),
       |occ AS (SELECT doc_id, hs, unnest(sel) AS p FROM se),
       |ofp AS (SELECT doc_id, p, hs[CAST(p AS INT)] AS fp FROM occ),
       |c AS (SELECT fp, count(*) AS n_occ FROM ofp GROUP BY fp),
       |dup AS (SELECT doc_id, list(p) AS dup FROM ofp JOIN c USING (fp)
       |        WHERE n_occ >= 2 GROUP BY doc_id),
       |r AS (SELECT w.doc_id AS doc_id, ws,
       |        COALESCE(dup, CAST([] AS BIGINT[])) AS dup
       |      FROM w LEFT JOIN dup ON dup.doc_id = w.doc_id),
       |k AS (SELECT doc_id, ws, dup,
       |        list_filter(range(1, len(ws) + 1),
       |          i -> len(list_filter(dup,
       |                 p -> i >= p AND i < p + $SpanWords)) = 0) AS ki
       |      FROM r)
       |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tok,
       |       CAST(len(ki) AS BIGINT) AS n_kept,
       |       CAST(len(dup) AS BIGINT) AS n_dup_spans,
       |       md5(COALESCE(array_to_string(
       |         list_transform(ki, i -> ws[CAST(i AS INT)]), ' '), '')) AS clean_md5
       |FROM k ORDER BY doc_id""".stripMargin),
    (s, d) => spanScrub(
      Tables.parallel(Tables.documents(s, d).select("doc_id", "text")))
      .select(col("doc_id"), col("n_tok"), col("n_kept"), col("n_dup_spans"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy("doc_id"))

  def defs: Seq[QueryDef] = Seq(paragraphProfile, spanDedup, spanScrubAudit)
}
