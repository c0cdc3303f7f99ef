package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Text analysis over `documents`: n-gram-heuristic classification
  * ("language ID" over the corpus's own keyword profiles), quality scoring,
  * token counting, and document fingerprinting (winnowing-style min-hash of
  * k-gram windows).
  *
  * All four are PER-ROW computations (array lambdas + regex, no UDFs) — at
  * 100 TB they are embarrassingly parallel map stages fused into the scan
  * by whole-stage codegen; the only shuffle anywhere is the final ORDER BY
  * for deterministic output.
  */
object TextAnalysis {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  /** Keyword profiles, sorted by name — the classifier's "languages".
    * (The corpus vocabulary is synthetic and shared across the `lang`
    * column's values, so real stopword language-ID is degenerate here; the
    * same n-gram-scoring machinery classifies against corpus-derived
    * profiles instead.)
    */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "gen" -> Seq("the", "a", "data", "line", "part"),
    "misc" -> Seq("window", "group", "order", "stream", "vector"),
    "ops" -> Seq("scan", "filter", "sort", "merge", "join"),
    "perf" -> Seq("fast", "slow", "big", "small", "batch"),
    "struct" -> Seq("table", "row", "column", "key", "value"))

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(", ")

  /** Oracle-side per-profile score relation (shared by t01 and t20). */
  private val oracleScores: String =
    profiles.zipWithIndex.map { case ((name, ws), i) =>
      s"""SELECT doc_id, '$name' AS profile, $i AS pidx,
         |  len(list_filter(string_split(text, ' '), x -> x IN (${inList(ws)}))) AS score
         |FROM documents""".stripMargin
    }.mkString(" UNION ALL ")

  /** Engine-side argmax classification (shared by t01 and t20):
    * doc_id, pred, best_score — scan-fused scoring against the broadcast
    * keyword profiles, argmax with min-index tiebreak via max-of-struct.
    */
  private def predictProfile(s: SparkSession, d: String): DataFrame = {
    val ws = Tables.parallel(Tables.documents(s, d))
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
    val scored = profiles.zipWithIndex.foldLeft(ws) { case (df, ((name, kw), i)) =>
      df.withColumn(s"score_$i",
        expr(s"size(filter(ws, x -> x IN (${inList(kw)})))"))
    }
    // argmax with min-index tiebreak: max of struct(score, -idx)
    val best = array_max(array(profiles.indices.map(i =>
      struct(col(s"score_$i").as("score"), lit(-i).as("nidx"))): _*))
    val names = array(profiles.map(p => lit(p._1)): _*)
    scored
      .withColumn("best", best)
      .select(col("doc_id"), col("lang"),
        element_at(names, -col("best.nidx") + 1).as("pred"),
        col("best.score").as("best_score"))
  }

  /** Language-ID-style classification: score each profile by keyword hits,
    * predict the argmax (ties → first profile name alphabetically).
    */
  val langId: QueryDef = q(
    "t01_langid",
    s"""WITH scores AS ($oracleScores)
       |SELECT doc_id, profile AS pred, score AS best_score
       |FROM (SELECT doc_id, profile, score,
       |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, pidx) AS rn
       |      FROM scores)
       |WHERE rn = 1
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    predictProfile(s, d)
      .select("doc_id", "pred", "best_score")
      .orderBy("doc_id")
  }

  /** The t02 quality score as a reusable Column over a `text` column —
    * ONE definition shared by the gated query below and by
    * [[MlQuality]]'s distillation target, so the two can never diverge.
    */
  def qualityScoreCol: Column = {
    val nWords = size(split(col("text"), " "))
    val nAlpha = length(regexp_replace(col("text"), "[^a-z]", ""))
    val meanWl = (length(col("text")) - (nWords - 1)) / nWords
    val alphaRatio = nAlpha / length(col("text"))
    val stopRatio =
      expr("size(filter(split(text, ' '), x -> x IN ('the', 'a')))") / nWords
    lit(0.4) * alphaRatio + lit(0.3) * least(meanWl / 10.0, lit(1.0)) +
      lit(0.3) * stopRatio
  }

  /** Quality scoring: alphabetic ratio, mean word length, stopword ratio →
    * weighted score. Ratios are int/int → double (deterministic); the score
    * formula is written with identical operator order on both sides.
    */
  val quality: QueryDef = q(
    "t02_quality",
    """SELECT doc_id, n_words, n_alpha, mean_wl, alpha_ratio, stop_ratio,
      |  0.4 * alpha_ratio + 0.3 * least(mean_wl / 10.0, 1.0) + 0.3 * stop_ratio
      |    AS quality_score
      |FROM (
      |  SELECT doc_id,
      |    len(string_split(text, ' ')) AS n_words,
      |    length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
      |    (length(text) - (len(string_split(text, ' ')) - 1))
      |      / len(string_split(text, ' ')) AS mean_wl,
      |    length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text) AS alpha_ratio,
      |    len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
      |      / len(string_split(text, ' ')) AS stop_ratio
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val nWords = size(split(col("text"), " "))
    val nAlpha = length(regexp_replace(col("text"), "[^a-z]", ""))
    val meanWl = (length(col("text")) - (nWords - 1)) / nWords
    val alphaRatio = nAlpha / length(col("text"))
    val stopRatio =
      expr("size(filter(split(text, ' '), x -> x IN ('the', 'a')))") / nWords
    Tables.parallel(Tables.documents(s, d)).select(
      col("doc_id"),
      nWords.as("n_words"),
      nAlpha.as("n_alpha"),
      meanWl.as("mean_wl"),
      alphaRatio.as("alpha_ratio"),
      stopRatio.as("stop_ratio"),
      qualityScoreCol.as("quality_score"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs | digit runs | single punctuation).
    */
  val tokens: QueryDef = q(
    "t03_tokens",
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
      |  length(text) / len(regexp_extract_all(text, '\S+')) AS chars_per_token
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val nWs = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
    val nBpe =
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
    Tables.parallel(Tables.documents(s, d)).select(
      col("doc_id"),
      nWs.as("n_ws_tokens"),
      nBpe.as("n_bpe_tokens"),
      (length(col("text")) / nWs).as("chars_per_token"))
      .orderBy("doc_id")
  }

  /** Winnowing-style document fingerprinting: the minimum md5 over all
    * k-char windows (k = 8 and 16) — stable under content reordering at
    * the window scale, per-row array lambda.
    */
  val fingerprint: QueryDef = q(
    "t04_fingerprint",
    """SELECT doc_id,
      |  list_min(list_transform(range(1, greatest(length(text)-7, 1)+1),
      |    i -> md5(substr(text, CAST(i AS INT), 8)))) AS fp8,
      |  list_min(list_transform(range(1, greatest(length(text)-15, 1)+1),
      |    i -> md5(substr(text, CAST(i AS INT), 16)))) AS fp16
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.parallel(Tables.documents(s, d)).select(
      col("doc_id"),
      expr("array_min(transform(sequence(1, greatest(length(text)-7, 1)), i -> md5(substr(text, i, 8))))")
        .as("fp8"),
      expr("array_min(transform(sequence(1, greatest(length(text)-15, 1)), i -> md5(substr(text, i, 16))))")
        .as("fp16"))
      .orderBy("doc_id")
  }

  /** Top-3 terms per document by TF-IDF.
    *
    * The score is INTEGER-exact: `tf * 1e6 * N / df` in BIGINT floor
    * division rather than `tf·ln(N/df)` — `ln` is not correctly-rounded
    * and differs across libm implementations, so a float formulation
    * could rank ties differently per engine; the rational form ranks
    * identically (it is monotone in tf/df for fixed N) and reproduces
    * bit-for-bit. Ties break on the term text.
    *
    * Scale shape: tf is one map-side-combined aggregate over exploded
    * terms; df aggregates the (already distinct) tf pairs; the tf⋈df
    * equi-join shuffles by term; rank(≤3) engages WindowGroupLimit.
    */
  val tfidf: QueryDef = q(
    "t05_tfidf",
    """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |               FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      |  SELECT doc_id, tf.term, tf, df,
      |         CAST(tf * 1000000 * n.n // df AS BIGINT) AS score_micro
      |  FROM tf JOIN df ON tf.term = df.term, n)
      |SELECT doc_id, rn, term, tf, df, score_micro FROM (
      |  SELECT doc_id, term, tf, df, score_micro,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY score_micro DESC, term) AS rn
      |  FROM scored)
      |WHERE rn <= 3
      |ORDER BY doc_id, rn""".stripMargin) { (s, d) =>
    val docs = Tables.parallel(Tables.documents(s, d))
    // N as a broadcast 1-row relation, not a driver-side count() action —
    // one job per invocation instead of two
    val n = docs.agg(count(lit(1)).as("n_total"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // df via a second aggregate + join, NOT count() over a term window:
    // the window form computes tf once but puts every row of a hub term
    // ("the" over a 100 TB corpus) into ONE window partition — windows
    // cannot skew-split, where the join side gets AQE skew handling.
    // Bounded recompute beats an unbounded straggler.
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score_micro",
        expr("CAST(tf * 1000000 * n_total div df AS BIGINT)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("doc_id", "rn", "term", "tf", "df", "score_micro")
      .orderBy("doc_id", "rn")
  }

  /** Bigram commonality: the mean corpus document-frequency of each
    * document's distinct word bigrams — high values flag boilerplate-like
    * phrasing, low values novel text (the cheap perplexity proxy that
    * needs no model). Integer-exact: `sum(df) * 1e6 / n` in BIGINT floor
    * division, for the same libm-independence reason as t05.
    */
  val bigramCommonality: QueryDef = q(
    "t06_bigram_commonality",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |bg AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, greatest(len(ws)-1, 0)+1),
      |           i -> ws[CAST(i AS INT)]||' '||ws[CAST(i AS INT)+1])) AS b
      |       FROM w),
      |df AS (SELECT b, count(*) AS df FROM bg GROUP BY b)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       CAST(sum(df.df) * 1000000 // count(*) AS BIGINT) AS common_micro
      |FROM bg JOIN df ON bg.b = df.b
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val bg = Tables.parallel(Tables.documents(s, d))
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), explode(expr(
        """array_distinct(if(size(ws) < 2, array(),
          |   transform(sequence(1, size(ws)-1),
          |     i -> concat(ws[i-1], ' ', ws[i]))))""".stripMargin))
        .as("b"))
    // df-join form, NOT a posting list: collect_list per bigram would
    // accumulate an unbounded doc array on hub bigrams ("of the" over a
    // 100 TB corpus), where the count aggregate keeps O(1) state per key
    // — boilerplate detection needs exactly those hub keys, so the skew
    // is inherent and AQE skew-split handles the join side
    val dfreq = bg.groupBy(col("b")).agg(count(lit(1)).as("df"))
    bg.join(dfreq, "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("df")).as("sum_df"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("CAST(sum_df * 1000000 div n_bigrams AS BIGINT)").as("common_micro"))
      .orderBy("doc_id")
  }

  /** Repetition-ratio quality filter (the Gopher-rules family): per doc,
    * total vs distinct token counts and the duplicate-token fraction —
    * high ratios flag degenerate/boilerplate text before training. Pure
    * per-row array arithmetic (native collection expressions, no lambdas,
    * no shuffle but the deterministic ORDER BY); the one division runs
    * over exact integers on both engines. Emitted in micro-units as a
    * BIGINT too (`rep_micro`) so downstream threshold filters can stay
    * integer-exact.
    */
  val repetition: QueryDef = q(
    "t07_repetition",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |SELECT doc_id,
      |       len(ws) AS n_tokens,
      |       len(list_distinct(ws)) AS n_distinct,
      |       (len(ws) - len(list_distinct(ws))) * 1.0 / len(ws) AS repetition,
      |       CAST((len(ws) - len(list_distinct(ws))) * 1000000 // len(ws) AS BIGINT) AS rep_micro
      |FROM w
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.parallel(Tables.documents(s, d))
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        ((col("n_tokens") - col("n_distinct")) * lit(1.0) / col("n_tokens"))
          .as("repetition"),
        expr("(n_tokens - n_distinct) * 1000000 div n_tokens").as("rep_micro"))
      .orderBy("doc_id")
  }

  /** Composite Gopher-style quality gate: one scan-fused pass computing
    * the t02 surface ratios and the t07 repetition ratio, with pass/fail
    * thresholds in the Gopher-rules family (Rae et al. 2021, Gopher
    * appendix A): word-count window, mean word length window, minimum
    * alphabetic ratio, repetition ceiling. Returns `docs` plus the metric
    * columns and a `quality_pass` boolean — callers filter or route on it.
    *
    * Scale shape: every metric is row-local array/regex arithmetic, so the
    * whole gate fuses into the scan projection — zero shuffles, streaming
    * at read rate, which is what lets it front a 100 TB ingest pipeline.
    */
  def qualityFilter(docs: DataFrame,
      minWords: Int = 5, maxWords: Int = 1000000,
      minMeanWl: Double = 2.0, maxMeanWl: Double = 12.0,
      minAlphaRatio: Double = 0.5, maxRepetition: Double = 0.5): DataFrame = {
    // unlike the t02 query (which mirrors its oracle on a lowercase
    // single-spaced corpus), this gate must hold on real text: words
    // split on whitespace RUNS with empty tokens dropped (split keeps a
    // leading "" on whitespace-initial text, which would inflate n_words
    // and skew mean_wl/repetition), and the alphabetic ratio is
    // case-insensitive, so ALL-CAPS or doubled-space documents are not
    // spuriously rejected
    val wsSql = "filter(split(text, '\\\\s+'), x -> x != '')"
    val ws = expr(wsSql)
    val nWords = size(ws)
    // 0L accumulator: an INT sum overflows past 2 GiB of word chars.
    // Zero denominators (empty/whitespace-only text) are guarded to NULL —
    // ANSI mode refuses the division, and a NaN would compare as larger
    // than every threshold (Spark NaN ordering), passing gates it must fail
    val meanWl = when(nWords === 0, lit(null).cast("double")).otherwise(
      expr(s"aggregate($wsSql, 0L, (a, x) -> a + length(x))")
        .cast("double") / nWords)
    val alphaRatio = when(length(col("text")) === 0, lit(null).cast("double"))
      .otherwise(
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
          length(col("text")))
    val repetition = when(nWords === 0, lit(null).cast("double")).otherwise(
      (nWords - size(array_distinct(ws))).cast("double") / nWords)
    docs
      .withColumn("n_words", nWords)
      .withColumn("mean_wl", meanWl)
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("repetition", repetition)
      // empty/whitespace-only text makes the ratios null (0/0) — such a
      // document must FAIL the gate explicitly, and boolean readers must
      // never see a null (a getAs[Boolean] on null NPEs)
      .withColumn("quality_pass", coalesce(
        col("n_words").between(minWords, maxWords) &&
          col("mean_wl").between(minMeanWl, maxMeanWl) &&
          col("alpha_ratio") >= minAlphaRatio &&
          col("repetition") <= maxRepetition, lit(false)))
  }

  /** t08: trigram NOVELTY — the complement signal to t06's boilerplate
    * score: what fraction of a doc's distinct trigram shingles appear
    * NOWHERE else in the corpus (df = 1). High novelty marks original
    * content; near-zero novelty marks templated/duplicated text that the
    * dedup family should be pointed at. All integer arithmetic (counts +
    * one exact-operand division).
    *
    * Scale shape: the same bounded inverted-index prefix as d05 —
    * row-local distinct shingles (no dedup shuffle), an O(1)-state df
    * count keyed on the 64-bit shingle hash (same collision posture),
    * occurrence rows re-join the df table on the hash, one per-doc
    * aggregate. No lists anywhere. The corpus IS shingled twice (df side
    * + occurrence side — the aggregate sits below its exchange, so the
    * two subtrees cannot share one): the alternative, a count-over-window
    * on the hash, scans once but buffers each hash group in the window
    * sort, which a hub shingle makes unbounded — same deliberate trade as
    * d05/t05.
    */
  val novelty: QueryDef = q(
    "t08_novelty",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |tri AS (SELECT DISTINCT doc_id,
      |          unnest(list_transform(range(1, greatest(len(ws)-2, 0)+1),
      |            i -> ws[CAST(i AS INT)]||' '||ws[CAST(i AS INT)+1]||' '||ws[CAST(i AS INT)+2])) AS s
      |        FROM w),
      |df AS (SELECT s, count(*) AS c FROM tri GROUP BY s)
      |SELECT doc_id, count(*) AS n_tri,
      |       count(CASE WHEN c = 1 THEN 1 END) AS n_unique,
      |       count(CASE WHEN c = 1 THEN 1 END) * 1.0 / count(*) AS novelty
      |FROM tri JOIN df USING (s)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val tri = Tables.parallel(Tables.documents(s, d).select("doc_id", "text"))
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), explode(expr(
        """array_distinct(if(size(ws) < 3, array(),
          |   transform(sequence(1, size(ws)-2),
          |     i -> concat(ws[i-1], ' ', ws[i], ' ', ws[i+1]))))""".stripMargin))
        .as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val dfreq = tri.groupBy(col("h")).agg(count(lit(1)).as("c"))
    tri.join(dfreq, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tri"),
        count(when(col("c") === 1, 1)).as("n_unique"))
      .select(col("doc_id"), col("n_tri"), col("n_unique"),
        (col("n_unique") * lit(1.0) / col("n_tri")).as("novelty"))
      .orderBy("doc_id")
  }

  /** t09: heavy hitters — the top-10 terms per language with count and
    * corpus share (the vocabulary skew / Zipf-head audit run before
    * choosing tokenizer vocabularies or boilerplate stoplists). Ties break
    * on the term text, so ranks are engine-independent.
    *
    * Scale shape: explode → (lang, term) count with map-side partial
    * aggregation (the only corpus-scale shuffle, keyed on the pair);
    * per-language totals are a SECOND tiny aggregate over the count table
    * (K rows out), broadcast back — NOT a sum-over-window, which would
    * buffer every distinct term of a language inside one window partition.
    * The top-10 row_number window runs on the counts table and engages
    * WindowGroupLimit, so each partition pre-trims to 10 rows before the
    * final per-language sort. Share is integer micro-units (exact BIGINT
    * floor division, t05's libm-independence rule).
    */
  val heavyHitters: QueryDef = q(
    "t09_heavy_hitters",
    """WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS term
      |           FROM documents),
      |c AS (SELECT lang, term, count(*) AS n FROM w GROUP BY 1, 2),
      |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang FROM c GROUP BY 1)
      |SELECT lang, rn, term, n,
      |       CAST(n * 1000000 // n_lang AS BIGINT) AS share_micro
      |FROM (SELECT lang, term, n,
      |             row_number() OVER (PARTITION BY lang
      |                                ORDER BY n DESC, term) AS rn
      |      FROM c) r
      |JOIN tot USING (lang)
      |WHERE rn <= 10
      |ORDER BY lang, rn""".stripMargin) { (s, d) =>
    val terms = Tables.parallel(Tables.documents(s, d))
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
    val counts = terms.groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("lang"))
      .agg(sum(col("n")).as("n_lang"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("term"))
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .join(broadcast(totals), "lang")
      .select(col("lang"), col("rn"), col("term"), col("n"),
        expr("CAST(n * 1000000 div n_lang AS BIGINT)").as("share_micro"))
      .orderBy("lang", "rn")
  }

  /** Pattern redaction — the PII-scrubbing primitive of a curation
    * pipeline: rewrite every match of each (name, regex, replacement)
    * rule and report per-rule match counts alongside the redacted text.
    * Row-local regex work (scan-fused, zero shuffle); rules apply in the
    * given order, each over the previous rule's output, so overlapping
    * patterns behave deterministically.
    *
    * The default rule set covers the standard structured-PII surface:
    * emails, international/US phone numbers, IPv4 addresses, and SSNs.
    * Patterns deliberately stay in the RE2-compatible subset (no
    * backreferences/lookaround) so the same strings run on Spark (Java
    * regex) and any RE2-based engine.
    */
  val piiRules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}", "<PHONE>"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"))

  /** Applies `rules` to `column`: adds `n_<name>` match counts and a
    * `redacted` column with all rules rewritten, in order.
    */
  def redact(df: DataFrame, column: Column,
      rules: Seq[(String, String, String)] = piiRules): DataFrame = {
    val counted = rules.foldLeft(df) { case (acc, (name, pat, _)) =>
      acc.withColumn(s"n_$name",
        size(regexp_extract_all(column, lit(pat), lit(0))).cast("long"))
    }
    counted.withColumn("redacted",
      rules.foldLeft(column) { case (acc, (_, pat, rep)) =>
        regexp_replace(acc, pat, rep)
      })
  }

  /** t10: redaction audit over `events.props` — per event type, how many
    * rows matched, total matches, the signed character delta (negative
    * when the placeholder outgrows the match), and an
    * order-independent checksum of the rewritten strings (summed md5
    * slice — the cross-engine hash idiom), so the oracle verifies every
    * REWRITTEN byte, not just the counts. The registered rule redacts
    * digit runs (the synthetic corpus carries no real PII — the full PII
    * rule set is exercised on planted fixtures in TextOpsSpec; this query
    * proves the rewrite/count/checksum plumbing on data where matches are
    * dense). Same scan-fused shape as the library call: regex per row,
    * one tiny aggregate.
    */
  val redactionAudit: QueryDef = q(
    "t10_redaction_audit",
    """WITH r AS (
      |  SELECT event_type, props,
      |         len(regexp_extract_all(props, '[0-9]+')) AS n_num,
      |         regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS redacted
      |  FROM events)
      |SELECT event_type,
      |       count(*) AS n_rows,
      |       count(CASE WHEN n_num > 0 THEN 1 END) AS n_matched,
      |       CAST(sum(n_num) AS BIGINT) AS n_matches,
      |       CAST(sum(length(props) - length(redacted)) AS BIGINT) AS chars_delta,
      |       CAST(sum(CAST(CAST('0x' || substr(md5(redacted), 1, 12) AS BIGINT)
      |           AS DECIMAL(38,0))) % 4611686018427387904 AS BIGINT) AS redacted_sum
      |FROM r
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val r = redact(Tables.events(s, d), col("props"),
      Seq(("num", "[0-9]+", "<NUM>")))
    r.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("n_num") > 0, 1)).as("n_matched"),
        sum(col("n_num")).as("n_matches"),
        sum(length(col("props")) - length(col("redacted"))).as("chars_delta"),
        // DECIMAL(38,0) accumulator: the 48-bit slice sums past Long range
        // around 3e4 rows/group — sf10's ~20M-row event types overflowed
        // the long sum (ANSI abort); decimal-38 is exact to ~3e23 rows.
        // EMIT int64-safe: checksums >2^53 carried in a DECIMAL output
        // column go through a float64-lossy transport in some harnesses
        // (r12 regression) — reduce mod 2^62 and cast to BIGINT, which
        // every transport carries exactly. Order-independent either way.
        (sum(conv(substring(md5(col("redacted")), 1, 12), 16, 10)
          .cast("decimal(38,0)")) % lit(4611686018427387904L))
          .cast("long").as("redacted_sum"))
      .orderBy("event_type")
  }

  /** Per-doc blocklist hit profile: token hits (with multiplicity) against
    * a term blocklist, plus an integer-exact rate flag
    * `hits * 20 >= n_tokens` (≥5% of tokens blocklisted) — the wordlist
    * content filter every curation pipeline runs before training. Row-local
    * array arithmetic; no shuffle.
    */
  def blocklistProfile(df: DataFrame, terms: Seq[String]): DataFrame = {
    val ws = split(col("text"), " ")
    df.withColumn("n_tokens", size(ws).cast("long"))
      .withColumn("n_hits",
        expr(s"size(filter(split(text, ' '), x -> x IN (${inList(terms)})))")
          .cast("long"))
      .withColumn("flagged", col("n_hits") * 20 >= col("n_tokens"))
  }

  /** t11: blocklist filter audit — per language, how many docs the 5%-rate
    * wordlist filter flags and the hit mass. The blocklist itself is a
    * 3-term demo set drawn from the corpus vocabulary (a real pipeline
    * plugs its own list into [[blocklistProfile]]); all arithmetic is
    * integer counts and one exact rate comparison, so the oracle match is
    * bit-for-bit. Scan-fused per-row work, one aggregate exchange.
    */
  val blocklistAudit: QueryDef = q(
    "t11_blocklist_audit",
    """WITH h AS (
      |  SELECT lang,
      |         len(string_split(text, ' ')) AS n_tokens,
      |         len(list_filter(string_split(text, ' '),
      |             x -> x IN ('slow', 'error', 'merge'))) AS n_hits
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |       count(CASE WHEN n_hits * 20 >= n_tokens THEN 1 END) AS n_flagged,
      |       CAST(sum(n_hits) AS BIGINT) AS total_hits,
      |       max(n_hits) AS max_hits
      |FROM h
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    blocklistProfile(Tables.parallel(Tables.documents(s, d)), Seq("slow", "error", "merge"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("flagged"), 1)).as("n_flagged"),
        sum(col("n_hits")).as("total_hits"),
        max(col("n_hits")).as("max_hits"))
      .orderBy("lang")
  }

  /** Number of hash buckets in the demo classifier's weight table. A
    * production fastText/CCNet-style model uses 2^20+ buckets; the lookup
    * below is bucket-count-agnostic (the weight array ships in the task
    * binary as a literal — fine to a few MB; past that, switch the
    * element_at to a broadcast map-side join on `b`).
    */
  val ClsBuckets = 512
  val ClsBias = -37L

  /** The literal weight fixture: a seeded affine-congruential profile in
    * [-998, 998]. A trained model drops in as any other IndexedSeq[Long]
    * of micro-units — the scoring plan is identical.
    */
  val clsWeights: IndexedSeq[Long] =
    (0 until ClsBuckets).map(i => ((i.toLong * 2654435761L + 1013904223L) % 1997L) - 998L)

  // row-local feature extraction: 'u:'-prefixed unigrams plus
  // 'b:'-prefixed word bigrams, exactly mirroring the oracle CTEs
  private val clsFeatsSql: String =
    """concat(
      |  transform(split(text, ' '), x -> concat('u:', x)),
      |  CASE WHEN size(split(text, ' ')) < 2 THEN cast(array() as array<string>)
      |       ELSE transform(sequence(1, size(split(text, ' ')) - 1),
      |              i -> concat('b:', element_at(split(text, ' '), i), ' ',
      |                          element_at(split(text, ' '), i + 1))) END)"""
      .stripMargin.replaceAll("\\s+", " ")

  /** Hashed-n-gram linear quality classifier (the fastText / CCNet / DCLM
    * family, public constructions): each unigram and word-bigram feature
    * hashes into one of [[ClsBuckets]] weight buckets
    * (md5 → 24-bit int → mod), and the document score is
    * `bias + Σ w[bucket(f)]` in exact BIGINT micro-units — no floats, so
    * the margin reproduces bit-for-bit on any engine and the keep/drop
    * decision is deterministic under retries.
    *
    * Scale shape: feature extraction, hashing, and the weight lookup are
    * ONE row-local array-aggregate fused into the scan projection (the
    * weights ride along as a literal array in the task binary — nothing
    * is broadcast, nothing shuffles). At 100 TB this streams at read
    * rate, exactly like [[qualityFilter]], and composes with it as a
    * second gate (see PipelineDemo).
    */
  def classifierScore(df: DataFrame,
      weights: IndexedSeq[Long] = clsWeights, bias: Long = ClsBias): DataFrame = {
    require(weights.nonEmpty, "empty weight table")
    val warr = weights.mkString("array(", "L, ", "L)")
    val bucket =
      s"cast(cast(conv(substr(md5(f), 1, 6), 16, 10) as bigint) % ${weights.size} as int)"
    df.withColumn("n_feats", expr(s"cast(size($clsFeatsSql) as bigint)"))
      .withColumn("score_micro",
        expr(s"aggregate($clsFeatsSql, ${bias}L, (a, f) -> a + element_at($warr, $bucket + 1))"))
      .withColumn("label",
        when(col("score_micro") >= 0, lit("keep")).otherwise(lit("drop")))
  }

  /** t12: the classifier over `documents`, full-oracle (the DuckDB side
    * re-derives every feature, bucket, and weight from the same literal
    * fixture and must agree on every margin bit).
    */
  val classifier: QueryDef = q(
    "t12_classifier_score", {
      val wtValues = clsWeights.zipWithIndex
        .map { case (w, i) => s"($i, $w)" }.mkString(", ")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |feats AS (
         |  SELECT doc_id, 'u:' || unnest(ws) AS f FROM w
         |  UNION ALL
         |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws)-1, 0)+1),
         |    i -> 'b:'||ws[CAST(i AS INT)]||' '||ws[CAST(i AS INT)+1])) AS f FROM w),
         |wt(b, wgt) AS (VALUES $wtValues),
         |s AS (SELECT doc_id,
         |        CAST('0x'||substr(md5(f),1,6) AS BIGINT) % $ClsBuckets AS b
         |      FROM feats),
         |agg AS (SELECT doc_id, count(*) AS n_feats, sum(wgt) AS wsum
         |        FROM s JOIN wt USING (b) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(n_feats, 0) AS BIGINT) AS n_feats,
         |  CAST($ClsBias + coalesce(wsum, 0) AS BIGINT) AS score_micro,
         |  CASE WHEN $ClsBias + coalesce(wsum, 0) >= 0 THEN 'keep' ELSE 'drop' END AS label
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    classifierScore(Tables.parallel(Tables.documents(s, d)))
      .select("doc_id", "n_feats", "score_micro", "label")
      .orderBy("doc_id")
  }

  /** t13: LM-fluency scoring — the CCNet-family filter (Wenzek et al.
    * 2020 score documents by LM perplexity; the MLE form of that signal
    * is the mean conditional bigram probability). Per occurrence i:
    * `p_micro = floor(1e6 · c2(w_{i-1} w_i) / c1(w_{i-1}))` where c2 is
    * the corpus-wide bigram OCCURRENCE count and c1 the prefix occurrence
    * count (c1 = Σ_x c2(w x), so Σ_x P(x|w) = 1 exactly); the document
    * score is the floor-mean of its occurrences. All BIGINT — no logs, no
    * libm — so the score reproduces bit-for-bit (1e6·c2 stays inside
    * BIGINT to ~10^12 bigram occurrences, past the 100 TB design point
    * per shard). Distinct from t06, which measures DOCUMENT-frequency
    * commonality of distinct bigrams; this is the occurrence-level
    * language-model likelihood. A reference-corpus model (CCNet trains on
    * Wikipedia) drops in by substituting the c2 table.
    *
    * Scale shape: the c2 count table (the trained LM — CCNet trains its
    * LM once, too) is MATERIALIZED via localCheckpoint: vocabulary-sized,
    * not corpus-sized, and without it every reference re-expands the
    * corpus explode (pruning makes the exchanges non-identical, so
    * exchange reuse cannot deduplicate them — measured 6 Generates in the
    * AQE-final plan). With it the corpus explodes exactly twice (count
    * pass + probe pass, the t05/t06 family shape), c1 re-aggregates the
    * materialized table, and the probe joins are hub-skewed by nature
    * (that's the signal) and AQE-skew-handled. Docs without bigrams score
    * the -1 sentinel.
    */
  val lmFluency: QueryDef = q(
    "t13_lm_fluency",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |occ AS (SELECT doc_id,
      |          unnest(list_transform(range(1, greatest(len(ws)-1, 0)+1),
      |            i -> ws[CAST(i AS INT)]||' '||ws[CAST(i AS INT)+1])) AS b
      |        FROM w),
      |c2 AS (SELECT b, count(*) AS n2 FROM occ GROUP BY b),
      |c1 AS (SELECT split_part(b, ' ', 1) AS w1, sum(n2) AS n1
      |       FROM c2 GROUP BY 1),
      |sc AS (SELECT doc_id, CAST(n2 * 1000000 // n1 AS BIGINT) AS p_micro
      |       FROM occ JOIN c2 USING (b)
      |       JOIN c1 ON split_part(occ.b, ' ', 1) = c1.w1),
      |agg AS (SELECT doc_id, count(*) AS n_bigrams,
      |          CAST(sum(p_micro) // count(*) AS BIGINT) AS fluency_micro
      |        FROM sc GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  CAST(coalesce(fluency_micro, -1) AS BIGINT) AS fluency_micro
      |FROM documents d LEFT JOIN agg USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    lmFluencyScore(Tables.parallel(Tables.documents(s, d))).orderBy("doc_id")
  }

  /** Library form of t13: (doc_id, n_bigrams, fluency_micro) per input
    * document (the scale notes live on [[lmFluency]]). Substitute a
    * reference-corpus model by pre-computing the c2 table and joining it
    * in place of this self-corpus MLE.
    */
  def lmFluencyScore(docs: DataFrame): DataFrame = {
    val occ = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), explode(expr(
        """if(size(ws) < 2, array(),
          |   transform(sequence(1, size(ws)-1),
          |     i -> concat(ws[i-1], ' ', ws[i])))""".stripMargin)).as("b"))
      .withColumn("w1", substring_index(col("b"), " ", 1))
    val c2 = occ.groupBy(col("b")).agg(count(lit(1)).as("n2"))
      .localCheckpoint()
    val c1 = c2.withColumn("w1", substring_index(col("b"), " ", 1))
      .groupBy(col("w1")).agg(sum(col("n2")).as("n1"))
    val agg = occ.join(c2, "b").join(c1, "w1")
      .select(col("doc_id"),
        expr("CAST(n2 * 1000000 div n1 AS BIGINT)").as("p_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_micro")).as("sp"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("CAST(sp div n_bigrams AS BIGINT)").as("fluency_micro"))
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("fluency_micro"), lit(-1L)).as("fluency_micro"))
  }

  /** Overlapping token-window chunking — the retrieval/embedding prep
    * step every RAG or embedding-training pipeline runs before encoding:
    * each document becomes ceil(n_tokens / stride) chunks of up to
    * `window` tokens, consecutive chunks overlapping by `window - stride`
    * tokens so no span longer than the overlap is ever split across a
    * chunk boundary without appearing whole in one of them. Chunk ids are
    * `(doc_id, chunk_idx)` with `chunk_idx = start / stride` — stable
    * under re-runs and independent of partitioning.
    *
    * 100 TB shape: a single Generate (sequence + explode) fused into the
    * scan — zero exchanges, zero state; fan-out per row is bounded by
    * n_tokens / stride, so output size is a fixed ~window/stride multiple
    * of the corpus. Feeds [[graft.operators.Similarity]] encoders or the
    * p04 sequence packer directly.
    */
  def chunk(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"chunk: need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
          .as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_idx"),
        least(lit(window), size(col("toks")) - col("start")).cast("long")
          .as("n_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(window)), " ")
          .as("chunk_text"))
  }

  /** t14: RAG chunking audit — every (doc, chunk) with its token count and
    * exact chunk text (window 64, stride 48, 16-token overlap). The chunk
    * text itself is in the output, so the oracle match pins the exact
    * slicing/joining semantics, not just the counts.
    */
  val chunking: QueryDef = q(
    "t14_chunk",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (
      |  SELECT doc_id, toks,
      |         unnest(generate_series(0, len(toks) - 1, 48)) AS start
      |  FROM t)
      |SELECT doc_id,
      |       start // 48 AS chunk_idx,
      |       CAST(least(64, len(toks) - start) AS BIGINT) AS n_tokens,
      |       array_to_string(list_slice(toks, start + 1, start + 64), ' ')
      |         AS chunk_text
      |FROM s""".stripMargin) { (s, d) =>
    chunk(Tables.parallel(Tables.documents(s, d)), window = 64, stride = 48)
  }

  /** Per-row character/word diversity: distinct-char count, char-histogram
    * collision probability (the Simpson index — exp of the negated Rényi-2
    * entropy, the standard "is this machine-generated noise or boilerplate"
    * signal), word count, distinct-word count, and type-token ratio.
    *
    * Everything is computed per-row with array lambdas — at 100 TB this is
    * an embarrassingly parallel map fused into the scan, where an
    * explode-and-groupBy formulation would shuffle one row PER CHARACTER
    * (a ~300× row amplification on this corpus). All histogram sums are
    * exact integer arithmetic; each double column is a single division of
    * exact longs, so the values are bit-identical on any IEEE engine (the
    * reason this uses collision probability rather than Shannon entropy,
    * whose per-term log2 is not correctly-rounded-guaranteed across libms).
    */
  val charDiversity: QueryDef = q(
    "t15_char_diversity",
    """WITH chars AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
      |counts AS (
      |  SELECT doc_id, c, count(*) AS cnt FROM chars GROUP BY doc_id, c),
      |cagg AS (
      |  SELECT doc_id,
      |         CAST(count(*) AS BIGINT) AS nd_chars,
      |         CAST(sum(cnt * cnt) AS BIGINT) AS sq,
      |         CAST(sum(cnt) AS BIGINT) AS n
      |  FROM counts GROUP BY doc_id),
      |words AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |           AS nd_words
      |  FROM documents)
      |SELECT cagg.doc_id AS doc_id, nd_chars,
      |       CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
      |         AS char_collision_p,
      |       n_words, nd_words,
      |       CAST(nd_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS ttr
      |FROM cagg JOIN words ON words.doc_id = cagg.doc_id
      |ORDER BY cagg.doc_id""".stripMargin) { (s, d) =>
    // Spark's split keeps a trailing zero-width match ("" element) that
    // DuckDB's string_split drops — filter it so both sides see pure chars.
    val chars = expr("filter(split(text, ''), x -> x <> '')")
    val words = split(col("text"), " ")
    Tables.parallel(Tables.documents(s, d))
      .select(col("doc_id"), chars.as("ch"), words.as("ws"))
      .select(col("doc_id"),
        expr("""aggregate(
                |  transform(array_distinct(ch),
                |            c -> CAST(size(filter(ch, x -> x = c)) AS BIGINT)),
                |  CAST(0 AS BIGINT), (acc, x) -> acc + x * x)""".stripMargin)
          .as("sq"),
        size(array_distinct(col("ch"))).cast("long").as("nd_chars"),
        size(col("ch")).cast("long").as("n"),
        size(col("ws")).cast("long").as("n_words"),
        size(array_distinct(col("ws"))).cast("long").as("nd_words"))
      .select(col("doc_id"), col("nd_chars"),
        (col("sq").cast("double") /
          (col("n").cast("double") * col("n").cast("double")))
          .as("char_collision_p"),
        col("n_words"), col("nd_words"),
        (col("nd_words").cast("double") / col("n_words").cast("double"))
          .as("ttr"))
      .orderBy("doc_id")
  }

  /** t16: TextRank keyword extraction (Mihalcea & Tarau 2004) — corpus
    * keywords as PageRank centrality over the word CO-OCCURRENCE graph:
    * adjacent-token pairs become symmetric edges between distinct words,
    * and [[Similarity.pageRankInt]] runs its integer-exact propagation
    * over the vocabulary graph (3 iterations, scaled longs — the s13
    * arithmetic on a different graph, which is the point: the graph pass
    * is a REUSABLE operator, not a per-query special).
    *
    * Word → node-id is the first 60 bits of md5 (computable identically
    * in both engines; a collision would merge nodes IDENTICALLY on both
    * sides, so the gate is collision-robust). Scale shape: edge build is
    * explode → distinct (vocabulary-scale, not corpus-scale, after the
    * distinct); each PageRank iteration is one join + one aggregate on
    * the vocab graph; top-20 plans as TakeOrdered, no global sort.
    */
  val textrankKeywords: QueryDef = {
    def unroll(i: Int): String =
      s"""c$i AS (SELECT ed.dst, CAST(sum(r${i - 1}.r // od.d) AS BIGINT) AS s
         |       FROM ed JOIN r${i - 1} ON r${i - 1}.id = ed.src
         |               JOIN od ON od.src = ed.src
         |       GROUP BY ed.dst),
         |r$i AS (SELECT nid.id AS id, nid.w AS w,
         |              CAST(150000000 + (85 * COALESCE(c$i.s, 0)) // 100 AS BIGINT) AS r
         |       FROM nid LEFT JOIN c$i ON c$i.dst = nid.id)""".stripMargin
    q("t16_textrank_keywords",
      s"""WITH wd AS (SELECT string_split(text, ' ') AS ws FROM documents),
         |e0 AS (SELECT ws[CAST(i AS INT)] AS wa, ws[CAST(i AS INT)+1] AS wb
         |       FROM (SELECT ws, unnest(range(1, greatest(len(ws)-1, 0)+1)) AS i
         |             FROM wd)
         |       WHERE ws[CAST(i AS INT)] <> ws[CAST(i AS INT)+1]),
         |eu AS (SELECT DISTINCT wa, wb FROM (
         |         SELECT wa, wb FROM e0 UNION ALL SELECT wb AS wa, wa AS wb FROM e0)),
         |nodes AS (SELECT DISTINCT unnest(ws) AS w FROM wd),
         |nid AS (SELECT w, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS id
         |        FROM nodes),
         |ed AS (SELECT a.id AS src, b.id AS dst
         |       FROM eu JOIN nid a ON a.w = eu.wa JOIN nid b ON b.w = eu.wb),
         |od AS (SELECT src, count(*) AS d FROM ed GROUP BY src),
         |r0 AS (SELECT id, w, CAST(1000000000 AS BIGINT) AS r FROM nid),
         |${unroll(1)},
         |${unroll(2)},
         |${unroll(3)}
         |SELECT w AS word, r AS rank FROM r3
         |ORDER BY rank DESC, word LIMIT 20""".stripMargin) { (s, d) =>
      val wd = Tables.parallel(Tables.documents(s, d).select("text"))
        .withColumn("ws", split(col("text"), " "))
      val e0 = wd
        .select(col("ws"), explode(expr(
          "if(size(ws) < 2, array(), sequence(1, size(ws)-1))")).as("i"))
        .select(expr("ws[i-1]").as("wa"), expr("ws[i]").as("wb"))
        .filter(col("wa") =!= col("wb"))
      val eu = e0.unionAll(e0.select(col("wb").as("wa"), col("wa").as("wb")))
        .distinct()
      def wid(c: String) =
        expr(s"CAST(conv(substr(md5($c), 1, 15), 16, 10) AS BIGINT)")
      // the vocab tables are re-read every PageRank iteration (edges 3×
      // + out-degree, nodes per rank rebuild): materialize once, keep
      // lineage flat — the same s13 move, measured 2.2 s → sub-second
      // independent materializations (vocab ids vs edge list) — overlapped
      // (guide §2.6) instead of two sequential checkpoint barriers
      val (nid, edges) = graft.Par.both(
        () => wd.select(explode(col("ws")).as("w")).distinct()
          .select(col("w"), wid("w").as("id"))
          .localCheckpoint(),
        () => eu.select(wid("wa").as("src"), wid("wb").as("dst"))
          .localCheckpoint())
      val ranks = Similarity.pageRankInt(nid.select("id"), edges, iters = 3)
      nid.join(ranks, "id")
        .select(col("w").as("word"), col("rank"))
        .orderBy(col("rank").desc, col("word")).limit(20)
    }
  }

  /** t17: readability + lexical-diversity profile per document — Flesch
    * reading ease with a vowel-group syllable heuristic, plus type-token
    * ratio. Pure per-row regex/array arithmetic fused into the scan (the
    * sentence count degenerates to 1 on this punctuation-free corpus;
    * greatest(·,1) states the real-corpus contract). The Flesch formula is
    * one shared double expression, so parity is bit-exact.
    */
  val readability: QueryDef = q(
    "t17_readability",
    """WITH t AS (
      |  SELECT doc_id,
      |    len(string_split(text, ' ')) AS n_words,
      |    len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |    len(regexp_extract_all(text, '[aeiouy]+')) AS n_syll,
      |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sent
      |  FROM documents)
      |SELECT doc_id, n_words, n_distinct, n_syll, n_sent,
      |  206.835 - 1.015 * (n_words / n_sent)
      |          - 84.6 * (n_syll / n_words) AS flesch,
      |  n_distinct / n_words AS ttr
      |FROM t
      |WHERE n_words > 0
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.parallel(Tables.documents(s, d).select("doc_id", "text"))
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct"),
        size(regexp_extract_all(col("text"), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("n_syll"),
        greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))), lit(1))
          .cast("long").as("n_sent"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("n_words"), col("n_distinct"), col("n_syll"),
        col("n_sent"),
        (lit(206.835) - lit(1.015) * (col("n_words") / col("n_sent"))
          - lit(84.6) * (col("n_syll") / col("n_words"))).as("flesch"),
        (col("n_distinct") / col("n_words")).as("ttr"))
      .orderBy("doc_id")
  }

  /** t18: collocation strength — corpus-level top-20 adjacent word pairs
    * by LIFT, `P(x,y)/(P(x)·P(y))` with a min-support floor (the PMI
    * ranking without the log: lift is the same order as PMI, and log2
    * would cost cross-libm determinism for nothing — the p11/t05
    * rational-surrogate discipline). Every operand is an exact integer
    * count; the lift double is ONE shared expression tree, so ordering
    * and values are bit-identical across engines.
    *
    * Scale shape: token counts and pair counts are plain hash aggregates
    * (O(1) state per key); the unigram joins key on the word — vocab is
    * sublinear in corpus, AQE broadcasts it when it fits and skew-splits
    * hub words when it doesn't; top-20 is TakeOrdered, never a global
    * sort.
    */
  val collocations: QueryDef = q(
    "t18_collocations",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |tok AS (SELECT unnest(ws) AS t FROM w),
      |uni AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
      |bg AS (SELECT ws[CAST(i AS INT)] AS x, ws[CAST(i AS INT)+1] AS y
      |       FROM (SELECT ws, unnest(range(1, greatest(len(ws)-1, 0)+1)) AS i
      |             FROM w)),
      |pc AS (SELECT x, y, count(*) AS cxy FROM bg GROUP BY x, y),
      |np AS (SELECT count(*) AS n_pair FROM bg),
      |lifted AS (
      |  SELECT pc.x, pc.y, pc.cxy,
      |    (CAST(np.n_pair AS DOUBLE) * pc.cxy)
      |      / (CAST(ux.c AS DOUBLE) * uy.c) AS lift
      |  FROM pc, np
      |  JOIN uni ux ON ux.t = pc.x
      |  JOIN uni uy ON uy.t = pc.y
      |  WHERE pc.cxy >= 40)
      |SELECT x, y, cxy, lift FROM lifted
      |ORDER BY lift DESC, x, y LIMIT 20""".stripMargin) { (s, d) =>
    val w = Tables.parallel(Tables.documents(s, d))
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val tok = w.select(explode(col("ws")).as("t"))
    val uni = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val bg = w.select(explode(expr(
        """if(size(ws) < 2, array(),
          |   transform(sequence(1, size(ws)-1),
          |     i -> struct(ws[i-1] AS x, ws[i] AS y)))""".stripMargin)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    val pc = bg.groupBy("x", "y").agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= 40)
    val np = bg.agg(count(lit(1)).as("n_pair"))
    pc.join(broadcast(np))
      .join(uni.select(col("t").as("x"), col("c").as("cx")), "x")
      .join(uni.select(col("t").as("y"), col("c").as("cy")), "y")
      .select(col("x"), col("y"), col("cxy"),
        ((col("n_pair").cast("double") * col("cxy")) /
          (col("cx").cast("double") * col("cy"))).as("lift"))
      .orderBy(col("lift").desc, col("x"), col("y"))
      .limit(20)
  }

  /** t19: corpus vocabulary profile per language — token mass, type
    * count, hapax-legomenon count, the head word's frequency, and the
    * type-token ratio. These are the Zipf/Heaps-law diagnostics used to
    * spot degenerate corpora before training: synthetic/templated text
    * shows an abnormally low TTR and a fat head share; OCR noise shows a
    * hapax explosion.
    *
    * All counts are exact integers from ONE token-level aggregate; the
    * two ratios are each a single double division (deterministic, the
    * [[Compat]] discipline). Scale shape: `explode` is scan-fused (no
    * pre-shuffle), the (lang, word) aggregate combines map-side — the
    * exchange carries vocabulary-sized partials, not the token stream —
    * and the per-lang rollup is |vocab| rows into |langs| cells. This is
    * the word-count plan, which is exactly what a vocabulary profile
    * should cost at 100 TB.
    */
  val vocabProfile: QueryDef = q(
    "t19_vocab_zipf",
    """WITH w AS (
      |  SELECT lang, unnest(regexp_extract_all(text, '[a-z]+')) AS word
      |  FROM documents),
      |wc AS (SELECT lang, word, count(*) AS n FROM w GROUP BY 1, 2)
      |SELECT lang,
      |  CAST(sum(n) AS BIGINT) AS n_tokens,
      |  count(*) AS n_types,
      |  count(*) FILTER (WHERE n = 1) AS n_hapax,
      |  max(n) AS top_freq,
      |  CAST(count(*) AS DOUBLE) / CAST(CAST(sum(n) AS BIGINT) AS DOUBLE)
      |    AS ttr,
      |  CAST(max(n) AS DOUBLE) / CAST(CAST(sum(n) AS BIGINT) AS DOUBLE)
      |    AS top_share
      |FROM wc GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val w = Tables.parallel(Tables.documents(s, d))
      .select(col("lang"),
        explode(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)))
          .as("word"))
    val wc = w.groupBy("lang", "word").agg(count(lit(1)).as("n"))
    wc.groupBy("lang")
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        count(when(col("n") === 1, 1)).as("n_hapax"),
        max(col("n")).as("top_freq"))
      .select(col("lang"), col("n_tokens"), col("n_types"), col("n_hapax"),
        col("top_freq"),
        (col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        (col("top_freq").cast("double") / col("n_tokens").cast("double"))
          .as("top_share"))
      .orderBy("lang")
  }

  /** t20: classifier CONFUSION MATRIX against the labeled `lang` column —
    * the audit that turns t01's classifier into a shippable quality gate
    * (per-(label, prediction) counts and the within-label share). On a
    * real corpus this is how drift and systematic misrouting surface; a
    * degenerate diagonal or a dominant off-diagonal cell is the signal to
    * retrain before the classifier gates data.
    *
    * Scale shape: scoring is the same scan-fused map as t01 (profiles are
    * literal broadcast keyword lists); the cross-tab is one aggregate
    * over a |labels| × |profiles| keyspace, and the within-label totals
    * ride a broadcast join of |labels| rows. No corpus-scale exchange at
    * any point.
    */
  val langConfusion: QueryDef = q(
    "t20_langid_confusion",
    s"""WITH scores AS ($oracleScores),
       |p AS (
       |  SELECT doc_id, profile AS pred
       |  FROM (SELECT doc_id, profile, score,
       |          row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, pidx) AS rn
       |        FROM scores)
       |  WHERE rn = 1),
       |jx AS (
       |  SELECT d.lang, p.pred FROM documents d
       |  JOIN p ON p.doc_id = d.doc_id),
       |t AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1)
       |SELECT jx.lang AS lang, jx.pred AS pred, count(*) AS n_docs,
       |       CAST(count(*) AS DOUBLE) / CAST(max(t.n_lang) AS DOUBLE) AS share
       |FROM jx JOIN t ON t.lang = jx.lang
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val p = predictProfile(s, d)
    val totals = Tables.documents(s, d)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    p.join(broadcast(totals), "lang")
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n_docs"),
        (count(lit(1)).cast("double") / max(col("n_lang")).cast("double"))
          .as("share"))
      .orderBy("lang", "pred")
  }

  def defs: Seq[QueryDef] =
    Seq(langId, quality, tokens, fingerprint, tfidf, bigramCommonality,
      repetition, novelty, heavyHitters, redactionAudit, blocklistAudit,
      classifier, lmFluency, chunking, charDiversity, textrankKeywords,
      readability, collocations, vocabProfile, langConfusion)
}
