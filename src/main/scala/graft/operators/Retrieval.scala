package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Retrieval family over `documents` + `embeddings`: BM25 lexical scoring,
  * RAG chunk extraction, and hybrid lexical+vector rank fusion — the query
  * side of a training-data / RAG pipeline (the ingest side is the d-/s-
  * families' dedup and ANN indexes).
  *
  * Integer-exact scoring discipline (same reason as t05's TF-IDF): BM25's
  * `ln((N-df+0.5)/(df+0.5))` is libm-dependent, so the engine scores with
  * the monotone rational core instead — IDF as the scaled odds ratio
  * `(2N-2df+1)/(2df+1)` and the tf-saturation term cleared of fractions —
  * all in BIGINT floor division that both engines floor identically on
  * positive operands. Rankings agree with float BM25 wherever float BM25
  * is itself unambiguous, and reproduce bit-for-bit everywhere.
  *
  * Scale shape: tf for the (tiny, literal) query-term set is scan-fused
  * per-row array arithmetic — no explode, no keyed shuffle; the corpus
  * statistics (N, Σdl, per-term df) collapse to ONE 1-row broadcast; the
  * only distributed ordering is the final top-k (TakeOrderedAndProject,
  * never a global window). A 100 TB corpus pays two streaming scans and a
  * k-row driver result.
  */
object Retrieval {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  /** The fixed lexical query — df spread at sf0.01: dup 25, key 373,
    * spark 385, batch 402 (one rare term, three common).
    */
  private val queryTerms: Seq[String] = Seq("dup", "key", "spark", "batch")

  /** BM25 constants k1=1.2, b=0.75 appear fraction-cleared below:
    * sat = 2.2·tf / (tf + 0.3 + 0.9·dl/avgdl)
    *     = 22000·tf·A / (10·tf·A + 3·A + 9·dl·1e6) at milli scale,
    * with A = avgdl_micro = ⌊Σdl·1e6 / N⌋, computed as the two-step floor
    * `(Σdl div N)·1e6 + ((Σdl mod N)·1e6) div N` — algebraically the same
    * value, but safe to Long.MaxValue TOTAL corpus tokens where the
    * one-step product overflows past ~9.2e12 tokens (~50 TB of text).
    * Remaining headroom: 22000·tf·A needs tf·avgdl < 4e11 (fine past
    * book-length docs); idf_milli·sat_milli stays under 2^63 for corpora
    * to ~10¹⁰ docs.
    */
  private def satMilliSql(tf: String, dl: String): String =
    s"(22000 * $tf * a) div (10 * $tf * a + 3 * a + 9 * $dl * 1000000)"
  private def satMilliDuck(tf: String, dl: String): String =
    s"(22000 * $tf * a) // (10 * $tf * a + 3 * a + 9 * $dl * 1000000)"

  private def idfMilliSql(df: String): String =
    s"((2 * n_total - 2 * $df + 1) * 1000) div (2 * $df + 1)"
  private def idfMilliDuck(df: String): String =
    s"((2 * n_total - 2 * $df + 1) * 1000) // (2 * $df + 1)"

  /** Engine-side scored relation: doc_id, n_hit, score_micro for every doc
    * matching ≥1 query term. Two scans (stats, scoring); stats broadcast.
    */
  /** Shared tokenize + per-query-term tf frame — the ONE definition both
    * the analytical path ([[bm25Scored]]) and the frozen-stats path
    * ([[bm25Stats]]) build on, so their tokenization can never drift.
    */
  private def withTf(docs: DataFrame): DataFrame = {
    val base = docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("dl", size(col("ws")).cast("long"))
    queryTerms.zipWithIndex.foldLeft(base) { case (df, (t, i)) =>
      df.withColumn(s"tf_$i",
        expr(s"size(filter(ws, x -> x = '$t'))").cast("long"))
    }
  }

  /** The 1-row stats aggregate over a [[withTf]] frame: N, Σdl, per-term
    * df — the index-publish-time statistics.
    */
  private def statsAgg(tf: DataFrame): DataFrame = {
    val statCols = sum(col("dl")).as("sum_dl") +:
      queryTerms.indices.map(i =>
        count(when(col(s"tf_$i") > 0, 1)).as(s"df_$i"))
    tf.agg(count(lit(1)).as("n_total"), statCols: _*)
  }

  private[graft] def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val tf = withTf(Tables.parallel(Tables.documents(s, d)))
    val stats = statsAgg(tf)
    val scored = tf.crossJoin(broadcast(stats))
      // avgdl_micro in two floor-division steps: the one-step form
      // (sum_dl * 1e6) div n_total overflows BIGINT once the corpus holds
      // > ~9.2e12 total tokens — inside the 100 TB envelope. The split
      // form is algebraically the same floor and is overflow-safe to
      // Long.MaxValue total tokens ((sum_dl mod n_total) < n_total, so
      // the second product is < n_total * 1e6).
      .withColumn("a", expr(
        "(sum_dl div n_total) * 1000000 + ((sum_dl % n_total) * 1000000) div n_total"))
    val contribs = queryTerms.indices.map { i =>
      when(col(s"tf_$i") > 0,
        expr(s"(${idfMilliSql(s"df_$i")}) * (${satMilliSql(s"tf_$i", "dl")})"))
        .otherwise(lit(0L))
    }
    val hits = queryTerms.indices
      .map(i => when(col(s"tf_$i") > 0, 1L).otherwise(0L))
    scored
      .withColumn("score_micro", contribs.reduce(_ + _))
      .withColumn("n_hit", hits.reduce(_ + _))
      .filter(col("n_hit") > 0)
      .select("doc_id", "n_hit", "score_micro")
  }

  /** Frozen corpus statistics for the serving path: (N, Σdl, df per
    * query term), collected from the same 1-row aggregate [[bm25Scored]]
    * broadcasts. Driver-side result is one row — bounded by construction.
    */
  def bm25Stats(s: SparkSession, d: String): (Long, Long, Seq[Long]) =
    bm25StatsOf(Tables.documents(s, d))

  /** [[bm25Stats]] over an arbitrary (doc_id, text, …) relation — the
    * form the incremental pipeline freezes at snapshot-publish time.
    * Empty relations yield the zero stats (all components are sums of
    * per-doc contributions, so zero is the correct identity).
    */
  def bm25StatsOf(docs: DataFrame): (Long, Long, Seq[Long]) = {
    val r = statsAgg(withTf(docs)).head()
    val n = r.getAs[Long]("n_total")
    if (n == 0L) (0L, 0L, queryTerms.map(_ => 0L))
    else (n, r.getAs[Long]("sum_dl"),
      queryTerms.indices.map(i => r.getAs[Long](s"df_$i")))
  }

  /** Fold a publish cycle's removed/added documents into frozen serving
    * stats — r06's LIBRARY twin, and the reason a 100 TB index never
    * recounts unchanged docs: every stat component (N, Σdl, per-term df)
    * is a sum of per-document contributions, so subtracting the removed
    * docs' aggregate and adding the added docs' aggregate is EXACT, not
    * approximate (IncrementalPipelineSpec pins equality with the
    * from-scratch recount). Cost: two delta-sized aggregates.
    */
  def bm25StatsDelta(old: (Long, Long, Seq[Long]),
      removed: DataFrame, added: DataFrame): (Long, Long, Seq[Long]) = {
    val rm = bm25StatsOf(removed)
    val ad = bm25StatsOf(added)
    val dfs = queryTerms.indices.map(i => old._3(i) - rm._3(i) + ad._3(i))
    (old._1 - rm._1 + ad._1, old._2 - rm._2 + ad._2, dfs)
  }

  /** Score a (doc_id, text, …) relation against FROZEN stats — the
    * serving shape: statistics are published with the index snapshot and
    * scoring is stateless per-row arithmetic, so this column pipeline
    * runs unchanged on a STREAMING DataFrame (see
    * [[graft.streaming.DocStream.matchBm25]]). Arithmetic is identical to
    * [[bm25Scored]] (idf_milli and avgdl_micro precomputed host-side in
    * the same Long floor division), so the two paths score bit-for-bit
    * equal — RetrievalStreamSpec pins that.
    */
  def bm25ScoreAgainst(docs: DataFrame, nTotal: Long, sumDl: Long,
      dfs: Seq[Long]): DataFrame = {
    require(nTotal > 0, "bm25ScoreAgainst: empty corpus stats")
    require(dfs.length == queryTerms.length,
      s"bm25ScoreAgainst: need ${queryTerms.length} dfs, got ${dfs.length}")
    // same two-step floor as bm25Scored's `a` — overflow-safe past the
    // ~9.2e12-total-token ceiling of the one-step (sumDl * 1e6) form
    val a = (sumDl / nTotal) * 1000000L + (sumDl % nTotal) * 1000000L / nTotal
    val idfMilli = dfs.map(df => ((2 * nTotal - 2 * df + 1) * 1000L) / (2 * df + 1))
    val tf = withTf(docs)
    val contribs = queryTerms.indices.map { i =>
      when(col(s"tf_$i") > 0,
        lit(idfMilli(i)) * expr(
          s"(22000 * tf_$i * ${a}L) div (10 * tf_$i * ${a}L + 3 * ${a}L + 9 * dl * 1000000)"))
        .otherwise(lit(0L))
    }
    val hits = queryTerms.indices
      .map(i => when(col(s"tf_$i") > 0, 1L).otherwise(0L))
    tf
      .withColumn("score_micro", contribs.reduce(_ + _))
      .withColumn("n_hit", hits.reduce(_ + _))
      .select("doc_id", "n_hit", "score_micro")
  }

  /** Oracle-side CTEs mirroring [[bm25Scored]] (relation `bm`). */
  private val bm25OracleCtes: String = {
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(string_split(text, ' '), x -> x = '$t')) AS tf_$i"
    }.mkString(",\n|    ")
    val dfCols = queryTerms.indices
      .map(i => s"count(CASE WHEN tf_$i > 0 THEN 1 END) AS df_$i")
      .mkString(", ")
    val contribs = queryTerms.indices.map { i =>
      s"(CASE WHEN tf_$i > 0 THEN (${idfMilliDuck(s"df_$i")}) * (${satMilliDuck(s"tf_$i", "dl")}) ELSE 0 END)"
    }.mkString("\n|      + ")
    val hits = queryTerms.indices
      .map(i => s"(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END)").mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |    $tfCols
       |  FROM documents),
       |stats AS (
       |  SELECT count(*) AS n_total, CAST(sum(dl) AS BIGINT) AS sum_dl,
       |         $dfCols FROM tok),
       |bm AS (
       |  SELECT doc_id,
       |      $contribs AS score_micro,
       |      $hits AS n_hit
       |  FROM (SELECT tok.*, stats.*,
       |          (sum_dl // n_total) * 1000000
       |            + ((sum_dl % n_total) * 1000000) // n_total AS a
       |        FROM tok, stats)
       |  WHERE $hits > 0)""".stripMargin
  }

  /** r01: BM25 top-10 for the fixed query — rank, doc, hit count, score. */
  val bm25TopK: QueryDef = q(
    "r01_bm25_topk",
    s"""WITH $bm25OracleCtes
       |SELECT rn, doc_id, n_hit, score_micro FROM (
       |  SELECT doc_id, n_hit, score_micro,
       |         row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rn
       |  FROM bm)
       |WHERE rn <= 10
       |ORDER BY rn""".stripMargin) { (s, d) =>
    // top-k FIRST (TakeOrderedAndProject — distributed heap-k, no global
    // window over the corpus), then rank the 10 survivors.
    val top = bm25Scored(s, d)
      .orderBy(col("score_micro").desc, col("doc_id")).limit(10)
    top
      .withColumn("rn", row_number().over(
        Window.orderBy(col("score_micro").desc, col("doc_id"))))
      .select("rn", "doc_id", "n_hit", "score_micro")
      .orderBy("rn")
  }

  /** r02: positional retrieval primitives — exact-phrase match counting
    * and two-term proximity (minimum token span), the semantics a
    * positional inverted index serves. Here they are scan-fused per-row
    * array arithmetic over token positions: no index build, no shuffle,
    * output bounded by matching docs. At 100 TB this is the
    * "grep-with-positions" pass a corpus audit runs before paying for an
    * index; the per-row span search is O(|pa|·|pb|) in the two terms'
    * in-doc frequencies (both df-bounded rare terms here, and token
    * frequency within one doc is small by construction).
    *
    * Phrase = "hash join" (adjacent tokens); proximity pair = (dup, spark).
    * prox_micro = ⌊1e6 / min_span⌋ — integer, larger is closer.
    */
  val phraseProx: QueryDef = q(
    "r02_phrase_prox",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws,
      |                  len(string_split(text, ' ')) AS n FROM documents),
      |pos AS (SELECT doc_id, n,
      |    len(list_filter(range(1, greatest(n, 2)),
      |      i -> i < n AND ws[CAST(i AS INT)] = 'hash'
      |             AND ws[CAST(i AS INT) + 1] = 'join')) AS n_phrase,
      |    list_filter(range(1, n + 1), i -> ws[CAST(i AS INT)] = 'dup') AS pa,
      |    list_filter(range(1, n + 1), i -> ws[CAST(i AS INT)] = 'spark') AS pb
      |  FROM d)
      |SELECT doc_id, n_phrase,
      |  len(pa) AS n_a, len(pb) AS n_b,
      |  CASE WHEN len(pa) > 0 AND len(pb) > 0
      |    THEN list_min(flatten(list_transform(pa,
      |           a -> list_transform(pb, b -> abs(a - b))))) ELSE 0 END
      |    AS min_span,
      |  CASE WHEN len(pa) > 0 AND len(pb) > 0
      |    THEN 1000000 // list_min(flatten(list_transform(pa,
      |           a -> list_transform(pb, b -> abs(a - b))))) ELSE 0 END
      |    AS prox_micro
      |FROM pos
      |WHERE n_phrase > 0 OR (len(pa) > 0 AND len(pb) > 0)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    // Cheap SUPERSET prefilter, stated FIRST so it is the leading conjunct
    // of the scan-pushed Filter: substring `contains` prunes ~90% of rows
    // before any interpreted array lambda runs (higher-order functions are
    // not codegen'd — without this, the exact token predicate below is
    // pushed into the scan and pays the full lambda chain on EVERY row).
    // Substring match over-approximates token match ("dedup" contains
    // "dup"), so the exact token-level filter still applies afterwards.
    val pre = Tables.documents(s, d).filter(
      col("text").contains("hash join") ||
        (col("text").contains("dup") && col("text").contains("spark")))
    val pos = Tables.parallel(pre)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .select(
        col("doc_id"),
        expr("""size(filter(sequence(1L, greatest(n - 1, 1L)),
                 i -> i < n AND element_at(ws, CAST(i AS INT)) = 'hash'
                        AND element_at(ws, CAST(i AS INT) + 1) = 'join'))""")
          .cast("long").as("n_phrase"),
        expr("filter(sequence(1L, n), i -> element_at(ws, CAST(i AS INT)) = 'dup')")
          .as("pa"),
        expr("filter(sequence(1L, n), i -> element_at(ws, CAST(i AS INT)) = 'spark')")
          .as("pb"))
    // min_span materialized ONCE as a column; prox_micro derives from it
    // (CollapseProject keeps non-cheap expressions referenced twice in
    // their own Project, so the flatten runs a single time per row).
    pos
      .withColumn("min_span0",
        when(size(col("pa")) > 0 && size(col("pb")) > 0, expr(
          "array_min(flatten(transform(pa, a -> transform(pb, b -> abs(a - b)))))"))
          .otherwise(lit(0L)))
      .select(
        col("doc_id"), col("n_phrase"),
        size(col("pa")).cast("long").as("n_a"),
        size(col("pb")).cast("long").as("n_b"),
        col("min_span0").as("min_span"),
        when(col("min_span0") > 0, expr("1000000 div min_span0"))
          .otherwise(lit(0L)).as("prox_micro"))
      .filter(col("n_phrase") > 0 || (col("n_a") > 0 && col("n_b") > 0))
      .orderBy("doc_id")
  }

  /** BM25 top-k doc ids (the feedback set for r04/r05). */
  private def bm25TopDocs(s: SparkSession, d: String, k: Int): DataFrame =
    bm25Scored(s, d)
      .orderBy(col("score_micro").desc, col("doc_id")).limit(k)
      .select("doc_id")

  /** Oracle CTE `fb`: the BM25 top-k doc ids (append after bm25OracleCtes). */
  private def fbCte(k: Int): String =
    s"""fb AS (SELECT doc_id FROM (
       |  SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rn
       |  FROM bm) WHERE rn <= $k)""".stripMargin

  private val qtInList: String = inList(queryTerms)
  private def inList(ts: Seq[String]): String =
    ts.map(t => s"'$t'").mkString(", ")

  /** r04: pseudo-relevance-feedback query expansion (Rocchio-style): mine
    * the BM25 top-10 docs for the terms that best characterize them —
    * score = (occurrences in the feedback set) × corpus IDF, the original
    * query terms excluded. Integer-exact (same odds-ratio IDF as r01).
    *
    * Scale shape: the feedback side is 10 docs (broadcast joined back to
    * the scan); the only corpus-scale work is the per-term df aggregate,
    * and even that explodes DISTINCT in-doc terms and semi-joins the
    * (tiny, broadcast) candidate set BEFORE the keyed shuffle, so the
    * exchange carries candidate-term rows only — never the full posting
    * list of every term.
    */
  val prfExpansion: QueryDef = q(
    "r04_prf_expansion",
    s"""WITH $bm25OracleCtes,
       |${fbCte(10)},
       |fterms AS (
       |  SELECT term, count(*) AS ftf FROM (
       |    SELECT unnest(string_split(text, ' ')) AS term
       |    FROM documents WHERE doc_id IN (SELECT doc_id FROM fb))
       |  WHERE term NOT IN ($qtInList)
       |  GROUP BY term),
       |cdf AS (
       |  SELECT term, count(*) AS df FROM (
       |    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
       |    FROM documents)
       |  GROUP BY term),
       |scored AS (
       |  SELECT f.term, ftf, df,
       |         ftf * (${idfMilliDuck("df")}) AS score_milli
       |  FROM fterms f JOIN cdf USING (term), stats)
       |SELECT rn, term, ftf, df, score_milli FROM (
       |  SELECT *, row_number() OVER (ORDER BY score_milli DESC, term) AS rn
       |  FROM scored)
       |WHERE rn <= 10
       |ORDER BY rn""".stripMargin) { (s, d) =>
    val docs = Tables.parallel(Tables.documents(s, d))
    val n = docs.agg(count(lit(1)).as("n_total"))
    val fb = bm25TopDocs(s, d, 10)
    val fterms = docs.join(broadcast(fb), "doc_id")
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(!col("term").isInCollection(queryTerms))
      .groupBy("term").agg(count(lit(1)).as("ftf"))
    // corpus df for candidate terms ONLY: distinct-in-doc explode, then
    // the broadcast semi-join prunes before the per-term exchange
    val cdf = docs
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .join(broadcast(fterms.select("term")), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("df"))
    fterms.join(cdf, "term")
      .crossJoin(broadcast(n))
      .withColumn("score_milli", expr(s"ftf * (${idfMilliSql("df")})"))
      .orderBy(col("score_milli").desc, col("term")).limit(10)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("score_milli").desc, col("term"))))
      .select("rn", "term", "ftf", "df", "score_milli")
      .orderBy("rn")
  }

  /** r05: snippet extraction — for each BM25 top-10 doc, the 16-token
    * window with the most query-term hits (ties → earliest start). The
    * candidate-window sweep is per-row array arithmetic over the 10
    * feedback docs only; output is one row per result doc, with the
    * snippet pinned by hash.
    */
  val snippets: QueryDef = q(
    "r05_snippets",
    s"""WITH $bm25OracleCtes,
       |${fbCte(10)},
       |dd AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |         len(string_split(text, ' ')) AS n,
       |         list_filter(range(1, len(string_split(text, ' ')) + 1),
       |           i -> string_split(text, ' ')[CAST(i AS INT)] IN ($qtInList)) AS hp
       |  FROM documents WHERE doc_id IN (SELECT doc_id FROM fb)),
       |cand AS (
       |  SELECT doc_id, ws, n, hp,
       |         unnest(range(1, greatest(n - 15, 1) + 1)) AS st
       |  FROM dd),
       |cnt AS (
       |  SELECT doc_id, ws, n, st,
       |         len(list_filter(hp, p -> p >= st AND p < st + 16)) AS n_window_hits
       |  FROM cand),
       |best AS (
       |  SELECT doc_id, ws, n, st, n_window_hits,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY n_window_hits DESC, st) AS rn
       |  FROM cnt)
       |SELECT doc_id, st AS best_start, n_window_hits,
       |  md5(array_to_string(list_slice(ws, CAST(st AS INT),
       |        CAST(st + least(16, n - st + 1) - 1 AS INT)), ' ')) AS snippet_hash
       |FROM best WHERE rn = 1
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val fb = bm25TopDocs(s, d, 10)
    val dd = Tables.documents(s, d).join(broadcast(fb), "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .withColumn("hp", expr(
        s"filter(sequence(1L, n), i -> element_at(ws, CAST(i AS INT)) IN ($qtInList))"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("n_window_hits").desc, col("st"))
    dd
      .withColumn("st", explode(expr("sequence(1L, greatest(n - 15, 1L))")))
      .withColumn("n_window_hits",
        expr("size(filter(hp, p -> p >= st AND p < st + 16))").cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"), col("st").as("best_start"), col("n_window_hits"),
        md5(array_join(
          slice(col("ws"), col("st").cast("int"),
            least(lit(16L), col("n") - col("st") + 1).cast("int")),
          " ")).as("snippet_hash"))
      .orderBy("doc_id")
  }

  /** Vector-side probe for r03: doc 7's embedding. */
  private val probeId = 7L

  private def vecQuantDuck(emb: String): String =
    s"CAST(CAST(CAST($emb AS DOUBLE) AS DECIMAL(18,6)) * 1000000 AS BIGINT)"

  /** Per-dimension quantized element for the s01-style dot CTEs (r07). */
  private def xiLocal(tbl: String): String =
    vecQuantDuck(s"$tbl.embedding[CAST(j.j AS INT)]")

  /** r03: hybrid retrieval — reciprocal-rank fusion (k=60) of the BM25
    * top-20 and the exact-cosine top-20 for probe vector 7 (doc_id and
    * vec_id are aligned in this corpus). rrf contribution is the integer
    * `1e6 // (60 + rank)`; a doc absent from one list contributes 0 there.
    * Both inputs are already k-row relations, so the fusion join is
    * trivially broadcast; the serving-scale vector side would swap in the
    * s10/s15 IVF chain — this query pins the fusion contract against the
    * exact baseline.
    */
  val hybridRrf: QueryDef = q(
    "r03_hybrid_rrf",
    s"""WITH $bm25OracleCtes,
       |bmr AS (SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC, doc_id) AS bm_rn
       |        FROM bm QUALIFY bm_rn <= 20),
       |j AS (SELECT unnest(range(1, 65)) AS j),
       |qv AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id = $probeId),
       |dots AS (
       |  SELECT c.vec_id AS cid,
       |    CAST(sum(${vecQuantDuck("qv.embedding[CAST(j.j AS INT)]")}
       |           * ${vecQuantDuck("c.embedding[CAST(j.j AS INT)]")}) AS BIGINT) AS dot,
       |    CAST(sum(${vecQuantDuck("qv.embedding[CAST(j.j AS INT)]")}
       |           * ${vecQuantDuck("qv.embedding[CAST(j.j AS INT)]")}) AS BIGINT) AS q_sq,
       |    CAST(sum(${vecQuantDuck("c.embedding[CAST(j.j AS INT)]")}
       |           * ${vecQuantDuck("c.embedding[CAST(j.j AS INT)]")}) AS BIGINT) AS c_sq
       |  FROM qv, embeddings c, j
       |  WHERE c.vec_id <> $probeId
       |  GROUP BY c.vec_id),
       |annr AS (SELECT cid AS doc_id,
       |           row_number() OVER (
       |             ORDER BY (CAST(dot AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
       |               / (sqrt(CAST(q_sq AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
       |                * sqrt(CAST(c_sq AS DOUBLE) / CAST(1000000000000 AS DOUBLE))) DESC,
       |               cid) AS ann_rn
       |         FROM dots QUALIFY ann_rn <= 20),
       |fused AS (
       |  SELECT coalesce(bmr.doc_id, annr.doc_id) AS doc_id,
       |    coalesce(bm_rn, 0) AS bm_rn, coalesce(ann_rn, 0) AS ann_rn,
       |    (CASE WHEN bm_rn IS NULL THEN 0 ELSE 1000000 // (60 + bm_rn) END)
       |    + (CASE WHEN ann_rn IS NULL THEN 0 ELSE 1000000 // (60 + ann_rn) END)
       |      AS fused_micro
       |  FROM bmr FULL OUTER JOIN annr ON bmr.doc_id = annr.doc_id)
       |SELECT rn, doc_id, bm_rn, ann_rn, fused_micro FROM (
       |  SELECT *, row_number() OVER (ORDER BY fused_micro DESC, doc_id) AS rn
       |  FROM fused)
       |WHERE rn <= 10
       |ORDER BY rn""".stripMargin) { (s, d) =>
    val bmTop = bm25Scored(s, d)
      .orderBy(col("score_micro").desc, col("doc_id")).limit(20)
      .withColumn("bm_rn", row_number().over(
        Window.orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "bm_rn")
    val e = Similarity.withQuant(Tables.parallel(Tables.embeddings(s, d)))
    val probe = e.filter(col("vec_id") === probeId)
      .select(col("qv").as("qe"), col("sq").as("q_sq"))
    val cos = (call_function("long_dot", col("qe"), col("ce")).cast("double")
      / lit(1.0e12)) /
      (sqrt(col("q_sq").cast("double") / lit(1.0e12)) *
        sqrt(col("c_sq").cast("double") / lit(1.0e12)))
    val annTop = e.filter(col("vec_id") =!= probeId)
      .select(col("vec_id").as("cid"), col("qv").as("ce"), col("sq").as("c_sq"))
      .crossJoin(broadcast(probe))
      .withColumn("cos", cos)
      .orderBy(col("cos").desc, col("cid")).limit(20)
      .withColumn("ann_rn", row_number().over(
        Window.orderBy(col("cos").desc, col("cid"))).cast("long"))
      .select(col("cid").as("doc_id"), col("ann_rn"))
    val fused = bmTop.join(annTop, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        coalesce(col("bm_rn"), lit(0L)).as("bm_rn"),
        coalesce(col("ann_rn"), lit(0L)).as("ann_rn"),
        (when(col("bm_rn").isNull, 0L)
          .otherwise(expr("1000000 div (60 + bm_rn)")) +
          when(col("ann_rn").isNull, 0L)
            .otherwise(expr("1000000 div (60 + ann_rn)"))).as("fused_micro"))
    fused
      .orderBy(col("fused_micro").desc, col("doc_id")).limit(10)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("fused_micro").desc, col("doc_id"))))
      .select("rn", "doc_id", "bm_rn", "ann_rn", "fused_micro")
      .orderBy("rn")
  }

  /** r06: incremental posting-stats maintenance — the index-side twin of
    * the i-family's snapshot pair (v1 → v2, [[Incremental.snapshotV1]]).
    * A 100 TB lexical index is not rebuilt per release: per-term document
    * frequency is updated from the DELTA docs only (−1 per distinct term
    * of a removed/changed doc's old text, +1 per distinct term of an
    * added/changed doc's new text); unchanged docs are never re-tokenized.
    *
    * Output: every term the delta touched, with df_v1, the signed delta,
    * and df_v2 = df_v1 + delta. RetrievalSpec asserts df_v2 equals a
    * from-scratch recompute over v2 for every touched term — the
    * incremental-correctness invariant.
    *
    * Scale shape: the status diff joins md5 keys only (narrow, as i01);
    * texts are re-fetched for delta doc ids alone via semi-joins; the
    * baseline df aggregate explodes distinct-in-doc terms and is pruned
    * to touched terms by a broadcast semi-join before its exchange (the
    * r04 trick), so no full posting list ever shuffles.
    */
  val postingDelta: QueryDef = q(
    "r06_posting_delta",
    s"""WITH ${Incremental.v1SqlCte},
       |${Incremental.v2SqlCte},
       |k1 AS (SELECT doc_id, md5(text) AS h1 FROM v1),
       |k2 AS (SELECT doc_id, md5(text) AS h2 FROM v2),
       |status AS (
       |  SELECT coalesce(k1.doc_id, k2.doc_id) AS doc_id,
       |    CASE WHEN k1.doc_id IS NULL THEN 'added'
       |         WHEN k2.doc_id IS NULL THEN 'removed'
       |         WHEN h1 <> h2 THEN 'changed' ELSE 'same' END AS st
       |  FROM k1 FULL OUTER JOIN k2 ON k1.doc_id = k2.doc_id),
       |minus AS (
       |  SELECT unnest(list_distinct(string_split(v1.text, ' '))) AS term
       |  FROM v1 JOIN status USING (doc_id) WHERE st IN ('removed', 'changed')),
       |plus AS (
       |  SELECT unnest(list_distinct(string_split(v2.text, ' '))) AS term
       |  FROM v2 JOIN status USING (doc_id) WHERE st IN ('added', 'changed')),
       |delta AS (
       |  SELECT term, CAST(sum(d) AS BIGINT) AS delta FROM (
       |    SELECT term, -1 AS d FROM minus
       |    UNION ALL SELECT term, 1 AS d FROM plus)
       |  GROUP BY term),
       |dfv1 AS (
       |  SELECT term, count(*) AS df_v1 FROM (
       |    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
       |    FROM v1)
       |  GROUP BY term)
       |SELECT d.term, coalesce(df_v1, 0) AS df_v1, d.delta,
       |       coalesce(df_v1, 0) + d.delta AS df_v2
       |FROM delta d LEFT JOIN dfv1 USING (term)
       |ORDER BY d.term""".stripMargin) { (s, d) =>
    val v1 = Incremental.snapshotV1(s, d)
    val v2 = Incremental.snapshotV2(s, d)
    val k1 = v1.select(col("doc_id"), md5(col("text")).as("h1"))
    val k2 = v2.select(col("doc_id"), md5(col("text")).as("h2"))
    val status = k1.join(k2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") =!= col("h2"), "changed")
          .otherwise("same").as("st"))
    def touchedTerms(snap: DataFrame, states: Seq[String]): DataFrame =
      snap.join(status.filter(col("st").isInCollection(states))
          .select("doc_id"), Seq("doc_id"), "left_semi")
        .select(explode(array_distinct(split(col("text"), " "))).as("term"))
    val delta = touchedTerms(v1, Seq("removed", "changed")).withColumn("d", lit(-1L))
      .unionAll(touchedTerms(v2, Seq("added", "changed")).withColumn("d", lit(1L)))
      .groupBy("term").agg(sum(col("d")).as("delta"))
    // baseline df over v1, pruned to touched terms BEFORE the exchange
    val dfv1 = v1
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .join(broadcast(delta.select("term")), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("df_v1"))
    delta.join(dfv1, Seq("term"), "left_outer")
      .select(col("term"),
        coalesce(col("df_v1"), lit(0L)).as("df_v1"), col("delta"),
        (coalesce(col("df_v1"), lit(0L)) + col("delta")).as("df_v2"))
      .orderBy("term")
  }

  /** r07: lexical ↔ vector agreement audit. For each probe doc (id < 10),
    * the query-by-document lexical top-10 (candidates scored by Σ
    * odds-ratio-IDF over SHARED DISTINCT TERMS with the probe — the
    * BM25-lite document-similarity kernel) is compared against the
    * exact-cosine top-10 of the probe's embedding; the row reports the
    * overlap and its Jaccard. This is the audit a hybrid deployment runs
    * before trusting one modality to backstop the other (and the measured
    * justification for r03's fusion): low agreement ⇒ the two retrievers
    * see different neighborhoods and fusion adds recall.
    *
    * Scale shape: the posting join explodes DISTINCT in-doc terms and
    * joins the (10-probe, broadcast) term lists BEFORE any keyed
    * exchange, so the shuffle carries only probe-matched rows; the df
    * side is vocabulary-bounded and broadcasts; the vector side is the
    * s01 baseline (10 probes broadcast against the corpus, top-k via
    * per-probe WindowGroupLimit).
    */
  val lexVecAgreement: QueryDef = q(
    "r07_lex_vec_agreement",
    s"""WITH ${Similarity.oracleNorms},
       |dt AS (SELECT DISTINCT doc_id,
       |         unnest(list_distinct(string_split(text, ' '))) AS term
       |       FROM documents),
       |n AS (SELECT count(*) AS n_total FROM documents),
       |dfq AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
       |pl AS (SELECT doc_id AS qid, term FROM dt WHERE doc_id < 10),
       |lex AS (
       |  SELECT pl.qid, dt.doc_id AS cid,
       |    CAST(sum(${idfMilliDuck("df")}) AS BIGINT) AS lex_milli
       |  FROM pl JOIN dt USING (term) JOIN dfq USING (term), n
       |  WHERE dt.doc_id <> pl.qid
       |  GROUP BY pl.qid, dt.doc_id),
       |lex10 AS (SELECT qid, cid FROM (
       |  SELECT qid, cid,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY lex_milli DESC, cid) AS rn
       |  FROM lex) WHERE rn <= 10),
       |q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 10),
       |dots AS (
       |  SELECT q.qid, c.vec_id AS cid,
       |    CAST(sum(${xiLocal("q")} * ${xiLocal("c")}) AS BIGINT) AS dot
       |  FROM q, embeddings c, j
       |  WHERE c.vec_id <> q.qid
       |  GROUP BY q.qid, c.vec_id),
       |vec10 AS (SELECT qid, cid FROM (
       |  SELECT qid, cid,
       |    row_number() OVER (PARTITION BY qid ORDER BY
       |      (CAST(dot AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
       |        / (sqrt(CAST(na.sq AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
       |         * sqrt(CAST(nb.sq AS DOUBLE) / CAST(1000000000000 AS DOUBLE))) DESC,
       |      cid) AS rn
       |  FROM dots JOIN norms na ON na.vec_id = qid
       |            JOIN norms nb ON nb.vec_id = cid) WHERE rn <= 10)
       |,nl AS (SELECT qid, count(*) AS n_lex FROM lex10 GROUP BY qid),
       |nv AS (SELECT qid, count(*) AS n_vec FROM vec10 GROUP BY qid),
       |nc AS (SELECT l.qid, count(*) AS n_common
       |       FROM lex10 l JOIN vec10 v ON l.qid = v.qid AND l.cid = v.cid
       |       GROUP BY l.qid)
       |SELECT qid, CAST(COALESCE(nc.n_common, 0) AS BIGINT) AS n_common,
       |  CAST(CASE WHEN COALESCE(nl.n_lex, 0) + COALESCE(nv.n_vec, 0)
       |                 - COALESCE(nc.n_common, 0) = 0 THEN 0
       |       ELSE COALESCE(nc.n_common, 0) * 1000000
       |            // (COALESCE(nl.n_lex, 0) + COALESCE(nv.n_vec, 0)
       |                - COALESCE(nc.n_common, 0))
       |       END AS BIGINT) AS jaccard_micro
       |FROM nl FULL JOIN nv USING (qid) LEFT JOIN nc USING (qid)
       |ORDER BY qid""".stripMargin) { (s, d) =>
    val docs = Tables.parallel(Tables.documents(s, d))
    val n = docs.agg(count(lit(1)).as("n_total"))
    val dt = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("term"))
    val dfq = dt.groupBy("term").agg(count(lit(1)).as("df"))
    val pl = dt.filter(col("doc_id") < 10)
      .select(col("doc_id").as("qid"), col("term"))
    val lex = dt
      .join(broadcast(pl), Seq("term"))
      .filter(col("doc_id") =!= col("qid"))
      .join(broadcast(dfq), Seq("term"))
      .crossJoin(broadcast(n))
      .groupBy(col("qid"), col("doc_id").as("cid"))
      .agg(sum(expr(idfMilliSql("df"))).as("lex_milli"))
    val wl = Window.partitionBy(col("qid"))
      .orderBy(col("lex_milli").desc, col("cid"))
    val lex10 = lex.withColumn("rn", row_number().over(wl))
      .filter(col("rn") <= 10).select("qid", "cid")
    val e = Similarity.withQuant(Tables.parallel(Tables.embeddings(s, d)))
    val qs = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("qv").as("qe"), col("sq").as("q_sq"))
    val cos = (call_function("long_dot", col("qe"), col("ce")).cast("double")
      / lit(1.0e12)) /
      (sqrt(col("q_sq").cast("double") / lit(1.0e12)) *
        sqrt(col("c_sq").cast("double") / lit(1.0e12)))
    val wv = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    val vec10 = e.select(col("vec_id").as("cid"), col("qv").as("ce"),
        col("sq").as("c_sq"))
      .crossJoin(broadcast(qs))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos", cos)
      .withColumn("rn", row_number().over(wv))
      .filter(col("rn") <= 10).select("qid", "cid")
    // union per probe is count(lex) + count(vec) − common — NOT a constant
    // 20 − common, which would inflate Jaccard for a probe with fewer than
    // 10 candidates in either modality (and a zero-candidate probe must
    // still surface, via the full outer spine, not drop from the report)
    val v10 = vec10.select(col("qid").as("vqid"), col("cid").as("vcid"))
    val nl = lex10.groupBy("qid").agg(count(lit(1)).as("n_lex"))
    val nv = vec10.groupBy("qid").agg(count(lit(1)).as("n_vec"))
    val nc = lex10.join(v10,
        col("qid") === col("vqid") && col("cid") === col("vcid"))
      .groupBy("qid").agg(count(lit(1)).as("nc"))
    nl.join(nv, Seq("qid"), "full_outer")
      .join(nc, Seq("qid"), "left_outer")
      .select(col("qid"),
        coalesce(col("nc"), lit(0L)).as("n_common"),
        expr("""CAST(CASE WHEN coalesce(n_lex, 0) + coalesce(n_vec, 0)
               |               - coalesce(nc, 0) = 0 THEN 0
               |     ELSE coalesce(nc, 0) * 1000000
               |          div (coalesce(n_lex, 0) + coalesce(n_vec, 0)
               |               - coalesce(nc, 0))
               |     END AS BIGINT)""".stripMargin).as("jaccard_micro"))
      .orderBy("qid")
  }

  def defs: Seq[QueryDef] =
    Seq(bm25TopK, phraseProx, hybridRrf, prfExpansion, snippets, postingDelta,
      lexVecAgreement)
}
