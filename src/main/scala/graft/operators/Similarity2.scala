package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Scalar quantization (SQ8) ANN — the third compression point on the
  * engine's vector-serving spectrum (exact `long_dot` ≫ SQ8 (1 byte/dim,
  * this file) ≫ PQ (log₂ksub bits/dim, s12/s15)).
  *
  * SQ8 is what production vector stores deploy first: per-DIMENSION
  * min/max over the corpus, each element quantized to an 8-bit code on
  * that dimension's range, distances computed ASYMMETRICALLY (query stays
  * full precision, candidate reconstructed from its code). 4× less
  * memory/IO than float32 with ~no recall loss at 64 dims — and unlike
  * PQ it needs no k-means training pass, just one min/max aggregate.
  *
  * Exactness discipline (the engine-wide fixed-point contract,
  * `Similarity.scala:19`): vectors are 1e-6-unit longs; the quantization
  * step, the ×255 reconstruction, the ADC dot and both norms are ALL
  * exact integer arithmetic — every double in the result is produced by
  * one shared expression shape, so the DuckDB oracle hash-matches
  * bit-for-bit.
  *
  * Scale shape: the min/max model is ONE scan-fused aggregate (128
  * scalar agg cells, kilobytes to the driver — bounded model state, the
  * kMeans-centroid pattern); encode is a scan-fused narrow map with the
  * model as broadcast literals; search streams the corpus map-only with
  * the (tiny) query set broadcast — the corpus is never key-shuffled,
  * and the only exchange is the per-query top-k window over candidate
  * scores.
  */
object Similarity2 {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  /** SQ8 model: per-dimension minima and ranges in 1e-6-unit longs. */
  final case class Sq8Model(mins: Seq[Long], ranges: Seq[Long], dim: Int)

  /** One-pass model fit: per-dimension min/max as 2·dim scalar aggregate
    * cells over the quantized view (scan-fused, no explode — the
    * dimension loop is column-wise, the q53 one-pass-moments shape).
    */
  def sq8Fit(emb: DataFrame, dim: Int = 64): Sq8Model = {
    val wq = Similarity.withQuant(emb)
    val aggs = (1 to dim).flatMap { i =>
      Seq(min(element_at(col("qv"), i)).as(s"mn$i"),
        max(element_at(col("qv"), i)).as(s"mx$i"))
    }
    val row = wq.agg(aggs.head, aggs.tail: _*).head()
    // empty store → NULL aggregate cells; fail loudly with context, not
    // with an opaque NPE out of getLong (the engine-wide source contract)
    require(!row.isNullAt(0),
      "sq8Fit: empty embeddings store — cannot fit a quantizer on 0 vectors")
    val mins = (0 until dim).map(i => row.getLong(2 * i))
    val maxs = (0 until dim).map(i => row.getLong(2 * i + 1))
    Sq8Model(mins, maxs.zip(mins).map { case (mx, mn) => mx - mn }, dim)
  }

  /** Exact integer code: ⌊(v − mn)·255 / rg⌋ via remainder subtraction —
    * `(a − a mod b) / b` divides exactly, so the double division cannot
    * round (a ≤ 5.1e8 ≪ 2^53). Degenerate dimensions (rg = 0) code to 0.
    */
  private[operators] def codeLambda(mins: Column, ranges: Column): (Column, Column) => Column =
    (v, i) => {
      val mn = element_at(mins, (i + 1).cast("int"))
      val rg = element_at(ranges, (i + 1).cast("int"))
      val a = (v - mn) * 255
      when(rg === 0, lit(0L))
        .otherwise(((a - (a % rg)) / rg).cast("long"))
    }

  /** Encode: vec_id, 8-bit codes, and the exact ×255 reconstruction
    * norm (Σ dv² with dv = 255·mn + code·rg ≤ 1.4e8 ⇒ Σ ≤ 1.2e18, in
    * range). Codes are the ONLY per-vector state a 100 TB store persists
    * (64 bytes/vector); `dv`/`rsq` are derived scan-fused at read time.
    */
  def sq8Encode(emb: DataFrame, model: Sq8Model): DataFrame = {
    val s = emb.sparkSession
    graft.functions.GraftFunctions.register(s)
    val minsLit = typedlit(model.mins)
    val rangesLit = typedlit(model.ranges)
    Similarity.withQuant(emb)
      .withColumn("codes", transform(col("qv"), codeLambda(minsLit, rangesLit)))
      .withColumn("dv", transform(col("codes"), (c, i) => {
        val mn = element_at(minsLit, (i + 1).cast("int"))
        val rg = element_at(rangesLit, (i + 1).cast("int"))
        lit(255L) * mn + c * rg
      }))
      .withColumn("rsq", call_function("long_dot", col("dv"), col("dv")))
      .select(col("vec_id"), col("codes"), col("dv"), col("rsq"))
  }

  /** Asymmetric top-k: full-precision queries against SQ8-reconstructed
    * candidates. cos ≈ (q·dv/255 / 1e12) / (‖q‖ · ‖dv/255‖).
    */
  def sq8Search(corpus: DataFrame, model: Sq8Model, queries: DataFrame,
      k: Int): DataFrame = {
    val s = corpus.sparkSession
    graft.functions.GraftFunctions.register(s)
    val enc = sq8Encode(corpus, model)
    val qs = Similarity.withQuant(queries)
      .select(col("vec_id").as("qid"), col("qv"), col("sq"))
    val adot = call_function("long_dot", col("qv"), col("dv"))
    val cos = (adot.cast("double") / lit(255.0) / lit(1.0e12)) /
      (sqrt(col("sq").cast("double") / lit(1.0e12)) *
        sqrt(col("rsq").cast("double") / lit(65025.0) / lit(1.0e12)))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    enc.join(broadcast(qs), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"), cos.as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("cid"), col("cos"))
  }

  /** s22: the SQ8 gate — 8 query vectors, top-3 ADC neighbors each, the
    * full fit→encode→search path restated by the oracle in exact integer
    * SQL (per-dimension min/max, remainder-exact codes, ×255
    * reconstruction, one shared double expression).
    */
  val sq8Adc: QueryDef = q(
    "s22_sq8_adc",
    s"""WITH jj AS (SELECT unnest(range(0, 64)) AS jx),
       |x AS (
       |  SELECT vec_id, jx,
       |         CAST(CAST(CAST(embeddings.embedding[CAST(jx + 1 AS INT)] AS DOUBLE)
       |              AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
       |  FROM embeddings, jj),
       |mm AS (SELECT jx, min(v) AS mn, max(v) - min(v) AS rg
       |       FROM x GROUP BY 1),
       |codes AS (
       |  SELECT x.vec_id, x.jx,
       |         CASE WHEN mm.rg = 0 THEN 0
       |              ELSE ((x.v - mm.mn) * 255) // mm.rg END AS code
       |  FROM x JOIN mm ON mm.jx = x.jx),
       |dq AS (
       |  SELECT codes.vec_id, codes.jx, 255 * mm.mn + codes.code * mm.rg AS dv
       |  FROM codes JOIN mm ON mm.jx = codes.jx),
       |rsq AS (SELECT vec_id, CAST(sum(dv * dv) AS BIGINT) AS rsq
       |        FROM dq GROUP BY 1),
       |${Similarity.oracleNorms},
       |qx AS (SELECT vec_id AS qid, jx, v FROM x WHERE vec_id < 8),
       |adots AS (
       |  SELECT qx.qid, dq.vec_id AS cid, CAST(sum(qx.v * dq.dv) AS BIGINT) AS adot
       |  FROM dq JOIN qx ON qx.jx = dq.jx
       |  WHERE dq.vec_id <> qx.qid
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT a.qid, a.cid,
       |         (CAST(a.adot AS DOUBLE) / 255 / 1000000000000)
       |           / (sqrt(CAST(nq.sq AS DOUBLE) / 1000000000000)
       |            * sqrt(CAST(r.rsq AS DOUBLE) / 65025 / 1000000000000)) AS cos
       |  FROM adots a
       |  JOIN norms nq ON nq.vec_id = a.qid
       |  JOIN rsq r ON r.vec_id = a.cid)
       |SELECT qid, rn, cid, cos FROM (
       |  SELECT qid, cid, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |  FROM scored)
       |WHERE rn <= 3
       |ORDER BY qid, rn""".stripMargin) { (s, d) =>
    val emb = Tables.parallel(Tables.embeddings(s, d))
    val model = sq8Fit(emb)
    sq8Search(emb, model, emb.filter(col("vec_id") < 8), k = 3)
      .orderBy("qid", "rn")
  }

  /** s23: DIMENSION-TRUNCATION audit (the Matryoshka question): how much
    * ranking quality survives if search uses only the first 16 of 64
    * dimensions? Per query: |full-top-3 ∩ truncated-top-3| and whether
    * the full top-1 survives in the truncated top-3. This is the
    * measured answer to "can the serving tier read a 4× narrower
    * column", the same decision s05/s17 answer for LSH and IVF — run it
    * BEFORE committing a truncated index layout.
    *
    * Both rankings come from ONE scored pair frame (one corpus stream
    * against the broadcast query set, two window ranks over the same
    * qid partitioning — no second scan, no re-shuffle); dots and norms
    * are exact fixed-point longs through `long_dot`, full and sliced.
    */
  val dimTruncation: QueryDef = q(
    "s23_dim_truncation",
    s"""WITH jj AS (SELECT unnest(range(0, 64)) AS jx),
       |x AS (
       |  SELECT vec_id, jx,
       |         CAST(CAST(CAST(embeddings.embedding[CAST(jx + 1 AS INT)] AS DOUBLE)
       |              AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
       |  FROM embeddings, jj),
       |n64 AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS sq
       |        FROM x GROUP BY 1),
       |n16 AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS sq
       |        FROM x WHERE jx < 16 GROUP BY 1),
       |qx AS (SELECT vec_id AS qid, jx, v FROM x WHERE vec_id < 8),
       |dots AS (
       |  SELECT qx.qid, x.vec_id AS cid,
       |         CAST(sum(qx.v * x.v) AS BIGINT) AS d64,
       |         CAST(sum(CASE WHEN x.jx < 16 THEN qx.v * x.v ELSE 0 END)
       |              AS BIGINT) AS d16
       |  FROM x JOIN qx ON qx.jx = x.jx
       |  WHERE x.vec_id <> qx.qid
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.qid, d.cid,
       |    (CAST(d.d64 AS DOUBLE) / 1000000000000)
       |      / (sqrt(CAST(nq.sq AS DOUBLE) / 1000000000000)
       |       * sqrt(CAST(nc.sq AS DOUBLE) / 1000000000000)) AS cos64,
       |    (CAST(d.d16 AS DOUBLE) / 1000000000000)
       |      / (sqrt(CAST(tq.sq AS DOUBLE) / 1000000000000)
       |       * sqrt(CAST(tc.sq AS DOUBLE) / 1000000000000)) AS cos16
       |  FROM dots d
       |  JOIN n64 nq ON nq.vec_id = d.qid
       |  JOIN n64 nc ON nc.vec_id = d.cid
       |  JOIN n16 tq ON tq.vec_id = d.qid
       |  JOIN n16 tc ON tc.vec_id = d.cid),
       |ranked AS (
       |  SELECT qid, cid,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos64 DESC, cid) AS rf,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos16 DESC, cid) AS rt
       |  FROM scored),
       |f AS (SELECT qid, cid, rf FROM ranked WHERE rf <= 3),
       |t AS (SELECT qid, cid FROM ranked WHERE rt <= 3)
       |SELECT f.qid AS qid, count(t.cid) AS n_overlap,
       |       CAST(max(CASE WHEN f.rf = 1 AND t.cid IS NOT NULL
       |                     THEN 1 ELSE 0 END) = 1 AS BOOLEAN) AS top1_kept
       |FROM f LEFT JOIN t ON t.qid = f.qid AND t.cid = f.cid
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.register(s)
    val corpus = Similarity.withQuant(Tables.parallel(Tables.embeddings(s, d)))
      .withColumn("tv", slice(col("qv"), 1, 16))
      .withColumn("tsq", call_function("long_dot", col("tv"), col("tv")))
      .select(col("vec_id").as("cid"), col("qv").as("cv"), col("sq").as("csq"),
        col("tv").as("ctv"), col("tsq").as("ctsq"))
    val qs = Similarity.withQuant(
        Tables.embeddings(s, d).filter(col("vec_id") < 8))
      .withColumn("tv", slice(col("qv"), 1, 16))
      .withColumn("tsq", call_function("long_dot", col("tv"), col("tv")))
      .select(col("vec_id").as("qid"), col("qv"), col("sq"),
        col("tv"), col("tsq"))
    def cosOf(dot: Column, a: Column, b: Column): Column =
      (dot.cast("double") / lit(1.0e12)) /
        (sqrt(a.cast("double") / lit(1.0e12)) *
          sqrt(b.cast("double") / lit(1.0e12)))
    val scored = corpus.join(broadcast(qs), col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        cosOf(call_function("long_dot", col("qv"), col("cv")),
          col("sq"), col("csq")).as("cos64"),
        cosOf(call_function("long_dot", col("tv"), col("ctv")),
          col("tsq"), col("ctsq")).as("cos16"))
    val wf = Window.partitionBy("qid").orderBy(col("cos64").desc, col("cid"))
    val wt = Window.partitionBy("qid").orderBy(col("cos16").desc, col("cid"))
    val ranked = scored
      .withColumn("rf", row_number().over(wf))
      .withColumn("rt", row_number().over(wt))
    val f = ranked.filter(col("rf") <= 3).select(col("qid"), col("cid"), col("rf"))
    val t = ranked.filter(col("rt") <= 3)
      .select(col("qid").as("tqid"), col("cid").as("tcid"))
    f.join(t, col("qid") === col("tqid") && col("cid") === col("tcid"), "left")
      .groupBy(col("qid"))
      .agg(count(col("tcid")).as("n_overlap"),
        (max(when(col("rf") === 1 && col("tcid").isNotNull, 1)
          .otherwise(0)) === 1).as("top1_kept"))
      .orderBy("qid")
  }

  /** s24: MaxSim LATE-INTERACTION scoring (the ColBERT retrieval model):
    * a query is a SET of token vectors, a document is a SET of token
    * vectors, and score(Q, D) = Σ_{q∈Q} max_{d∈D} sim(q, d) — each query
    * token matches its best document token, no pooling to a single
    * vector first. Here the embedding table's `label` groups play the
    * documents (their member vectors are the "tokens") and the 8 lowest
    * vec_ids — which span several labels — play the query token set;
    * those 8 vectors are excluded from every document's token side, so
    * each label is scored on its remaining members only.
    *
    * EXACTNESS: sim is the raw scaled integer dot (`long_dot`, 1e-12
    * units) rather than cosine — max-of-longs and sum-of-longs are both
    * order-independent, so the two-level MaxSim aggregate is
    * deterministic where a float Σ of maxes would depend on merge order
    * (the s17 scaled-integer-DCG discipline). One double division at
    * the end converts to display units.
    *
    * Scale shape: the query token set broadcasts (it is tokens-per-query
    * sized); the corpus token stream is scored map-only, then reduced by
    * (query-token, doc) max and (doc) sum — both map-side-combining
    * aggregates on doc-bounded keyspaces. The corpus is never
    * key-shuffled; cost is one scan + two small exchanges, the same
    * envelope as a single-vector top-k.
    */
  val maxSim: QueryDef = q(
    "s24_maxsim",
    s"""WITH jj AS (SELECT unnest(range(0, 64)) AS jx),
       |x AS (
       |  SELECT vec_id, label, jx,
       |         CAST(CAST(CAST(embeddings.embedding[CAST(jx + 1 AS INT)] AS DOUBLE)
       |              AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
       |  FROM embeddings, jj),
       |qx AS (SELECT vec_id AS qid, jx, v FROM x WHERE vec_id < 8),
       |dots AS (
       |  SELECT qx.qid, x.vec_id AS cid, x.label AS label,
       |         CAST(sum(qx.v * x.v) AS BIGINT) AS dot
       |  FROM x JOIN qx ON qx.jx = x.jx
       |  WHERE x.vec_id >= 8
       |  GROUP BY 1, 2, 3),
       |best AS (
       |  SELECT qid, label, max(dot) AS m
       |  FROM dots GROUP BY 1, 2),
       |sc AS (
       |  SELECT label, count(*) AS n_qtokens, CAST(sum(m) AS BIGINT) AS s
       |  FROM best GROUP BY 1)
       |SELECT CAST(label AS INT) AS label, n_qtokens,
       |       CAST(s AS DOUBLE) / 1000000000000 AS maxsim
       |FROM sc
       |ORDER BY maxsim DESC, label""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.parallel(Tables.embeddings(s, d))
    val corpus = Similarity.withQuant(emb.filter(col("vec_id") >= 8))
      .select(col("vec_id").as("cid"), col("label"), col("qv").as("cv"))
    val qs = Similarity.withQuant(emb.filter(col("vec_id") < 8))
      .select(col("vec_id").as("qid"), col("qv"))
    corpus.join(broadcast(qs))
      .select(col("qid"), col("label"),
        call_function("long_dot", col("qv"), col("cv")).as("dot"))
      .groupBy(col("qid"), col("label"))
      .agg(max(col("dot")).as("m"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_qtokens"), sum(col("m")).as("s"))
      .select(col("label").cast("int").as("label"), col("n_qtokens"),
        (col("s").cast("double") / lit(1.0e12)).as("maxsim"))
      .orderBy(col("maxsim").desc, col("label"))
  }

  /** s25: BINARY quantization ANN — the 1-bit extreme of the compression
    * spectrum (exact ≫ SQ8 s22 ≫ PQ s12/s15 ≫ BQ, 64× smaller than
    * float32). Each vector compresses to its SIGN BITS (two unsigned
    * 32-bit halves — the m08 trick, since constructing bit 63 overflows
    * checked BIGINT arithmetic in the oracle); candidate generation is
    * HAMMING distance (codegen'd `bit_count(xor)` — one XOR + popcount
    * per half, the cheapest distance that exists), top-C = 32 candidates
    * per query pre-trimmed by WindowGroupLimit, then an EXACT `long_dot`
    * cosine re-rank of only C×|queries| pairs. This two-stage shape
    * (cheap screen → exact confirm on survivors) is the s20 contract at
    * 1 bit/dim.
    *
    * Scale shape: sign compression is scan-fused; the Hamming pass
    * streams the corpus against the broadcast query set map-only (no
    * corpus shuffle); the expensive exact dots touch 256 pairs total
    * regardless of corpus size. Determinism: Hamming ties break on cid,
    * so the candidate SET is exact; the re-rank is integer `long_dot`.
    */
  val bqRerank: QueryDef = q(
    "s25_bq_rerank",
    s"""WITH jj AS (SELECT unnest(range(0, 64)) AS jx),
       |x AS (
       |  SELECT vec_id, jx,
       |         CAST(CAST(CAST(embeddings.embedding[CAST(jx + 1 AS INT)] AS DOUBLE)
       |              AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
       |  FROM embeddings, jj),
       |bits AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN jx >= 32 AND v > 0
       |                  THEN CAST(1 AS BIGINT) << (jx - 32) ELSE 0 END)
       |         AS BIGINT) AS bhi,
       |    CAST(sum(CASE WHEN jx < 32 AND v > 0
       |                  THEN CAST(1 AS BIGINT) << jx ELSE 0 END)
       |         AS BIGINT) AS blo
       |  FROM x GROUP BY 1),
       |qb AS (SELECT vec_id AS qid, bhi AS qhi, blo AS qlo FROM bits
       |       WHERE vec_id < 8),
       |ham AS (
       |  SELECT qb.qid, b.vec_id AS cid,
       |         bit_count(xor(qb.qhi, b.bhi)) + bit_count(xor(qb.qlo, b.blo))
       |           AS hd
       |  FROM bits b, qb WHERE b.vec_id <> qb.qid),
       |cand AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |           row_number() OVER (PARTITION BY qid ORDER BY hd, cid) AS rc
       |    FROM ham) WHERE rc <= 32),
       |${Similarity.oracleNorms},
       |dots AS (
       |  SELECT c.qid, c.cid, CAST(sum(qx.v * cx.v) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN x qx ON qx.vec_id = c.qid
       |  JOIN x cx ON cx.vec_id = c.cid AND cx.jx = qx.jx
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.qid, d.cid,
       |         (CAST(d.dot AS DOUBLE) / 1000000000000)
       |           / (sqrt(CAST(nq.sq AS DOUBLE) / 1000000000000)
       |            * sqrt(CAST(nc.sq AS DOUBLE) / 1000000000000)) AS cos
       |  FROM dots d
       |  JOIN norms nq ON nq.vec_id = d.qid
       |  JOIN norms nc ON nc.vec_id = d.cid)
       |SELECT qid, rn, cid, cos FROM (
       |  SELECT qid, cid, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |  FROM scored)
       |WHERE rn <= 3
       |ORDER BY qid, rn""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.parallel(Tables.embeddings(s, d))
    // sign-bit halves, scan-fused from the quantized view (bit weights
    // as a broadcast literal table — shiftleft needs a static distance)
    val pw = typedlit((0 until 32).map(1L << _))
    def bitsOf(df: DataFrame) = Similarity.withQuant(df)
      .withColumn("bhi", aggregate(
        transform(col("qv"), (v, i) =>
          when(i >= 32 && v > 0, element_at(pw, (i - 31).cast("int")))
            .otherwise(lit(0L))),
        lit(0L), (acc, b) => acc + b))
      .withColumn("blo", aggregate(
        transform(col("qv"), (v, i) =>
          when(i < 32 && v > 0, element_at(pw, (i + 1).cast("int")))
            .otherwise(lit(0L))),
        lit(0L), (acc, b) => acc + b))
    val corpus = bitsOf(emb)
      .select(col("vec_id").as("cid"), col("qv").as("cv"),
        col("sq").as("csq"), col("bhi"), col("blo"))
    val qs = bitsOf(emb.filter(col("vec_id") < 8))
      .select(col("vec_id").as("qid"), col("qv"), col("sq"),
        col("bhi").as("qhi"), col("blo").as("qlo"))
    val hd = bit_count(col("qhi").bitwiseXOR(col("bhi"))) +
      bit_count(col("qlo").bitwiseXOR(col("blo")))
    val wc = Window.partitionBy("qid").orderBy(col("hd"), col("cid"))
    val cand = corpus.join(broadcast(qs), col("cid") =!= col("qid"))
      .withColumn("hd", hd)
      .withColumn("rc", row_number().over(wc))
      .filter(col("rc") <= 32)
    val cos = (call_function("long_dot", col("qv"), col("cv")).cast("double")
      / lit(1.0e12)) /
      (sqrt(col("sq").cast("double") / lit(1.0e12)) *
        sqrt(col("csq").cast("double") / lit(1.0e12)))
    val wr = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    cand.select(col("qid"), col("cid"), cos.as("cos"))
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("rn"), col("cid"), col("cos"))
      .orderBy("qid", "rn")
  }

  /** The s26 oracle, ASSEMBLED from the lanes' own gated oracle texts
    * (see [[compressionFrontier]]'s scaladoc): each serving-tier lane is
    * the SQL that already hash-gates that method, spliced in as a
    * subquery; recall@3 is the counted intersection against the exact
    * baseline. A `def` so splice order is independent of this object's
    * val-initialization order (`ivfSq` is declared below the frontier).
    */
  private def frontierOracle: String = {
    val xi = "CAST(CAST(CAST(e.embedding[CAST(j.j AS INT)] AS DOUBLE)" +
      " AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    val cosSql =
      """         (CAST(d.dot AS DOUBLE) / 1000000000000)
        |           / (sqrt(CAST(nq.sq AS DOUBLE) / 1000000000000)
        |            * sqrt(CAST(nc.sq AS DOUBLE) / 1000000000000)) AS cos""".stripMargin
    // the engine's exactTopK restated (self excluded, ties on cid)
    val exactSql =
      s"""WITH ${Similarity.oracleNorms},
         |xx AS (SELECT e.vec_id, j.j AS jx, $xi AS v FROM embeddings e, j),
         |qx AS (SELECT vec_id AS qid, jx, v FROM xx WHERE vec_id < 8),
         |dots AS (
         |  SELECT qx.qid, xx.vec_id AS cid,
         |         CAST(sum(qx.v * xx.v) AS BIGINT) AS dot
         |  FROM xx JOIN qx ON qx.jx = xx.jx WHERE xx.vec_id <> qx.qid
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.qid, d.cid,
         |$cosSql
         |  FROM dots d
         |  JOIN norms nq ON nq.vec_id = d.qid
         |  JOIN norms nc ON nc.vec_id = d.cid)
         |SELECT qid, cid FROM (
         |  SELECT qid, cid,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
         |  FROM scored) ranked WHERE rn <= 3""".stripMargin
    // 16-of-64 truncation: sliced dots and norms, same ranking law
    val truncSql =
      s"""WITH j AS (SELECT unnest(range(1, 65)) AS j),
         |xx AS (SELECT e.vec_id, j.j AS jx, $xi AS v FROM embeddings e, j),
         |n16 AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS sq
         |        FROM xx WHERE jx <= 16 GROUP BY 1),
         |qx AS (SELECT vec_id AS qid, jx, v
         |       FROM xx WHERE vec_id < 8 AND jx <= 16),
         |dots AS (
         |  SELECT qx.qid, xx.vec_id AS cid,
         |         CAST(sum(qx.v * xx.v) AS BIGINT) AS dot
         |  FROM xx JOIN qx ON qx.jx = xx.jx
         |  WHERE xx.jx <= 16 AND xx.vec_id <> qx.qid
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.qid, d.cid,
         |$cosSql
         |  FROM dots d
         |  JOIN n16 nq ON nq.vec_id = d.qid
         |  JOIN n16 nc ON nc.vec_id = d.cid)
         |SELECT qid, cid FROM (
         |  SELECT qid, cid,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
         |  FROM scored) ranked WHERE rn <= 3""".stripMargin
    def lane(name: String, sql: String): String =
      s"$name AS (SELECT qid, cid FROM (\n$sql\n) ${name}_t)"
    def recall(name: String): String =
      s"((SELECT CAST(count(*) AS DOUBLE) FROM $name t " +
        s"JOIN exact3 x3 ON x3.qid = t.qid AND x3.cid = t.cid) / " +
        "(SELECT CAST(count(*) AS DOUBLE) FROM exact3))"
    // s27's oracle verbatim, its query-set constant rebased to this
    // audit's 8-query set (the single `vec_id < 10` is that constant)
    val ivfsqSql = ivfSq.oracle.get.replace("vec_id < 10", "vec_id < 8")
    Seq(
      "WITH " + lane("exact3", exactSql) + ",",
      lane("truncl", truncSql) + ",",
      lane("sq8l", sq8Adc.oracle.get) + ",",
      lane("pql", Similarity.pqAdc.oracle.get) + ",",
      lane("bql", bqRerank.oracle.get) + ",",
      lane("ivfl", ivfsqSql),
      "SELECT method, bytes_per_vec, recall_at_3 FROM (",
      "  SELECT 'exact_f32' AS method, CAST(256 AS BIGINT) AS bytes_per_vec,",
      "         CAST(1.0 AS DOUBLE) AS recall_at_3",
      s"  UNION ALL SELECT 'trunc_16of64', CAST(64 AS BIGINT), ${recall("truncl")}",
      s"  UNION ALL SELECT 'sq8', CAST(64 AS BIGINT), ${recall("sq8l")}",
      s"  UNION ALL SELECT 'ivfsq_nprobe2', CAST(72 AS BIGINT), ${recall("ivfl")}",
      s"  UNION ALL SELECT 'pq_m4', CAST(4 AS BIGINT), ${recall("pql")}",
      s"  UNION ALL SELECT 'bq_1bit', CAST(8 AS BIGINT), ${recall("bql")}",
      ") f ORDER BY bytes_per_vec DESC, method"
    ).mkString("\n")
  }

  /** s26: the COMPRESSION FRONTIER — every serving tier measured on the
    * same query set against the same exact baseline, in one result:
    * bytes/vector vs recall@3. This is the table a platform team reads
    * before choosing an index layout; every row is produced by the
    * engine's own registered operators (exact `long_dot` scan, 16-of-64
    * truncation, SQ8 ADC s22, PQ ADC s12's config, BQ+re-rank s25), so
    * the frontier stays honest as those operators evolve.
    *
    * Oracle-gated BY COMPOSITION (r11, closing the r10 `no_oracle` gap):
    * the oracle assembles the frontier FROM the very oracle texts that
    * already gate each lane — s22's, s12's and s25's oracle SQL are
    * spliced in verbatim as subqueries (s27's with its query-set
    * constant rebased 10→8 to match this audit's query set), the exact
    * baseline and the 16-of-64 truncation are restated in the same
    * exact-integer idiom, and recall@3 is the counted intersection over
    * the 24 exact pairs — so DuckDB independently re-derives every
    * recall number and the driver hash-compares the assembled table.
    * The spec still pins the structural invariants: exact = 1.0, every
    * recall in [0,1], bytes states the real footprint ordering.
    */
  lazy val compressionFrontier: QueryDef = QueryDef(
    "s26_compression_frontier", Some(frontierOracle), (s, d) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.parallel(Tables.embeddings(s, d))
      val queries = emb.filter(col("vec_id") < 8)
      val k = 3
      val exact = Similarity.exactTopK(emb, queries, k)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      def recallOf(df: DataFrame): Double = {
        val got = df.select("qid", "cid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (exact & got).size.toDouble / exact.size
      }
      // 16-of-64 truncation: rank by the sliced dot (s23's candidate law)
      val wq = Similarity.withQuant(emb)
        .withColumn("tv", slice(col("qv"), 1, 16))
        .withColumn("tsq", call_function("long_dot", col("tv"), col("tv")))
      val corp16 = wq.select(col("vec_id").as("cid"), col("tv").as("ctv"),
        col("tsq").as("ctsq"))
      val qs16 = wq.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("tv"), col("tsq"))
      val cos16 = (call_function("long_dot", col("tv"), col("ctv"))
        .cast("double") / lit(1.0e12)) /
        (sqrt(col("tsq").cast("double") / lit(1.0e12)) *
          sqrt(col("ctsq").cast("double") / lit(1.0e12)))
      val w16 = Window.partitionBy("qid").orderBy(col("c16").desc, col("cid"))
      val trunc = corp16.join(broadcast(qs16), col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"), cos16.as("c16"))
        .withColumn("rn", row_number().over(w16)).filter(col("rn") <= k)

      // the five serving-tier lanes are mutually independent (each trains
      ///probes its own index over the same immutable scan and ends in a
      // bounded recall collect) but each one is a chain of driver actions
      // — sequentially they serialized ~10 small jobs end to end.
      // Overlapped per guide §2.6: lane recalls are computed concurrently
      // and assembled in a fixed order, so the result is unchanged.
      val recalls = graft.Par.all[Double](
        () => recallOf(trunc),
        () => recallOf(sq8Search(emb, sq8Fit(emb), queries, k)),
        () => recallOf(ivfSqSearch(
          Similarity.ivfIndex(emb, nlist = 8, iters = 1),
          emb.filter(col("vec_id") < 8), k, nprobe = 2)),
        () => recallOf(Similarity.pqSearch(
          Similarity.pqIndex(emb, m = 4, ksub = 4, iters = 1), queries, k)),
        () => recallOf(bqRerank.run(s, d))) // the registered s25 pipeline

      Seq(
        ("exact_f32", 256L, 1.0),
        ("trunc_16of64", 64L, recalls(0)),
        ("sq8", 64L, recalls(1)),
        // 64 residual codes + the list id — routing loss included
        ("ivfsq_nprobe2", 72L, recalls(2)),
        ("pq_m4", 4L, recalls(3)),
        ("bq_1bit", 8L, recalls(4)))
        .toDF("method", "bytes_per_vec", "recall_at_3")
        .orderBy(col("bytes_per_vec").desc, col("method"))
    })

  /** IVF-SQ search: centroid routing + SQ8-compressed RESIDUALS — the
    * FAISS `IVF,SQ8` layout, completing the engine's quantized-index
    * family (IVF-Flat s03/s10, IVF-PQ s15, flat SQ8 s22). Residuals
    * (vector − assigned centroid) span a far tighter range than raw
    * vectors, so the same 8 bits buy finer resolution; reconstruction is
    * centroid + dequantized residual, exact in ×255 longs throughout:
    * rec255 = 255·c + 255·mn + code·rg.
    *
    * Scale shape: the residual fit is one 128-cell aggregate; encode is
    * scan-fused with the centroid table broadcast (nlist rows); probing
    * and the candidate join are [[Similarity.ivfSearch]]'s shapes
    * (probe set broadcast at audit scale, corpus never key-shuffles);
    * ADC touches only probed-list members.
    */
  def ivfSqSearch(model: Similarity.IvfModel, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val spark = model.assignments.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val centDf = model.centroids
      .map { case (cid, cv, csq) => (cid, cv.toSeq, csq) }
      .toDF("ccid", "ccv", "c_sq")
    val withCent = model.assignments
      .join(broadcast(centDf), col("cid") === col("ccid"))
      .withColumn("rv", zip_with(col("qv"), col("ccv"), (a, b) => a - b))
    val aggs = (1 to 64).flatMap { i =>
      Seq(min(element_at(col("rv"), i)).as(s"mn$i"),
        max(element_at(col("rv"), i)).as(s"mx$i"))
    }
    val row = withCent.agg(aggs.head, aggs.tail: _*).head()
    require(!row.isNullAt(0),
      "ivfSqSearch: empty IVF assignments — cannot fit the residual " +
        "quantizer on 0 vectors")
    val mins = (0 until 64).map(i => row.getLong(2 * i))
    val ranges = (0 until 64).map(i => row.getLong(2 * i + 1) - mins(i))
    val minsLit = typedlit(mins)
    val rangesLit = typedlit(ranges)
    val enc = withCent
      .withColumn("codes", transform(col("rv"), codeLambda(minsLit, rangesLit)))
      .withColumn("rec", transform(col("codes"), (cd, i) => {
        lit(255L) * element_at(col("ccv"), (i + 1).cast("int")) +
          lit(255L) * element_at(minsLit, (i + 1).cast("int")) +
          cd * element_at(rangesLit, (i + 1).cast("int"))
      }))
      .withColumn("rsq", call_function("long_dot", col("rec"), col("rec")))
      .select(col("vec_id"), col("cid"), col("rec"), col("rsq"))
    val qs = Similarity.withQuant(queries)
      .select(col("vec_id").as("qid"), col("qv").as("qe"), col("sq").as("q_sq"))
    val pcos = (call_function("long_dot", col("qe"), col("ccv"))
      .cast("double") / lit(1.0e12)) /
      (sqrt(col("q_sq").cast("double") / lit(1.0e12)) *
        sqrt(col("c_sq").cast("double") / lit(1.0e12)))
    val wp = Window.partitionBy("qid").orderBy(col("pcos").desc, col("ccid"))
    val probes = qs.crossJoin(broadcast(centDf))
      .withColumn("pcos", pcos)
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("qe"), col("q_sq"), col("ccid").as("pcid"))
    val adcCos = (call_function("long_dot", col("qe"), col("rec"))
      .cast("double") / lit(255.0) / lit(1.0e12)) /
      (sqrt(col("q_sq").cast("double") / lit(1.0e12)) *
        sqrt(col("rsq").cast("double") / lit(65025.0) / lit(1.0e12)))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    enc.join(broadcast(probes),
        col("cid") === col("pcid") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"), adcCos.as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "rn", "cid", "cos")
  }

  /** s27: the IVF-SQ gate — s10's trained routing chain composed with
    * the residual SQ8 encode, restated end-to-end by the oracle (the
    * shared seeded+trained k-means CTEs, then residuals, per-dim
    * min/max, remainder-exact codes, ×255 centroid+residual
    * reconstruction and the ADC ranking).
    */
  val ivfSq: QueryDef = {
    val xi = "CAST(CAST(CAST(e.embedding[CAST(j.j AS INT)] AS DOUBLE)" +
      " AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    q("s27_ivfsq_adc",
      s"""WITH ${Similarity.oracleNorms},
         |${Similarity.oracleAssign},
         |${Similarity.oracleTrainedAssign},
         |xf AS (SELECT e.vec_id, j.j AS dim, $xi AS v FROM embeddings e, j),
         |res AS (
         |  SELECT a2.vec_id, nc.dim, xf.v - nc.c AS r
         |  FROM assign2 a2
         |  JOIN xf ON xf.vec_id = a2.vec_id
         |  JOIN nc ON nc.cid = a2.cid AND nc.dim = xf.dim),
         |rmm AS (SELECT dim, min(r) AS mn, max(r) - min(r) AS rg
         |        FROM res GROUP BY 1),
         |rcodes AS (
         |  SELECT res.vec_id, res.dim,
         |         CASE WHEN rmm.rg = 0 THEN 0
         |              ELSE ((res.r - rmm.mn) * 255) // rmm.rg END AS code
         |  FROM res JOIN rmm ON rmm.dim = res.dim),
         |rec AS (
         |  SELECT rcodes.vec_id, rcodes.dim,
         |         255 * nc.c + 255 * rmm.mn + rcodes.code * rmm.rg AS rv
         |  FROM rcodes
         |  JOIN rmm ON rmm.dim = rcodes.dim
         |  JOIN assign2 a2 ON a2.vec_id = rcodes.vec_id
         |  JOIN nc ON nc.cid = a2.cid AND nc.dim = rcodes.dim),
         |rqn AS (SELECT vec_id, CAST(sum(rv * rv) AS BIGINT) AS rsq
         |        FROM rec GROUP BY 1),
         |probes AS (SELECT qid, cid FROM (
         |  SELECT vec_id AS qid, cid,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
         |  FROM ascore2 WHERE vec_id < 10) WHERE rn <= 2),
         |cand AS (
         |  SELECT p.qid, a.vec_id AS cid
         |  FROM probes p JOIN assign2 a ON a.cid = p.cid AND a.vec_id <> p.qid),
         |adc AS (
         |  SELECT cand.qid, cand.cid, CAST(sum(xq.v * rec.rv) AS BIGINT) AS adot
         |  FROM cand
         |  JOIN xf xq ON xq.vec_id = cand.qid
         |  JOIN rec ON rec.vec_id = cand.cid AND rec.dim = xq.dim
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT a.qid, a.cid,
         |         (CAST(a.adot AS DOUBLE) / 255 / 1000000000000)
         |           / (sqrt(CAST(nq.sq AS DOUBLE) / 1000000000000)
         |            * sqrt(CAST(r.rsq AS DOUBLE) / 65025 / 1000000000000)) AS cos
         |  FROM adc a
         |  JOIN norms nq ON nq.vec_id = a.qid
         |  JOIN rqn r ON r.vec_id = a.cid)
         |SELECT qid, rn, cid, cos FROM (
         |  SELECT qid, cid, cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
         |  FROM scored)
         |WHERE rn <= 3
         |ORDER BY qid, rn""".stripMargin) { (s, d) =>
      val emb = Tables.parallel(Tables.embeddings(s, d))
      val model = Similarity.ivfIndex(emb, nlist = 8, iters = 1)
      ivfSqSearch(model, emb.filter(col("vec_id") < 10), k = 3, nprobe = 2)
        .orderBy("qid", "rn")
    }
  }

  def defs: Seq[QueryDef] =
    Seq(sq8Adc, dimTruncation, maxSim, bqRerank, compressionFrontier, ivfSq)
}
