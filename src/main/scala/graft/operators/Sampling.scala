package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Deterministic sampling operators over `documents` — the corpus-curation
  * family of a training-data pipeline: Bernoulli sampling, per-stratum
  * rate control, and train/val/test splitting.
  *
  * All three are HASH-based, not RNG-based: membership of a row is a pure
  * function of its key (`md5(key)` prefix compared against a hex
  * threshold), so a sample is
  *   - reproducible across runs, engines, and cluster sizes (no seed
  *     plumbing, no partition-order sensitivity — `sample()`'s per-split
  *     RNG changes with partitioning; this never does);
  *   - stable under re-partitioning and retries (a straggler retry sees
  *     the same decision);
  *   - composable: the same row lands in the same split everywhere, so
  *     train/test contamination cannot arise between pipelines.
  *
  * Scale shape: scan → codegen'd filter. No shuffle, no driver state; the
  * only exchanges in the queries below are the tiny count aggregates on
  * top. A lowercase-hex string comparison IS an unsigned numeric
  * comparison (fixed width, same alphabet), which is what makes the
  * predicate expressible identically in Spark and ANSI SQL.
  */
object Sampling {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  /** Two-hex-digit bucket of a key column: 256 deterministic buckets. */
  private def bucketCol(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  /** Threshold literal: keep ~fraction of rows (resolution 1/256). A full
    * rate returns "g", which sorts after every lowercase-hex pair — "100"
    * (three chars) would compare LEXICOGRAPHICALLY and break the bucket
    * arithmetic ("a0" < "100" is false).
    */
  private def thresholdHex(fraction: Double): String = {
    val k = math.round(fraction * 256).toInt
    if (k >= 256) "g" else f"$k%02x"
  }

  /** Deterministic Bernoulli sample: keeps ~`fraction` of rows, decided by
    * the md5 bucket of `key`. Pure narrow transformation.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(bucketCol(key) < lit(thresholdHex(fraction)))

  /** Per-stratum deterministic sampling: each stratum value keeps its own
    * fraction (default for unlisted strata). The 100 TB use: rebalancing a
    * source/language mix without a shuffle — still scan → filter.
    */
  def stratifiedSample(
      df: DataFrame, strata: Column, key: Column,
      fractions: Map[String, Double], default: Double = 1.0): DataFrame = {
    val thr = fractions.foldLeft(lit(thresholdHex(default))) {
      case (acc, (value, f)) => when(strata === value, lit(thresholdHex(f))).otherwise(acc)
    }
    df.filter(bucketCol(key) < thr)
  }

  /** Deterministic train/val/test assignment from the same hash bucket:
    * [0, train) → "train", [train, train+val) → "val", rest → "test".
    * Keyed on a stable id, the split survives any reprocessing.
    */
  def split(df: DataFrame, key: Column,
      train: Double = 0.8, validation: Double = 0.1): DataFrame = {
    val b = bucketCol(key)
    df.withColumn("split",
      when(b < lit(thresholdHex(train)), "train")
        .when(b < lit(thresholdHex(train + validation)), "val")
        .otherwise("test"))
  }

  /** ~25% Bernoulli sample of documents (threshold 0x40 = 64/256), counted
    * per language — the count makes the oracle comparison cover every
    * sampled row while keeping the result small.
    */
  val sampleHash: QueryDef = q(
    "p01_sample_hash",
    """SELECT lang, count(*) AS n_kept, min(doc_id) AS first_doc
      |FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    hashSample(Tables.documents(s, d), col("doc_id"), 0.25)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_doc"))
      .orderBy("lang")
  }

  /** Stratified rates per language (en kept at 25%, others in full),
    * reported as kept-vs-total per language.
    */
  val sampleStratified: QueryDef = q(
    "p02_sample_stratified",
    """SELECT lang,
      |       count(*) AS n_total,
      |       count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
      |         < CASE WHEN lang = 'en' THEN '40' ELSE 'g' END) AS n_kept
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    val doc = Tables.documents(s, d)
    val kept = when(col("lang") === "en", lit(thresholdHex(0.25)))
      .otherwise(lit(thresholdHex(1.0)))
    doc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        count(when(bucketCol(col("doc_id")) < kept, 1)).as("n_kept"))
      .orderBy("lang")
  }

  /** Deterministic 80/10/10 split, audited per source: every (source,
    * split) cell with its row count and id checksum, so the oracle check
    * covers the exact assignment, not just the sizes.
    */
  val sampleSplit: QueryDef = q(
    "p03_split_train",
    """SELECT source,
      |       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
      |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |            ELSE 'test' END AS split,
      |       count(*) AS n,
      |       CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM documents
      |GROUP BY 1, 2
      |ORDER BY source, split""".stripMargin) { (s, d) =>
    split(Tables.documents(s, d), col("doc_id"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
      .orderBy("source", "split")
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * rows ("packs"). Docs land in 16 hash shards (embarrassingly
    * parallel), are ordered deterministically within the shard, and a
    * running token count opens a new pack each time the 2048-token budget
    * would... be exceeded by strict accumulation: pack index =
    * floor(cumulative-tokens-before-this-doc / budget), the streaming
    * formulation every packer (e.g. for LLM pretraining rows) reduces to
    * when oversized docs must not stall the line.
    *
    * One window per shard (16 independent sorts — at 100 TB each shard
    * sorts in parallel and no global order is ever needed); token counts
    * reuse t03's whitespace tokenizer. Everything is integer arithmetic.
    */
  val sequencePack: QueryDef = q(
    "p04_sequence_pack",
    """WITH toks AS (
      |  SELECT doc_id,
      |         CAST(strpos('0123456789abcdef',
      |               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
      |           AS shard,
      |         len(regexp_extract_all(text, '\S+')) AS n_tokens
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, shard, n_tokens,
      |         CAST((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |                ROWS UNBOUNDED PRECEDING) - n_tokens) // 2048 AS BIGINT)
      |           AS pack
      |  FROM toks)
      |SELECT shard, pack, count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
      |       min(doc_id) AS first_doc
      |FROM packed
      |GROUP BY shard, pack
      |ORDER BY shard, pack""".stripMargin) { (s, d) =>
    val shard = (expr("instr('0123456789abcdef', " +
      "substr(md5(cast(doc_id as string)), 1, 1))") - 1).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"), shard.as("shard"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
          .cast("long").as("n_tokens"))
      .withColumn("pack",
        expr("CAST((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) " +
          "div 2048 AS BIGINT)"))
      .groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("shard", "pack")
  }

  /** Token-budget audit per (source, split): whitespace token totals and
    * means over the deterministic 80/10/10 assignment — the accounting
    * that drives training-mixture weights (how many tokens each source
    * contributes to each split). Pure composition of [[split]] and the
    * t03 token counter: one scan, one aggregate exchange; the mean
    * divides two exact BIGINTs, deterministic on both engines.
    */
  val tokenBudget: QueryDef = q(
    "p05_token_budget",
    """SELECT source,
      |       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
      |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |            ELSE 'test' END AS split,
      |       count(*) AS n_docs,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |       CAST(sum(len(string_split(text, ' '))) * 1000000
      |            // count(*) AS BIGINT) AS mean_tokens_micro
      |FROM documents
      |GROUP BY 1, 2
      |ORDER BY source, split""".stripMargin) { (s, d) =>
    split(Tables.documents(s, d), col("doc_id"))
      .withColumn("n_tok", size(org.apache.spark.sql.functions.split(col("text"), " ")).cast("long"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .select(col("source"), col("split"), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 1000000 div n_docs").as("mean_tokens_micro"))
      .orderBy("source", "split")
  }

  /** Budgeted language rebalancing — the "mixture weights" operator of a
    * multilingual corpus: cap the corpus at a T = N/2 row budget spread
    * UNIFORMLY across languages (each language targets T/K rows; languages
    * under their share keep everything). Membership stays a pure hash
    * decision, so the plan is two tiny broadcast aggregates (per-language
    * counts; corpus totals) feeding a scan-side filter — the corpus itself
    * never shuffles before the final per-language count.
    *
    * The keep rule is INTEGER-EXACT end to end:
    *   keep  ⇔  bucket · K · n_lang  <  256 · (N div 2)
    * (bucket = first md5 byte of doc_id) — equivalent to sampling language
    * s at rate min(1, T/(K·n_s)) in 1/256 granularity, with no
    * floating-point rate whose last bit could disagree across engines.
    */
  val langRebalance: QueryDef = q(
    "p06_lang_rebalance",
    """WITH n AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
      |t AS (SELECT count(*) AS n_total, count(DISTINCT lang) AS k_langs
      |      FROM documents),
      |kept AS (
      |  SELECT d.lang, d.doc_id, n.n_lang
      |  FROM documents d JOIN n USING (lang) CROSS JOIN t
      |  WHERE (16 * (strpos('0123456789abcdef',
      |                      substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1)
      |         + (strpos('0123456789abcdef',
      |                   substr(md5(CAST(d.doc_id AS VARCHAR)), 2, 1)) - 1))
      |        * t.k_langs * n.n_lang < 256 * (t.n_total // 2))
      |SELECT lang, min(n_lang) AS n_lang, count(*) AS n_kept,
      |       min(doc_id) AS first_doc
      |FROM kept GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val perLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val totals = docs.agg(count(lit(1)).as("n_total"),
      countDistinct(col("lang")).as("k_langs"))
    val bucket = expr(
      "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS BIGINT)")
    docs.select(col("lang"), col("doc_id"))
      .join(broadcast(perLang), "lang")
      .crossJoin(broadcast(totals))
      .filter(bucket * col("k_langs") * col("n_lang") <
        lit(256L) * expr("n_total div 2"))
      .groupBy(col("lang"))
      .agg(min(col("n_lang")).as("n_lang"), count(lit(1)).as("n_kept"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("lang")
  }

  /** Deterministic REPEAT upsampling — the other half of mixture control
    * (p06 downsamples over-represented languages; this replicates under-
    * represented ones). Each language gets an integer repeat factor
    * `min(3, max(1, n_max div n_lang))`; every doc is emitted once per
    * epoch 1..factor. The epoch index makes replicas distinguishable
    * downstream (shuffling into training shards, seeding augmentations)
    * without any RNG.
    *
    * Scale shape: per-language stats broadcast; replication is a row-local
    * generator (`explode(sequence)`) fused into the scan projection — the
    * corpus never shuffles, output is produced streaming at factor× read
    * rate. The only exchange is the final per-language audit aggregate.
    */
  val repeatUpsample: QueryDef = q(
    "p07_repeat_upsample",
    """WITH n AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
      |m AS (SELECT max(n_lang) AS max_n FROM n),
      |f AS (SELECT lang, n_lang,
      |             least(3, greatest(1, max_n // n_lang)) AS factor
      |      FROM n CROSS JOIN m),
      |rep AS (SELECT d.doc_id, d.lang, f.factor,
      |               unnest(range(1, f.factor + 1)) AS epoch
      |        FROM documents d JOIN f USING (lang))
      |SELECT lang, CAST(min(factor) AS BIGINT) AS factor,
      |       count(*) AS n_rows, CAST(sum(epoch) AS BIGINT) AS sum_epoch,
      |       min(doc_id) AS first_doc
      |FROM rep GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val n = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val m = n.agg(max(col("n_lang")).as("max_n"))
    val f = n.crossJoin(broadcast(m))
      .select(col("lang"),
        least(lit(3L), greatest(lit(1L), expr("max_n div n_lang"))).as("factor"))
    docs.select(col("lang"), col("doc_id"))
      .join(broadcast(f), "lang")
      .select(col("lang"), col("doc_id"), col("factor"),
        explode(expr("sequence(1L, factor)")).as("epoch"))
      .groupBy(col("lang"))
      .agg(min(col("factor")).as("factor"), count(lit(1)).as("n_rows"),
        sum(col("epoch")).as("sum_epoch"), min(col("doc_id")).as("first_doc"))
      .orderBy("lang")
  }

  /** Deterministic GLOBAL SHUFFLE into training shards — the "shuffle the
    * corpus before training" step every LLM pipeline runs. Order must not
    * correlate with ingest order (source/time locality poisons SGD), must
    * be reproducible, and must not cost a global sort.
    *
    * Two independent md5 slices of the key give the shard (first byte,
    * mod `numShards` — 256 % numShards == 0 keeps it uniform for the
    * power-of-two shard counts training uses) and the within-shard sort
    * key (next 8 hex chars, 32 bits). Scale shape: assignment is a
    * codegen'd scan-fused map; the ONLY movement is one hash exchange on
    * the shard id plus an in-partition sort (spillable) — never a global
    * range sort, no RNG, no driver state; shard count is decoupled from
    * cluster size, and a straggler retry reproduces its partition
    * bit-identically.
    */
  /** Pure shard/sort-key ASSIGNMENT (columns only, no movement): what the
    * audit query reads — stats over the assignment are partition-
    * independent, so p08 never pays the physical repartition + sort.
    */
  def shardAssign(df: DataFrame, key: Column, numShards: Int): DataFrame = {
    require(numShards > 0 && 256 % numShards == 0,
      s"numShards must divide 256 for uniform byte-bucket assignment: $numShards")
    val h = md5(key.cast("string"))
    df.withColumn("shard",
        conv(substring(h, 1, 2), 16, 10).cast("long") % numShards)
      .withColumn("sort_key",
        conv(substring(h, 3, 8), 16, 10).cast("long"))
  }

  def shuffleShards(df: DataFrame, key: Column, numShards: Int): DataFrame =
    shardAssign(df, key, numShards)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("sort_key"))

  /** Writes the shuffled corpus as one directory per shard
    * (`path/shard=N/`), each shard's files in deterministic `sort_key`
    * order — the layout a data loader streams sequentially per worker.
    */
  def writeTrainingShards(
      df: DataFrame, key: Column, numShards: Int, path: String): Unit =
    shuffleShards(df, key, numShards)
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** p08: the shard-assignment audit — per-shard row count, token mass,
    * id checksum, and the sort-key range. This is the balance/determinism
    * check run before a training job trusts a shard layout: uniform
    * counts, full coverage, reproducible assignment.
    */
  val shardStats: QueryDef = q(
    "p08_shard_stats",
    """SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) % 8 AS shard,
      |       count(*) AS n_docs,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |       min(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 8) AS BIGINT)) AS min_key,
      |       max(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 8) AS BIGINT)) AS max_key
      |FROM documents
      |GROUP BY 1
      |ORDER BY shard""".stripMargin) { (s, d) =>
    // shardAssign, not shuffleShards: the audit's aggregates are
    // partition-independent, so the physical repartition + in-partition
    // sort would be pure waste here (they're exercised by SamplingSpec
    // and the shard writer)
    shardAssign(Tables.documents(s, d), col("doc_id"), 8)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(org.apache.spark.sql.functions.split(col("text"), " "))
          .cast("long")).as("n_tokens"),
        sum(col("doc_id")).as("id_sum"),
        min(col("sort_key")).as("min_key"),
        max(col("sort_key")).as("max_key"))
      .orderBy("shard")
  }

  /** p09: curriculum staging — order the corpus "easy → hard" into four
    * training stages by a difficulty score (here t07's repetition ratio in
    * micro-units: low-repetition text first) WITHOUT a global sort.
    *
    * The naive formulation is `ntile(4) OVER (ORDER BY score)` — a single
    * total-order window, i.e. a one-partition global range sort that no
    * 100 TB corpus can pay. This implementation exploits the score being
    * a BOUNDED integer (0..1e6 by construction): aggregate the corpus to
    * a per-score histogram (≤1e6 rows however large the corpus, O(1)
    * state per key), take cumulative counts on that tiny table (the one
    * window runs over the histogram, not the corpus), pick the three
    * quartile boundary scores, broadcast them back, and assign
    *   stage = 1 + (score > q1) + (score > q2) + (score > q3)
    * as a scan-fused comparison. Ties at a boundary all land in the lower
    * stage (stages deviate from N/4 by at most the boundary score's tie
    * mass — the deterministic resolution both engines agree on).
    *
    * The audit reports per-stage doc counts, token mass, score range, and
    * an id checksum, so the oracle pins the exact assignment.
    *
    * The corpus IS scanned twice (histogram pass + assignment pass) — the
    * t08 trade: recomputing a row-local score on a second streaming scan
    * beats shuffling or pinning the corpus to share one; the total row
    * count comes from the histogram, not a third scan.
    */
  val curriculumStages: QueryDef = q(
    "p09_curriculum",
    """WITH sc AS (
      |  SELECT doc_id,
      |         CAST((len(string_split(text, ' '))
      |               - len(list_distinct(string_split(text, ' '))))
      |              * 1000000 // len(string_split(text, ' ')) AS BIGINT) AS score,
      |         len(string_split(text, ' ')) AS n_tok
      |  FROM documents),
      |h AS (SELECT score, count(*) AS c FROM sc GROUP BY score),
      |cum AS (SELECT score, sum(c) OVER (ORDER BY score) AS cum FROM h),
      |n AS (SELECT sum(c) AS n FROM h),
      |qs AS (SELECT min(CASE WHEN cum * 4 >= n THEN score END) AS q1,
      |              min(CASE WHEN cum * 2 >= n THEN score END) AS q2,
      |              min(CASE WHEN cum * 4 >= 3 * n THEN score END) AS q3
      |       FROM cum CROSS JOIN n)
      |SELECT 1 + CAST(score > q1 AS INT) + CAST(score > q2 AS INT)
      |         + CAST(score > q3 AS INT) AS stage,
      |       count(*) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |       min(score) AS min_score, max(score) AS max_score,
      |       CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM sc CROSS JOIN qs
      |GROUP BY 1
      |ORDER BY stage""".stripMargin) { (s, d) =>
    // `split` is shadowed by this module's train/val/test splitter
    val ws = org.apache.spark.sql.functions.split(col("text"), " ")
    val sc = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("""CAST((size(split(text, ' ')) - size(array_distinct(split(text, ' '))))
                |     * 1000000 div size(split(text, ' ')) AS BIGINT)""".stripMargin)
          .as("score"),
        size(ws).cast("long").as("n_tok"))
    val h = sc.groupBy(col("score")).agg(count(lit(1)).as("c"))
    // the cumulative window runs over the ≤1e6-row histogram — a single
    // partition is fine THERE; the corpus itself never sorts
    val cum = h.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // corpus total from the HISTOGRAM, not a third corpus scan
    val n = h.agg(sum(col("c")).as("n"))
    val qs = cum.crossJoin(broadcast(n)).agg(
      min(when(col("cum") * 4 >= col("n"), col("score"))).as("q1"),
      min(when(col("cum") * 2 >= col("n"), col("score"))).as("q2"),
      min(when(col("cum") * 4 >= lit(3) * col("n"), col("score"))).as("q3"))
    sc.crossJoin(broadcast(qs))
      .select(col("doc_id"), col("n_tok"), col("score"),
        (lit(1) + (col("score") > col("q1")).cast("int")
          + (col("score") > col("q2")).cast("int")
          + (col("score") > col("q3")).cast("int")).as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy("stage")
  }

  /** Per-group deterministic cap: keep at most `cap` rows per value of
    * `group`, selected by hash rank — a uniform without-replacement sample
    * of each group, reproducible across runs and engines (the Common-Crawl
    * "domain cap" move: no single domain may dominate the corpus).
    *
    * Scale shape: ranking partitions by the group key; the `rn <= cap`
    * filter directly above the window engages WindowGroupLimit, so each
    * task keeps a running top-`cap` per group instead of buffering a hot
    * domain's full row set before trimming.
    */
  def groupCap(df: DataFrame, group: Column, key: Column, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(group)
      .orderBy(md5(key.cast("string")), key)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= cap)
  }

  /** p10: source-cap audit — every source capped at 10 docs; reports the
    * kept count and id checksum next to the uncapped total, so the oracle
    * pins the exact hash-ranked selection. Two tiny aggregates (kept side
    * pre-trimmed by WindowGroupLimit) joined by broadcast.
    */
  val sourceCap: QueryDef = q(
    "p10_source_cap",
    """WITH r AS (
      |  SELECT source, doc_id,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
      |           AS rn
      |  FROM documents),
      |k AS (SELECT source, count(*) AS n_kept,
      |             CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
      |      FROM r WHERE rn <= 10 GROUP BY source),
      |t AS (SELECT source, count(*) AS n_total FROM documents GROUP BY source)
      |SELECT source, n_total, n_kept, kept_id_sum
      |FROM t JOIN k USING (source)
      |ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val kept = groupCap(docs.select(col("source"), col("doc_id")),
        col("source"), col("doc_id"), 10)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
    val totals = docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
    totals.join(broadcast(kept), "source")
      .select("source", "n_total", "n_kept", "kept_id_sum")
      .orderBy("source")
  }

  /** Data-selection importance weights in the DSIR family (Xie et al.
    * 2023, "Data Selection for Language Models via Importance Resampling"
    * — public knowledge): score every corpus document by how much its
    * hashed-n-gram feature mass looks like a TARGET domain versus the raw
    * corpus. DSIR's score is Σ_f log(p_target(f)/p_raw(f)); logs are not
    * correctly-rounded across libm implementations (the t05 rule), so the
    * engine uses the rational surrogate
    *   affinity_micro = Σ_f target_count(f) · 1e6  div  Σ_f raw_count(f)
    * over the document's bigram occurrences — monotone in target mass
    * against raw mass, integer-exact, hence bit-identical across engines.
    * Downstream, importance RESAMPLING is the existing hash machinery
    * (rank or threshold on the score: [[hashSample]]/[[groupCap]]/p09).
    *
    * Scale shape: one bigram explode feeds BOTH count aggregates (target
    * side is a filtered re-aggregate, O(1) state per key); the target
    * profile — a small high-quality domain by construction — broadcasts;
    * the raw-count join is t06's df-join shape (hub bigrams are inherent
    * and AQE-skew-handled). Per-doc aggregate carries two counters.
    *
    * Docs with no features (< 2 tokens) contribute no bigram rows and are
    * ABSENT from the profile — callers resampling on the score must
    * left-join the corpus if featureless docs should be kept by default.
    */
  def importanceWeights(docs: DataFrame, isTarget: Column): DataFrame = {
    val bg = docs
      .select(col("doc_id"), isTarget.as("is_target"),
        org.apache.spark.sql.functions.split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("is_target"), explode(expr(
        """if(size(ws) < 2, array(),
          |   transform(sequence(1, size(ws)-1),
          |     i -> concat(ws[i-1], ' ', ws[i])))""".stripMargin)).as("b"))
    val raw = bg.groupBy(col("b")).agg(count(lit(1)).as("r_cnt"))
    val tgt = bg.filter(col("is_target"))
      .groupBy(col("b")).agg(count(lit(1)).as("t_cnt"))
    bg.join(raw, "b")
      .join(broadcast(tgt), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("t_cnt"), lit(0L))).as("target_mass"),
        sum(col("r_cnt")).as("raw_mass"))
      .select(col("doc_id"), col("n_bigrams"), col("target_mass"),
        col("raw_mass"),
        expr("CAST(target_mass * 1000000 div raw_mass AS BIGINT)")
          .as("affinity_micro"))
  }

  /** p11: importance-weight profile with `source = 'src0'` as the target
    * domain — every doc scored, ordered output pins the exact weights.
    */
  val importanceAudit: QueryDef = q(
    "p11_importance_weights",
    """WITH w AS (SELECT doc_id, source = 'src0' AS is_target,
      |             string_split(text, ' ') AS ws
      |           FROM documents),
      |bg AS (SELECT doc_id, is_target,
      |         unnest(list_transform(range(1, greatest(len(ws)-1, 0)+1),
      |           i -> ws[CAST(i AS INT)]||' '||ws[CAST(i AS INT)+1])) AS b
      |       FROM w),
      |raw AS (SELECT b, count(*) AS r_cnt FROM bg GROUP BY b),
      |tgt AS (SELECT b, count(*) AS t_cnt FROM bg WHERE is_target GROUP BY b)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       CAST(sum(coalesce(t_cnt, 0)) AS BIGINT) AS target_mass,
      |       CAST(sum(r_cnt) AS BIGINT) AS raw_mass,
      |       CAST(sum(coalesce(t_cnt, 0)) * 1000000
      |            // CAST(sum(r_cnt) AS BIGINT) AS BIGINT) AS affinity_micro
      |FROM bg JOIN raw USING (b) LEFT JOIN tgt USING (b)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    importanceWeights(
      Tables.documents(s, d).select("doc_id", "source", "text"),
      col("source") === "src0")
      .orderBy("doc_id")
  }

  /** p12: TEMPERATURE mixture weights (the α = 0.5 mixing rule of the
    * GPT-3/PaLM data recipes: sample source s proportionally to n_s^α —
    * α = 1 reproduces the corpus, α = 0 is p06's uniform rebalance, √n is
    * the standard compromise that lifts small sources without letting a
    * giant one dominate). INTEGER-EXACT end to end:
    *
    *   - w_s = isqrt(n_s) via corrected floor-sqrt: the double sqrt is
    *     within ±1 of the true integer root for n < 2^52 (exact double
    *     representation + correctly-rounded sqrt), and the two CASE
    *     corrections pin it exactly — no libm bit can leak into w;
    *   - share_micro = w·1e6 div Σw;
    *   - the kept-docs rule works at 1/256 hash granularity like p06,
    *     with the budget target split as
    *     `share·(B div 1e6) + share·(B mod 1e6) div 1e6` (an exact
    *     identity) so every intermediate stays far inside BIGINT even at
    *     10^15-document corpora — the naive `256·B·w` product overflows
    *     at the 100 TB design point;
    *   - keep ⇔ md5-bucket(doc_id) < min(256, 256·target div n_s).
    *
    * Scale shape: two broadcast stat relations (per-lang weights and the
    * 1-row totals) over one corpus scan; the corpus never shuffles before
    * the per-lang count aggregate.
    */
  val temperatureMix: QueryDef = q(
    "p12_temperature_mix",
    """WITH n AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
      |w AS (SELECT lang, n_lang,
      |        CASE WHEN (r0+1)*(r0+1) <= n_lang THEN r0+1
      |             WHEN r0*r0 > n_lang THEN r0-1 ELSE r0 END AS w_sqrt
      |      FROM (SELECT lang, n_lang,
      |              CAST(floor(sqrt(CAST(n_lang AS DOUBLE))) AS BIGINT) AS r0
      |            FROM n)),
      |t AS (SELECT (SELECT sum(w_sqrt) FROM w) AS total_w,
      |             (SELECT count(*) // 2 FROM documents) AS b),
      |sh AS (SELECT lang, n_lang, w_sqrt,
      |         CAST(w_sqrt * 1000000 // t.total_w AS BIGINT) AS share_micro,
      |         least(256, 256 * (w_sqrt * 1000000 // t.total_w * (t.b // 1000000)
      |                  + (w_sqrt * 1000000 // t.total_w) * (t.b % 1000000) // 1000000)
      |               // n_lang) AS thresh
      |       FROM w, t),
      |kept AS (
      |  SELECT d.lang, d.doc_id
      |  FROM documents d JOIN sh USING (lang)
      |  WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) AS BIGINT)
      |        < sh.thresh)
      |SELECT sh.lang, sh.n_lang, sh.w_sqrt, sh.share_micro,
      |       count(k.doc_id) AS n_kept, min(k.doc_id) AS first_doc
      |FROM sh LEFT JOIN kept k USING (lang)
      |GROUP BY sh.lang, sh.n_lang, sh.w_sqrt, sh.share_micro
      |ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val perLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      .withColumn("r0",
        expr("CAST(floor(sqrt(CAST(n_lang AS DOUBLE))) AS BIGINT)"))
      .withColumn("w_sqrt", expr(
        """CASE WHEN (r0+1)*(r0+1) <= n_lang THEN r0+1
          |     WHEN r0*r0 > n_lang THEN r0-1 ELSE r0 END""".stripMargin))
      .drop("r0")
    val totals = perLang.agg(sum(col("w_sqrt")).as("total_w"))
      .crossJoin(broadcast(docs.agg(expr("count(*) div 2").as("b"))))
    val sh = perLang.crossJoin(broadcast(totals))
      .withColumn("share_micro", expr("w_sqrt * 1000000 div total_w"))
      .withColumn("thresh", expr(
        """least(256, 256 * (share_micro * (b div 1000000)
          |  + share_micro * (b % 1000000) div 1000000) div n_lang)"""
          .stripMargin))
      .select("lang", "n_lang", "w_sqrt", "share_micro", "thresh")
    val bucket = expr(
      "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS BIGINT)")
    // aggregate the kept rows per lang BEFORE the stats join: the
    // per-lang count is map-side-combined over the corpus, and the final
    // join is tiny⋈tiny broadcast — never a lang-keyed corpus join
    val keptAgg = docs.select(col("lang"), col("doc_id"))
      .join(broadcast(sh.select("lang", "thresh")), "lang")
      .filter(bucket < col("thresh"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_doc"))
    sh.join(broadcast(keptAgg), Seq("lang"), "left")
      .select(col("lang"), col("n_lang"), col("w_sqrt"), col("share_micro"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("first_doc"))
      .orderBy("lang")
  }

  /** Integer-exact WEIGHTED SYSTEMATIC sampling without a global sort:
    * walk the corpus in key order accumulating weight, and select every
    * row whose weight interval `[cum, cum+w)` contains a multiple of
    * `step` — the classic probability-proportional-to-size systematic
    * design (every selected row "spends" one step of weight mass, so
    * heavy documents are selected with probability ∝ weight and the
    * selected token mass is ≈ total/step · step regardless of the
    * size distribution). Deterministic: the "random phase" is fixed at 0,
    * so the selection is a pure function of (key order, weights, step) —
    * reproducible across engines, runs, and partitionings.
    *
    * The naive formulation is `sum(w) OVER (ORDER BY key)` — a global
    * total-order window, i.e. one partition holding the corpus. This
    * implementation is a TWO-LEVEL DISTRIBUTED PREFIX SUM instead:
    *   1. bin every row by `key div 2^20` and aggregate per-bin weight
    *      totals (map-side combined; the bin table is corpus/2^20 rows);
    *   2. exclusive-prefix the BIN table with one window (single
    *      partition over the bounded bin table — p09's histogram-window
    *      trick; at 10^11 keys that is 10^5 rows);
    *   3. broadcast the bin offsets back and window WITHIN each bin
    *      (partitioned by bin, ≤ 2^20 rows per partition);
    *   global_cum = bin_offset + within_bin_cum, exactly.
    * All arithmetic is BIGINT; the containment test
    * `(c1+w-1) div step > (c1-1) div step` (with `c1 = cum + step` to
    * keep every operand positive) is division on positive longs — no
    * float, no engine divergence.
    */
  def weightedSystematic(
      df: DataFrame, key: Column, weight: Column, step: Column,
      binShift: Int = 20): DataFrame = {
    val rows = df.withColumn("w$", weight.cast("long"))
      .withColumn("k$", key.cast("long"))
      .withColumn("bin$", expr(s"`k$$` div ${1L << binShift}"))
    val bins = rows.groupBy(col("bin$")).agg(sum(col("w$")).as("bw"))
    // exclusive prefix over the BIN table only (bounded; see scaladoc)
    val binOff = bins.withColumn("off",
      coalesce(sum(col("bw")).over(Window.orderBy(col("bin$"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bin$").as("b$"), col("off"))
    val wIn = Window.partitionBy(col("bin$")).orderBy(col("k$"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.join(broadcast(binOff), col("bin$") === col("b$"))
      .withColumn("step$", step.cast("long"))
      .withColumn("cum0", col("off") + sum(col("w$")).over(wIn) - col("w$"))
      .withColumn("c1$", col("cum0") + col("step$"))
      .filter(expr("(`c1$` + `w$` - 1) div `step$` > (`c1$` - 1) div `step$`"))
      .drop("b$", "off", "bin$", "c1$", "k$", "step$")
  }

  /** p13: weighted systematic sample of documents — token count as the
    * weight, step sized so ~200 docs are selected, audited per language
    * (count + id checksum + selected token mass pins the exact row set).
    * The oracle states the SAME selection as the naive global cumulative
    * window — the spec-level identity the two-level prefix sum must hit.
    */
  val weightedSystematicAudit: QueryDef = q(
    "p13_weighted_systematic",
    """WITH w AS (SELECT doc_id, lang,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS w
      |           FROM documents),
      |t AS (SELECT greatest(1, CAST(sum(w) AS BIGINT) // 200) AS step FROM w),
      |c AS (SELECT doc_id, lang, w, step,
      |        CAST(sum(w) OVER (ORDER BY doc_id) - w AS BIGINT) + step AS c1
      |      FROM w, t),
      |sel AS (SELECT lang, doc_id, w FROM c
      |        WHERE (c1 + w - 1) // step > (c1 - 1) // step)
      |SELECT lang, count(*) AS n_sel, CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |       CAST(sum(w) AS BIGINT) AS tok_sum
      |FROM sel GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val w = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      size(org.apache.spark.sql.functions.split(col("text"), " "))
        .cast("long").as("w"))
    val step = w.agg(greatest(lit(1L), expr("sum(w) div 200")).as("step"))
    val sel = weightedSystematic(
      w.crossJoin(broadcast(step)), col("doc_id"), col("w"), col("step"))
    sel.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sel"), sum(col("doc_id")).as("id_sum"),
        sum(col("w")).as("tok_sum"))
      .orderBy("lang")
  }

  /** p14: GROUPED train/val/test split — the leakage-safe variant of p03:
    * the hash bucket is keyed on the GROUP (source), not the document, so
    * every document of a source lands in the same split. Near-duplicates
    * cluster within sources (same crawl, same site template); a doc-keyed
    * split scatters them across train and test, and the held-out metric
    * silently measures memorization. Same scan-fused shape as p03 — the
    * group key is already on the row, no join.
    *
    * The audit pins (split, source) counts AND proves single-split
    * placement mechanically: n_splits_of_source = 1 for every source.
    */
  val groupSplit: QueryDef = q(
    "p14_group_split",
    """WITH a AS (
      |  SELECT source, doc_id,
      |         CASE WHEN substr(md5(source), 1, 2) < 'cd' THEN 'train'
      |              WHEN substr(md5(source), 1, 2) < 'e6' THEN 'val'
      |              ELSE 'test' END AS split
      |  FROM documents),
      |s AS (SELECT source, count(DISTINCT split) AS n_splits FROM a
      |      GROUP BY source)
      |SELECT a.split AS split, a.source AS source, count(*) AS n_docs,
      |       CAST(sum(a.doc_id) AS BIGINT) AS id_sum,
      |       max(s.n_splits) AS n_splits_of_source
      |FROM a JOIN s ON s.source = a.source
      |GROUP BY a.split, a.source
      |ORDER BY split, source""".stripMargin) { (s, d) =>
    val a = split(Tables.documents(s, d).select("source", "doc_id"),
      col("source"), train = 0.8, validation = 0.1)
    val sp = a.groupBy(col("source"))
      .agg(countDistinct(col("split")).as("n_splits"))
    a.join(broadcast(sp), "source")
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
        max(col("n_splits")).as("n_splits_of_source"))
      .select("split", "source", "n_docs", "id_sum", "n_splits_of_source")
      .orderBy("split", "source")
  }

  /** p15: deterministic bootstrap resample (n draws with replacement),
    * audited per source. Draw j (one per input row — the draw spine IS the
    * table, so generation is distributed with no driver action and no
    * single-task explode) targets doc `md5(j)[0:12hex] % n` — 48 uniform
    * bits, so multiplicities follow the Poisson(1) bootstrap profile
    * (~63.2% of docs drawn ≥ once; measured 318/500 on the fixture). A
    * LINEAR multiplicative hash would be wrong here: `(j·c) % n` with
    * gcd(c,n)=1 is a bijection — every doc drawn exactly once, i.e. no
    * resampling at all. Multiplicity rides a count aggregate; the audit
    * reports per-source drawn-doc counts, total draws, and drawn-char
    * mass — variance estimation for corpus statistics without
    * materializing the resampled corpus.
    */
  val bootstrapAudit: QueryDef = q(
    "p15_bootstrap",
    """WITH nn AS (SELECT count(*) AS n FROM documents),
      |draws AS (
      |  SELECT CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 12))
      |              AS BIGINT) % nn.n AS target
      |  FROM documents d, nn),
      |agg AS (SELECT target, count(*) AS k FROM draws GROUP BY target)
      |SELECT doc.source, count(*) AS n_docs_drawn,
      |       CAST(sum(a.k) AS BIGINT) AS n_draws,
      |       CAST(sum(a.k * doc.n_chars) AS BIGINT) AS chars_drawn
      |FROM agg a JOIN documents doc ON doc.doc_id = a.target
      |GROUP BY doc.source
      |ORDER BY doc.source""".stripMargin) { (s, d) =>
    val doc = Tables.documents(s, d)
    val n = doc.agg(count(lit(1)).as("n"))
    val draws = doc.select(col("doc_id")).join(broadcast(n))
      .select((conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long") % col("n")).as("target"))
    val agg = draws.groupBy("target").agg(count(lit(1)).as("k"))
    agg.join(doc.select(col("doc_id"), col("source"), col("n_chars")),
        agg("target") === col("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_drawn"),
        sum(col("k")).cast("long").as("n_draws"),
        sum(col("k") * col("n_chars")).cast("long").as("chars_drawn"))
      .orderBy("source")
  }

  /** p16: deterministic epoch-aligned source interleave — the global
    * training ORDER that walks every source proportionally (row j of a
    * source with n_s rows gets virtual time j/n_s, so every source
    * finishes its epoch at vtime 1.0 and small sources spread evenly
    * between large ones). This is the loader-side mixing schedule that
    * p06/p12 compute WEIGHTS for, stated as a deterministic merge.
    *
    * Scale shape: per-source row numbering is a source-partitioned
    * window; counts broadcast back; the audited prefix rides
    * TakeOrdered (never a global sort), and only the bounded 200-row
    * prefix sees a single-partition position window. vtime is one
    * shared double division of exact integers — bit-identical ordering
    * on both engines.
    */
  val interleaveAudit: QueryDef = q(
    "p16_interleave",
    """WITH n AS (SELECT source, count(*) AS ns FROM documents GROUP BY source),
      |j AS (SELECT d.source, d.doc_id,
      |        row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS j
      |      FROM documents d),
      |v AS (SELECT j.source, j.doc_id, j.j, CAST(j.j AS DOUBLE) / n.ns AS vtime
      |      FROM j JOIN n ON n.source = j.source),
      |top AS (SELECT * FROM v ORDER BY vtime, source, doc_id LIMIT 200)
      |SELECT row_number() OVER (ORDER BY vtime, source, doc_id) AS pos,
      |       source, doc_id, j, vtime
      |FROM top ORDER BY pos""".stripMargin) { (s, d) =>
    val doc = Tables.documents(s, d).select("source", "doc_id")
    val n = doc.groupBy("source").agg(count(lit(1)).as("ns"))
    val ws = Window.partitionBy("source").orderBy("doc_id")
    val top = doc
      .withColumn("j", row_number().over(ws))
      .join(broadcast(n), "source")
      .withColumn("vtime", col("j").cast("double") / col("ns"))
      .orderBy(col("vtime"), col("source"), col("doc_id"))
      .limit(200)
    val wPos = Window.orderBy(col("vtime"), col("source"), col("doc_id"))
    top.withColumn("pos", row_number().over(wPos))
      .select("pos", "source", "doc_id", "j", "vtime")
      .orderBy("pos")
  }

  /** p17: deterministic per-epoch shuffle order — every training epoch
    * needs the corpus in a DIFFERENT pseudo-random order, reproducibly
    * (job restarts and multi-reader coordination both demand that
    * position be a pure function of (epoch, doc_id), never of engine
    * scheduling). The sort key is a 48-bit md5 slice of
    * `'e<epoch>:<doc_id>'`; positions are assigned by the p13/q61
    * TWO-LEVEL pattern — the key's TOP 8 BITS are the bucket, so
    * (bucket, key) order IS key order: a within-bucket rank
    * (bucket-partitioned window) plus per-bucket offsets from a 256-row
    * spine. No corpus-wide single-partition window ever exists; the
    * oracle states the naive global row_number and integer exactness
    * makes the forms identical. Epoch count scales the output, not the
    * shuffle: each epoch is an independent bucket-partitioned pass.
    */
  val epochOrder: QueryDef = q(
    "p17_epoch_order",
    """WITH ep AS (SELECT unnest(range(0, 2)) AS epoch),
      |hk AS (SELECT d.doc_id, ep.epoch,
      |         CAST(('0x'||substr(md5('e'||ep.epoch||':'||d.doc_id), 1, 12)) AS BIGINT) AS h
      |       FROM documents d, ep)
      |SELECT epoch, doc_id,
      |       row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS pos
      |FROM hk
      |ORDER BY epoch, pos""".stripMargin) { (s, d) =>
    val hk = Tables.parallel(Tables.documents(s, d).select("doc_id"))
      .select(col("doc_id"), explode(array(lit(0L), lit(1L))).as("epoch"))
      .withColumn("h", expr(
        "cast(conv(substr(md5(concat('e', epoch, ':', doc_id)), 1, 12), 16, 10) as bigint)"))
      // top 8 bits of the 48-bit key: bucket order is a PREFIX of key
      // order, which is what makes the two-level rank exact
      .withColumn("bucket", expr("h div 1099511627776"))
    val wb = Window.partitionBy("epoch", "bucket").orderBy("h", "doc_id")
    val ranked = hk.withColumn("rn", row_number().over(wb))
    // 256-row-per-epoch spine: the only global-order window
    val wo = Window.partitionBy("epoch").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = hk.groupBy("epoch", "bucket").agg(count(lit(1)).as("n"))
      .withColumn("offset", coalesce(sum(col("n")).over(wo), lit(0L)))
      .select("epoch", "bucket", "offset")
    ranked.join(off, Seq("epoch", "bucket"))
      .select(col("epoch"), col("doc_id"),
        (col("offset") + col("rn")).as("pos"))
      .orderBy("epoch", "pos")
  }

  /** p19: group-aware K-FOLD cross-validation assignment (k = 5), with
    * the leakage audit built into the result.
    *
    * The fold of a document is a pure function of its GROUP key
    * (`source`), not of the row: `conv(md5(source)[1..12], 16) mod k`.
    * Group-keyed assignment is what makes CV honest for correlated data —
    * two documents from one crawl domain must never straddle a
    * train/eval boundary (p18's near-dup variant handles similarity-level
    * leakage; this is the exact-group form every CV harness needs). 48
    * hash bits mod 5 has bias < 2^-45 — statistically uniform.
    *
    * The output carries its own proof: `leak_sources` counts sources seen
    * in more than one fold and must be 0 by construction (the spec also
    * pins exhaustiveness — folds partition the corpus).
    *
    * Scale shape: the fold column is a scan-fused map (no join against a
    * fold table, no shuffle to assign); the per-source audit and the
    * per-fold rollup are two small aggregates, the first keyed by source
    * (map-side partials), the second over k×|sources| rows. At 100 TB
    * the only corpus-wide pass is the scan itself.
    */
  val kfold: QueryDef = q(
    "p19_kfold",
    """WITH a AS (
      |  SELECT source, doc_id, n_chars,
      |         CAST(('0x' || substr(md5(source), 1, 12)) AS BIGINT) % 5
      |           AS fold
      |  FROM documents),
      |s AS (SELECT source, count(DISTINCT fold) AS nf FROM a GROUP BY 1)
      |SELECT a.fold AS fold, count(*) AS n_docs,
      |       count(DISTINCT a.source) AS n_sources,
      |       CAST(sum(a.n_chars) AS BIGINT) AS n_chars,
      |       count(DISTINCT CASE WHEN s.nf > 1 THEN a.source END)
      |         AS leak_sources
      |FROM a JOIN s ON s.source = a.source
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val a = Tables.documents(s, d).select(
      col("source"), col("doc_id"), col("n_chars"),
      (conv(substring(md5(col("source")), 1, 12), 16, 10).cast("long")
        % 5).as("fold"))
    val audit = a.groupBy("source")
      .agg(countDistinct(col("fold")).as("nf"))
    a.join(broadcast(audit), "source")
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(when(col("nf") > 1, col("source"))).as("leak_sources"))
      .orderBy("fold")
  }

  /** p20: A/B assignment + SAMPLE-RATIO-MISMATCH audit. Each event type
    * plays an "experiment": its exposed users are deterministically
    * assigned to two arms by a salted 48-bit hash
    * (`md5(experiment ‖ ':' ‖ user)`), and the audit checks the arm
    * split for SRM — the first thing any experimentation platform gates
    * on, because a skewed split invalidates every downstream metric.
    * For a 2-arm 50/50 split the chi-square statistic reduces to
    * `(a−b)²/(a+b)` (exact integers, ONE double division), gated at the
    * 3.841 critical value (df=1, α=0.05).
    *
    * Scale shape: assignment is a scan-fused pure hash (no assignment
    * table, no shuffle to assign — the p19 discipline); exposure dedup
    * is one (experiment, user) distinct aggregate; the chi-square is
    * arithmetic on two counts per experiment. At 100 TB the only
    * corpus-wide pass is the scan.
    */
  val srmAudit: QueryDef = q(
    "p20_srm_audit",
    """WITH exposed AS (
      |  SELECT DISTINCT event_type AS experiment, user_id
      |  FROM events),
      |armed AS (
      |  SELECT experiment, user_id,
      |         CAST(('0x' || substr(md5(experiment || ':' ||
      |              CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) % 2 AS arm
      |  FROM exposed),
      |c AS (
      |  SELECT experiment,
      |         count(CASE WHEN arm = 0 THEN 1 END) AS n_a,
      |         count(CASE WHEN arm = 1 THEN 1 END) AS n_b
      |  FROM armed GROUP BY 1)
      |SELECT experiment, n_a, n_b,
      |  CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
      |    / CAST(n_a + n_b AS DOUBLE) AS chi2,
      |  CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
      |    / CAST(n_a + n_b AS DOUBLE) < 3.841 AS srm_ok
      |FROM c ORDER BY experiment""".stripMargin) { (s, d) =>
    val exposed = Tables.events(s, d)
      .select(col("event_type").as("experiment"), col("user_id"))
      .distinct()
    val arm = conv(substring(md5(
      concat(col("experiment"), lit(":"), col("user_id").cast("string"))),
      1, 12), 16, 10).cast("long") % 2
    val c = exposed.withColumn("arm", arm)
      .groupBy("experiment")
      .agg(count(when(col("arm") === 0, 1)).as("n_a"),
        count(when(col("arm") === 1, 1)).as("n_b"))
    val chi2 = ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
      .cast("double") / (col("n_a") + col("n_b")).cast("double")
    c.select(col("experiment"), col("n_a"), col("n_b"),
      chi2.as("chi2"), (chi2 < 3.841).as("srm_ok"))
      .orderBy("experiment")
  }

  /** p21: per-source DATASET CARD — the datasheet row a corpus publisher
    * ships with every source: volume (docs/chars/tokens), language mix
    * (distinct langs + dominant lang with a deterministic tie-break),
    * and the within-source exact-duplicate rate. One query = one
    * publishable table; the deeper per-axis audits (t19 vocabulary, d01
    * dedup, p08 shard stats) drill into any row that looks off.
    *
    * Scale shape: one scan with map-side token counting, one aggregate
    * keyed by source, a |sources|×|langs| mode sub-aggregate, and a
    * distinct-text count per source (two-level). Nothing corpus-global.
    */
  val datasetCard: QueryDef = q(
    "p21_dataset_card",
    """WITH m AS (
      |  SELECT source, lang, count(*) AS nl,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY count(*) DESC, lang) AS rn
      |  FROM documents GROUP BY source, lang),
      |s AS (
      |  SELECT source, count(*) AS n_docs,
      |         CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |         count(DISTINCT lang) AS n_langs,
      |         count(DISTINCT text) AS n_distinct_texts
      |  FROM documents GROUP BY source)
      |SELECT s.source, s.n_docs, s.n_chars, s.n_tokens, s.n_langs,
      |       m.lang AS top_lang,
      |       1 - CAST(s.n_distinct_texts AS DOUBLE) / s.n_docs AS dup_rate
      |FROM s JOIN m ON m.source = s.source AND m.rn = 1
      |ORDER BY s.source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val wl = Window.partitionBy("source")
      .orderBy(col("nl").desc, col("lang"))
    val mode = docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("nl"))
      .withColumn("rn", row_number().over(wl))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(size(org.apache.spark.sql.functions.split(col("text"), " "))).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("text")).as("n_distinct_texts"))
      .join(broadcast(mode), "source")
      .select(col("source"), col("n_docs"), col("n_chars"), col("n_tokens"),
        col("n_langs"), col("top_lang"),
        (lit(1) - col("n_distinct_texts").cast("double") / col("n_docs"))
          .as("dup_rate"))
      .orderBy("source")
  }

  def defs: Seq[QueryDef] =
    Seq(sampleHash, sampleStratified, sampleSplit, sequencePack, tokenBudget,
      langRebalance, repeatUpsample, shardStats, curriculumStages, sourceCap,
      importanceAudit, temperatureMix, weightedSystematicAudit, groupSplit,
      bootstrapAudit, interleaveAudit, epochOrder, kfold, srmAudit,
      datasetCard)
}
