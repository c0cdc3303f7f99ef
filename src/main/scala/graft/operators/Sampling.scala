package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  def defs: Seq[QueryDef] = Seq(sampleHash, sampleStratified, sampleSplit)
}
