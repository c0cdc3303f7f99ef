package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Paragraphs, Sampling, TextAnalysis}

/** Runnable end-to-end training-data curation pipeline — the composition
  * story for the north-star operators: quality gate + classifier gate →
  * exact dedup → ONE materialized duplicate-cluster table feeding
  * quality-aware canonical selection and removal → paragraph-level dedup →
  * benchmark decontamination → deterministic split → training shards.
  * Every stage is a pure DataFrame transform, so the same code runs
  * unchanged from this sf0.001 smoke corpus to a 100 TB ingest (scan-fused
  * gate, df-capped pair generation, cluster-bounded canonical windows,
  * paragraph-hash counts, broadcast decontamination probe, hash splits,
  * one-exchange shard shuffle).
  *
  * Run: `runMain graft.PipelineDemo [sfDir]`
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = EngineSession.local("8")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val docs = Tables.documents(spark, sfDir)
    val n0 = docs.count()

    // 1. Gopher-style quality gate: scan-fused, annotates then filters —
    //    then the hashed-n-gram linear classifier as a second scan-fused
    //    gate (both are row-local projections, so Catalyst fuses the two
    //    gates into ONE pass over the corpus)
    val quality = TextAnalysis.classifierScore(
        TextAnalysis.qualityFilter(docs, minWords = 5))
      .filter(col("quality_pass") && col("label") === "keep")
      .select(docs.columns.map(col): _*)
    val n1 = quality.count()

    // 2. exact dedup (keep-min on full text), then MinHash+LSH near-dup
    //    removal with exact Jaccard verification of the candidates
    val exact = quality
      .withColumn("keeper", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("text"))))
      .filter(col("doc_id") === col("keeper"))
      .drop("keeper")
    val n2 = exact.count()
    // near-dup handling, the pipeline way: the duplicate-cluster table is
    // materialized ONCE (persist) and every consumer derives from it —
    // quality-aware canonical selection keeps the longest member of each
    // cluster (any quality column slots in, e.g. t12's margin), and the
    // removal is an anti-join of the non-canonical ids. Nothing downstream
    // ever recomputes the pair graph (the d14-standalone-query shape is
    // exactly what a pipeline must NOT do per cluster consumer).
    val clusters = Dedup
      .duplicateClusters(exact.select("doc_id", "text"), jaccardThreshold = 0.6)
      .persist()
    val nClustered = clusters.count()
    val nonCanonical = Dedup.keepCanonical(
        exact.select(col("doc_id"), length(col("text")).as("n_chars")),
        clusters, col("n_chars"))
      .filter(!col("keep")).select("doc_id")
    val deduped = exact.join(nonCanonical, Seq("doc_id"), "left_anti").persist()
    val n3 = deduped.count()

    // 3. paragraph-level dedup (Lee et al.): duplicated paragraphs keep
    //    their first occurrence only; docs left with no paragraphs drop
    val paraDeduped = Paragraphs
      .dedupParagraphs(deduped.select(col("doc_id"), col("text")))
      .join(deduped.drop("text"), Seq("doc_id"))
      .persist()
    val n3b = paraDeduped.count()

    // 3b. substring-level scrub (d17): spans duplicated corpus-wide are
    //     EXCISED (not just flagged); docs scrubbed to nothing drop.
    //     Text is REWRITTEN here — the one stage that edits rather than
    //     filters — so it runs after whole-doc/paragraph dedup (their
    //     hashes must see original text) and before decontamination
    //     (which must see the text that will actually be trained on).
    val scrubbed = Paragraphs
      .spanScrub(paraDeduped.select(col("doc_id"), col("text")))
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(paraDeduped.drop("text"), Seq("doc_id"))
      .persist()
    val n3c = scrubbed.count()

    // 4. benchmark decontamination: any shared 5-gram with the held-out
    //    set (stand-in: doc_id < 50) drops the training doc
    val bench = docs.filter(col("doc_id") < 50)
    val train0 = scrubbed.filter(col("doc_id") >= 50)
    val clean = Dedup.decontaminate(train0, bench).persist()
    val n4 = clean.count()

    // 5. deterministic hash split — stable under reprocessing and retries
    val splits = Sampling.split(clean, col("doc_id"))
      .groupBy("split").count().orderBy("split")
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")

    // 6. training shards: one hash exchange, deterministic per-shard order
    val shardDir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "demo-shards")
      .toString
    val train = Sampling.split(clean, col("doc_id"))
      .filter(col("split") === "train").drop("split")
    Sampling.writeTrainingShards(train, col("doc_id"), 4, shardDir)
    val nShards = new java.io.File(shardDir).listFiles()
      .count(_.getName.startsWith("shard="))

    // 7. token-budget subsample for a fixed training budget: weighted
    //    SYSTEMATIC selection (p13) — token mass between selections is
    //    ~constant, so the subsample hits the budget regardless of the
    //    document-length distribution, deterministically
    val weighted = train
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("w"))
    val stepDf = weighted.agg(
      greatest(lit(1L), expr("sum(w) div 100")).as("step"))
    val nBudget = Sampling.weightedSystematic(
      weighted.crossJoin(broadcast(stepDf)),
      col("doc_id"), col("w"), col("step")).count()

    println(s"corpus=$n0 quality_pass=$n1 exact_unique=$n2 " +
      s"clustered=$nClustered canonical_dedup=$n3 para_dedup=$n3b " +
      s"span_scrubbed=$n3c decontaminated=$n4 splits[$splits] " +
      s"shards=$nShards budget_sample=$nBudget")
    require(n1 <= n0 && n2 <= n1 && n3 <= n2 && n3b <= n3 && n3c <= n3b &&
      n4 <= n3c, "every stage only removes")
    spark.stop()
  }
}
