package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Runnable end-to-end training-data curation pipeline — the composition
  * story for the north-star operators: quality gate → exact + near-dup
  * removal → benchmark decontamination → deterministic split. Every stage
  * is a pure DataFrame transform, so the same code runs unchanged from
  * this sf0.001 smoke corpus to a 100 TB ingest (scan-fused gate, LSH
  * candidate generation, broadcast decontamination probe, hash splits).
  *
  * Run: `runMain graft.PipelineDemo [sfDir]`
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = EngineSession.local("8")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val docs = Tables.documents(spark, sfDir)
    val n0 = docs.count()

    // 1. Gopher-style quality gate: scan-fused, annotates then filters
    val quality = TextAnalysis.qualityFilter(docs, minWords = 5)
      .filter(col("quality_pass"))
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
    // persisted: three downstream actions (n3, n4, the split aggregate)
    // would otherwise each re-run the LSH candidate + verification DAG
    val deduped = Dedup.deduplicate(exact, jaccardThreshold = 0.6).persist()
    val n3 = deduped.count()

    // 3. benchmark decontamination: any shared 5-gram with the held-out
    //    set (stand-in: doc_id < 50) drops the training doc
    val bench = docs.filter(col("doc_id") < 50)
    val train0 = deduped.filter(col("doc_id") >= 50)
    val clean = Dedup.decontaminate(train0, bench).persist()
    val n4 = clean.count()

    // 4. deterministic hash split — stable under reprocessing and retries
    val splits = Sampling.split(clean, col("doc_id"))
      .groupBy("split").count().orderBy("split")
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")

    println(s"corpus=$n0 quality_pass=$n1 exact_unique=$n2 " +
      s"near_dedup=$n3 decontaminated=$n4 splits[$splits]")
    require(n1 <= n0 && n2 <= n1 && n3 <= n2 && n4 <= n3,
      "every stage only removes")
    spark.stop()
  }
}
