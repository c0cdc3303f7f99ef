package graft.tools

import org.apache.spark.sql.functions._

/** Production-codebook PQ bench: trains m=8, ksub=256 codebooks on a
  * scaled embeddings store (arg 0 = sf dir) and runs the ADC search for
  * 20 queries. The round-10 before/after evidence for the bound-state
  * codegen fix (PqExpressions.scala): the round-9 literal-LUT encode
  * fails Janino at this size and runs the whole scan interpreted.
  *
  *   java -cp "target/scala-2.13/classes:SPARK_JARS" graft.tools.PqBench target/sf1
  */
object PqBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.EngineSession.local("32")
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, dir)
    emb.count() // warm the scan
    val t0 = System.nanoTime
    val model = graft.operators.Similarity.pqIndex(emb, m = 8, ksub = 256, iters = 1)
    val tTrain = (System.nanoTime - t0) / 1e9
    val queries = emb.filter(col("vec_id") < 20)
    val t1 = System.nanoTime
    val n = graft.operators.Similarity.pqSearch(model, queries, k = 10).count()
    val tSearch = (System.nanoTime - t1) / 1e9
    println(f"PQBENCH rows=$n train=$tTrain%.2f search=$tSearch%.2f total=${tTrain + tSearch}%.2f")
    spark.stop()
  }
}
