package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Product quantization (`pqIndex` / `pqSearch` / `pqRecall`) on the
  * sf0.001 embeddings parquet — file-backed for the same reason as
  * IvfSpec: LocalRelation plans constant-fold and prove nothing.
  */
class PqSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val queries = emb.filter(col("vec_id") < 10)

  test("pqIndex: m codebooks of ksub codewords, corpus encoded to m codes") {
    val m = Similarity.pqIndex(emb, m = 4, ksub = 8, iters = 2)
    assert(m.m === 4 && m.ksub === 8 && m.dsub === 16)
    assert(m.codebooks.size === 4)
    m.codebooks.foreach { cb =>
      assert(cb.size === 8)
      cb.foreach(cw => assert(cw.length === 16))
    }
    val codes = m.codes
    assert(codes.count() === emb.count())
    (0 until 4).foreach { mi =>
      val seen = codes.select(s"code_$mi").distinct()
        .collect().map(_.getInt(0)).toSet
      assert(seen.subsetOf((0 until 8).toSet) && seen.nonEmpty, s"subspace $mi")
    }
  }

  test("pqIndex training is partition-independent (exact integer updates)") {
    val a = Similarity.pqIndex(emb, m = 4, ksub = 8, iters = 2)
    val b = Similarity.pqIndex(emb.repartition(7), m = 4, ksub = 8, iters = 2)
    (0 until 4).foreach { mi =>
      (0 until 8).foreach { ci =>
        assert(a.codebooks(mi)(ci).toSeq === b.codebooks(mi)(ci).toSeq,
          s"codeword ($mi, $ci) differs across partitionings")
      }
    }
  }

  test("ksub = n with zero iterations degrades ADC to exact search") {
    // seeding puts every corpus vector in the codebook, so each vector's
    // nearest codeword is itself, reconstruction is exact, and the ADC
    // scores equal the true cosines — the PQ analog of IvfSpec's
    // nprobe = nlist ≡ exhaustive pin.
    val corpus = emb.filter(col("vec_id") < 24)
    val qs = emb.filter(col("vec_id") < 5)
    val model = Similarity.pqIndex(corpus, m = 4, ksub = 24, iters = 0)
    val adc = Similarity.pqSearch(model, qs, k = 3)
      .orderBy("qid", "rn").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val exact = Similarity.exactTopK(corpus, qs, k = 3)
      .orderBy("qid", "rn").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(adc.toSeq === exact.toSeq)
  }

  test("pqRecall: measured recall improves with codebook size") {
    val coarse = Similarity.pqRecall(
      Similarity.pqIndex(emb, m = 4, ksub = 4, iters = 1), emb, queries, k = 10)
      .agg(avg(col("recall"))).head().getDouble(0)
    val fine = Similarity.pqRecall(
      Similarity.pqIndex(emb, m = 8, ksub = 64, iters = 2), emb, queries, k = 10)
      .agg(avg(col("recall"))).head().getDouble(0)
    info(f"recall@10: coarse(m=4,ksub=4)=$coarse%.3f fine(m=8,ksub=64)=$fine%.3f")
    assert(coarse >= 0.0 && coarse <= 1.0)
    assert(fine > coarse,
      s"richer codebooks must improve recall on this corpus: " +
        s"coarse=$coarse fine=$fine")
    assert(fine >= 0.3, s"fine-grained PQ recall collapsed: $fine")
  }

  test("pqSearch plan: queries broadcast, corpus map-only until the top-k window") {
    val model = Similarity.pqIndex(emb, m = 4, ksub = 4, iters = 1)
    val p = Similarity.pqSearch(model, queries, k = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("WindowGroupLimit"), p)
    // the corpus side must never hash-shuffle: the only hashpartitioning
    // exchanges allowed are the post-scoring per-query window on qid
    val hashKeys = "Exchange hashpartitioning\\(([a-zA-Z_0-9#]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(hashKeys.forall(_.startsWith("qid")), s"corpus-side shuffle: $hashKeys\n$p")
  }

  test("ADC whole-stage codegen survives a production codebook (m=8, ksub=256)") {
    // the round-9 literal-LUT encode broke Janino's 64 KB method limit at
    // this size and silently dropped the whole ADC scan to interpreted
    // evaluation; the bound-state PqEncode/PqAdcDot/PqReconSq expressions
    // must keep generated code O(1) in ksub. Compile every codegen stage
    // of the search plan DIRECTLY (CodeGenerator.compile throws on Janino
    // failure) and assert no method exceeds the huge-method fallback
    // threshold Spark would otherwise silently interpret past.
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val model = Similarity.pqIndex(emb, m = 8, ksub = 256, iters = 1)
    assert(model.ksub === 256 && model.dsub === 8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Similarity.pqSearch(model, queries, k = 3)
        .queryExecution.executedPlan
      val stages = plan.collect { case w: WholeStageCodegenExec => w }
      assert(stages.nonEmpty, plan.toString)
      stages.foreach { w =>
        val (_, code) = w.doCodeGen()
        val (_, stats) = CodeGenerator.compile(code) // throws if Janino fails
        assert(stats.maxMethodCodeSize <= 65535,
          s"stage would silently fall back to interpreted: " +
            s"maxMethodCodeSize=${stats.maxMethodCodeSize}")
      }
      info(s"compiled ${stages.size} codegen stages at m=8, ksub=256")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ADC codegen and interpreted evaluation agree at m=8, ksub=256") {
    // pins eval() ≡ doGenCode() for the bound-state kernels on a real
    // corpus: identical top-k under wholeStage codegen on and off
    val model = Similarity.pqIndex(emb, m = 8, ksub = 256, iters = 1)
    def run(): Seq[(Long, Int, Long, Double)] =
      Similarity.pqSearch(model, queries, k = 5).orderBy("qid", "rn")
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interpreted = try run()
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(withCodegen === interpreted)
    assert(withCodegen.nonEmpty)
  }

  test("ivfPqSearch probe fallback: broadcast when small, shuffled hash " +
      "join on the list id when the probe side would OOM a broadcast") {
    val ivf = Similarity.ivfIndex(emb, nlist = 4, iters = 1)
    val pq = Similarity.pqIndex(emb, m = 4, ksub = 4, iters = 1)
    val small = Similarity.ivfPqSearch(ivf, pq, queries, k = 3, nprobe = 2)
    val smallPlan = small.queryExecution.executedPlan.toString
    assert(smallPlan.contains("BroadcastExchange"), smallPlan)
    // forcing the gate shut must flip the candidate join to shuffled-hash
    // (the 10⁸-row batch-probe shape) without changing a single row
    val big = Similarity.ivfPqSearch(ivf, pq, queries, k = 3, nprobe = 2,
      maxBroadcastProbeBytes = 0L)
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(bigPlan.contains("ShuffledHashJoin"), bigPlan)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(big) === rows(small))
  }

  test("ivfPqSearch with nprobe = nlist degrades to exhaustive pqSearch") {
    val ivf = Similarity.ivfIndex(emb, nlist = 4, iters = 1)
    val pq = Similarity.pqIndex(emb, m = 4, ksub = 4, iters = 1)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val exhaustive = rows(Similarity.pqSearch(pq, queries, k = 3))
    val routed = rows(Similarity.ivfPqSearch(ivf, pq, queries, k = 3, nprobe = 4))
    assert(routed == exhaustive,
      "probing every list must reproduce the unrouted ADC top-k exactly")
    // narrow probing returns a subset of per-query candidates, never junk:
    // every (qid, cid) it scores must carry the SAME cos as exhaustive ADC
    val narrowSet = Similarity.ivfPqSearch(ivf, pq, queries, k = 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    val full = rows(Similarity.pqSearch(pq, queries, k = emb.count().toInt))
      .map { case (q, _, c, s) => (q, c, s) }
    assert(narrowSet.subsetOf(full),
      "routed scores must be drawn from the exhaustive ADC scores")
  }
}
