package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** SQ8 scalar quantization: code-range invariants, recall against the
  * exact scan, reconstruction-error bound, and plan shape.
  */
class Sq8Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  lazy val emb = graft.Tables.embeddings(spark, sf)
  lazy val model = Similarity2.sq8Fit(emb)

  override def afterAll(): Unit = spark.stop()

  test("model: 64 dims, non-negative ranges, codes all in [0, 255]") {
    assert(model.dim == 64 && model.mins.size == 64 && model.ranges.size == 64)
    assert(model.ranges.forall(_ >= 0))
    val mm = Similarity2.sq8Encode(emb, model)
      .select(array_min(col("codes")).as("lo"), array_max(col("codes")).as("hi"))
      .agg(min(col("lo")), max(col("hi"))).head()
    assert(mm.getLong(0) >= 0 && mm.getLong(1) <= 255)
    // boundary exactness: some dimension of some vector must hit code 255
    // (the max element quantizes to full scale, not 254 — the
    // remainder-exact division contract)
    val hi = Similarity2.sq8Encode(emb, model)
      .agg(max(array_max(col("codes")))).head().getLong(0)
    assert(hi == 255L)
  }

  test("reconstruction error per element is at most one quantization step") {
    // |255·qv_j − dv_j| ≤ rg_j: one step of the 255-grid, checked in the
    // driver on a sample
    val rows = Similarity.withQuant(emb)
      .join(Similarity2.sq8Encode(emb, model).select("vec_id", "dv"), "vec_id")
      .select(col("qv"), col("dv")).limit(50).collect()
    rows.foreach { r =>
      val qv = r.getSeq[Long](0)
      val dv = r.getSeq[Long](1)
      qv.indices.foreach { j =>
        val err = math.abs(qv(j) * 255L - dv(j))
        assert(err <= model.ranges(j),
          s"dim $j: reconstruction error $err exceeds step ${model.ranges(j)}")
      }
    }
  }

  test("recall@3 vs the exact scan is >= 0.9 on the fixture") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.exactTopK(emb, queries, 3)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity2.sq8Search(emb, model, queries, 3)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 recall@3 = $recall")
  }

  test("IVF-SQ: residual ranges are tighter than raw; ranking tracks IVF-Flat") {
    import org.apache.spark.sql.functions.{col, element_at, max => smax, min => smin, zip_with}
    val ivf = Similarity.ivfIndex(emb, nlist = 8, iters = 1)
    // the resolution argument: per-dim residual spread < raw spread on
    // average (same 8 bits buy finer steps)
    val centDf = {
      import spark.implicits._
      ivf.centroids.map { case (cid, cv, csq) => (cid, cv.toSeq, csq) }
        .toDF("ccid", "ccv", "c_sq")
    }
    val rv = ivf.assignments
      .join(org.apache.spark.sql.functions.broadcast(centDf),
        col("cid") === col("ccid"))
      .withColumn("rv", zip_with(col("qv"), col("ccv"), (a, b) => a - b))
    def spread(c: String): Long = {
      val aggs = (1 to 64).map(i =>
        (smax(element_at(col(c), i)) - smin(element_at(col(c), i))).as(s"r$i"))
      val r = rv.agg(aggs.head, aggs.tail: _*).head()
      (0 until 64).map(r.getLong).sum
    }
    val rawSpread = spread("qv")
    val resSpread = spread("rv")
    assert(resSpread < rawSpread,
      s"residuals not tighter: $resSpread vs $rawSpread")

    // ranking quality: IVF-SQ's top-3 against IVF-Flat's exact top-3 on
    // the SAME routing — residual SQ8 must track the uncompressed list
    val queries = emb.filter(col("vec_id") < 10)
    val flat = Similarity.ivfSearch(ivf, queries, k = 3, nprobe = 2)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = Similarity2.ivfSqSearch(ivf, queries, k = 3, nprobe = 2)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val agree = (flat & sq).size.toDouble / flat.size
    info(f"IVF-SQ vs IVF-Flat top-3 agreement: $agree%.2f")
    assert(agree >= 0.8, s"residual SQ8 diverged from the uncompressed list: $agree")
  }

  test("plan shape: no shuffle of the corpus before scoring; codegen compiles") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Similarity2.sq8Search(emb, model, emb.filter(col("vec_id") < 8), 3)
        .queryExecution.executedPlan
      val p = plan.toString
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("SortMergeJoin"), s"corpus key-shuffled:\n$p")
      // the encode+score pipeline must compile, not silently interpret
      val stages = plan.collect { case w: WholeStageCodegenExec => w }
      assert(stages.nonEmpty, p)
      stages.foreach { w =>
        val (_, code) = w.doCodeGen()
        val (_, stats) = CodeGenerator.compile(code)
        assert(stats.maxMethodCodeSize <= 65535,
          s"stage would silently fall back to interpreted: " +
            s"maxMethodCodeSize=${stats.maxMethodCodeSize}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
