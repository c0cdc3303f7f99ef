package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native dot product of two ARRAY<BIGINT> columns.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) evaluate their
  * lambdas interpreted — outside whole-stage codegen — which made pairwise
  * similarity scoring the bench bottleneck. This expression generates a
  * primitive long loop inline in the joined stage's codegen, keeping the
  * whole candidate-scoring pipeline in one compiled stage (the preference
  * order from SURVEY.md §7: custom `Expression` with `doGenCode` before any
  * mapPartitions fallback).
  *
  * Exactness contract: inputs are 1e-6-quantized embedding components in
  * BIGINT units (see [[graft.operators.Similarity]]); products and the
  * 64-term sum stay far below 2^63, so the result is exact integer math —
  * identical to the DuckDB oracle's sum.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // Inputs are ARRAY<BIGINT> by construction (the quantization transform in
  // Similarity); no ExpectsInputTypes — AbstractDataType is private[sql].

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "long_dot"
}

/** Registration of graft's native expressions into a session's function
  * registry, making them usable from `expr(...)` and `spark.sql(...)`.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    // idempotent: every query builder calls this; re-registering floods
    // the logs with "replaced a previously registered function" warnings
    val registry = spark.sessionState.functionRegistry
    def missing(name: String) = !registry.functionExists(
      new org.apache.spark.sql.catalyst.FunctionIdentifier(name))
    if (missing("long_dot"))
      registry.createOrReplaceTempFunction(
        "long_dot", exprs => LongDotProduct(exprs(0), exprs(1)), "built-in")
    if (missing("vec_sum"))
      spark.udf.register("vec_sum", VecAgg.vecSum)
    // PQ kernels: codebook-as-bound-state codegen (see PqExpressions.scala)
    if (missing("pq_encode"))
      registry.createOrReplaceTempFunction(
        "pq_encode", exprs => PqEncode(exprs(0), exprs(1)), "built-in")
    if (missing("pq_adc_dot"))
      registry.createOrReplaceTempFunction(
        "pq_adc_dot", exprs => PqAdcDot(exprs(0), exprs(1), exprs(2)), "built-in")
    if (missing("pq_recon_sq"))
      registry.createOrReplaceTempFunction(
        "pq_recon_sq", exprs => PqReconSq(exprs(0), exprs(1)), "built-in")
    // Spark ships Bloom-filter expressions for its runtime-filter rewrite
    // but does not expose them in the function registry; graft's
    // incremental-ingest screen (Dedup.IndexScreen) uses them as a
    // broadcastable pre-filter, so surface the same pair to SQL/expr().
    if (missing("bloom_filter_agg"))
      registry.createOrReplaceTempFunction(
        "bloom_filter_agg",
        exprs => org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1), exprs(2), 0, 0)
          .toAggregateExpression(),
        "built-in")
    if (missing("might_contain"))
      registry.createOrReplaceTempFunction(
        "might_contain",
        exprs => org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs(0), exprs(1)),
        "built-in")
  }
}

/** SparkSessionExtensions hook: the deployment-grade registration path —
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) makes `long_dot`
  * available in every session of the application, including pure-SQL
  * clients, without any imperative register call.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("long_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LongDotProduct].getName, "long_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LongDotProduct(exprs(0), exprs(1))))
}
