package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Product-quantization kernels with the codebook carried as BOUND STATE
  * (one `ctx.addReferenceObj` per operator) instead of per-codeword
  * literal expressions.
  *
  * Why: the original encode path scored each subspace with a
  * `least(struct(d2, cid), ...)` chain of `ksub` struct expressions —
  * fine at toy sizes, but at a production codebook (m=8, ksub=256) the
  * generated Java breaks Janino's 64 KB method limit and Spark silently
  * falls back to interpreted evaluation for the exact ADC scan this
  * operator exists to accelerate. Because `PqModel.codes` is a lazy
  * DataFrame, that blown-up encode projection also sat inside every
  * downstream ADC scan. These expressions generate a fixed-size triple
  * loop over a `long[][][]` reference object, so generated code size is
  * O(1) in `ksub` and whole-stage codegen survives any codebook size
  * (PqSpec pins m=8, ksub=256 with `CodeGenerator.compile` directly).
  *
  * Exactness contract (shared with the s12/s15 DuckDB oracles): inputs
  * are 1e-6-quantized BIGINT embedding components; dots and squared
  * norms stay far below 2^63, so every score is exact integer math.
  */
private[graft] trait PqCodebookState { self: Expression =>
  /** Foldable ARRAY<ARRAY<ARRAY<BIGINT>>> literal: m banks of ksub
    * codewords of dsub components. Evaluated once per operator instance
    * (driver side at plan time, executor side after deserialization) and
    * then shared by reference across every generated row loop.
    */
  def codebooks: Expression

  @transient protected final lazy val cbs: Array[Array[Array[Long]]] = {
    require(codebooks.foldable, "PQ codebook argument must be a literal")
    val outer = codebooks.eval().asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { mi =>
      val bank = outer.getArray(mi)
      Array.tabulate(bank.numElements())(ci => bank.getArray(ci).toLongArray())
    }
  }

  /** Exact squared norm of every codeword, precomputed once. */
  @transient protected final lazy val cwSq: Array[Array[Long]] =
    cbs.map(_.map { cw =>
      var s = 0L; var j = 0
      while (j < cw.length) { s += cw(j) * cw(j); j += 1 }
      s
    })
}

/** `pq_encode(codebooks, qv)` → ARRAY<INT>: per-subspace argmin-L2 code
  * assignment for a quantized vector. Ties resolve to the smallest code
  * id (strict `<` while scanning codes in ascending order) — the same
  * contract as the oracle's `min_by(cid, d2)` restatement. The squared
  * distance is compared through `cw·cw − 2·sub·cw` (the `sub·sub` term
  * is constant within a subspace, so the argmin and its ties are
  * identical to the full d2).
  */
case class PqEncode(codebooks: Expression, vec: Expression)
    extends BinaryExpression with PqCodebookState {
  override def left: Expression = codebooks
  override def right: Expression = vec
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(cb: Any, v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = cbs.length
    val dsub = cbs(0)(0).length
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val bank = cbs(mi)
      val base = mi * dsub
      var best = Long.MaxValue
      var bi = 0
      var ci = 0
      while (ci < bank.length) {
        val cw = bank(ci)
        var dot = 0L
        var j = 0
        while (j < dsub) { dot += x.getLong(base + j) * cw(j); j += 1 }
        val score = cwSq(mi)(ci) - 2L * dot
        if (score < best) { best = score; bi = ci }
        ci += 1
      }
      codes(mi) = bi
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, v) => {
      val cbRef = ctx.addReferenceObj("pqCbs", cbs, "long[][][]")
      val sqRef = ctx.addReferenceObj("pqCwSq", cwSq, "long[][]")
      val m = ctx.freshName("m"); val dsub = ctx.freshName("dsub")
      val codes = ctx.freshName("codes"); val mi = ctx.freshName("mi")
      val ci = ctx.freshName("ci"); val j = ctx.freshName("j")
      val bank = ctx.freshName("bank"); val cw = ctx.freshName("cw")
      val dot = ctx.freshName("dot"); val best = ctx.freshName("best")
      val bi = ctx.freshName("bi"); val score = ctx.freshName("score")
      s"""
         |final int $m = $cbRef.length;
         |final int $dsub = $cbRef[0][0].length;
         |final int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  final long[][] $bank = $cbRef[$mi];
         |  long $best = Long.MAX_VALUE; int $bi = 0;
         |  for (int $ci = 0; $ci < $bank.length; $ci++) {
         |    final long[] $cw = $bank[$ci];
         |    long $dot = 0L;
         |    for (int $j = 0; $j < $dsub; $j++) {
         |      $dot += $v.getLong($mi * $dsub + $j) * $cw[$j];
         |    }
         |    final long $score = $sqRef[$mi][$ci] - 2L * $dot;
         |    if ($score < $best) { $best = $score; $bi = $ci; }
         |  }
         |  $codes[$mi] = $bi;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(codebooks = newLeft, vec = newRight)

  override def prettyName: String = "pq_encode"
}

/** `pq_adc_dot(codebooks, qe, codes)` → BIGINT: the asymmetric-distance
  * dot — the query's exact quantized subvectors against the candidate's
  * looked-up codewords, summed over subspaces. The candidate contributes
  * only its m small codes; its original vector is never read.
  */
case class PqAdcDot(codebooks: Expression, qvec: Expression, codes: Expression)
    extends TernaryExpression with PqCodebookState {
  override def first: Expression = codebooks
  override def second: Expression = qvec
  override def third: Expression = codes
  override def dataType: DataType = LongType

  override def nullSafeEval(cb: Any, q: Any, c: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val cd = c.asInstanceOf[ArrayData]
    val m = cbs.length
    val dsub = cbs(0)(0).length
    var s = 0L
    var mi = 0
    while (mi < m) {
      val cw = cbs(mi)(cd.getInt(mi))
      val base = mi * dsub
      var j = 0
      while (j < dsub) { s += qv.getLong(base + j) * cw(j); j += 1 }
      mi += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, q, c) => {
      val cbRef = ctx.addReferenceObj("pqCbs", cbs, "long[][][]")
      val m = ctx.freshName("m"); val dsub = ctx.freshName("dsub")
      val s = ctx.freshName("s"); val mi = ctx.freshName("mi")
      val j = ctx.freshName("j"); val cw = ctx.freshName("cw")
      s"""
         |final int $m = $cbRef.length;
         |final int $dsub = $cbRef[0][0].length;
         |long $s = 0L;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  final long[] $cw = $cbRef[$mi][$c.getInt($mi)];
         |  for (int $j = 0; $j < $dsub; $j++) {
         |    $s += $q.getLong($mi * $dsub + $j) * $cw[$j];
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqAdcDot =
    copy(codebooks = newFirst, qvec = newSecond, codes = newThird)

  override def prettyName: String = "pq_adc_dot"
}

/** `pq_recon_sq(codebooks, codes)` → BIGINT: squared norm of the coded
  * row's reconstruction — Σ over subspaces of the looked-up codeword's
  * precomputed exact squared norm (subspace codewords are orthogonal by
  * construction, so the cross terms are zero).
  */
case class PqReconSq(codebooks: Expression, codes: Expression)
    extends BinaryExpression with PqCodebookState {
  override def left: Expression = codebooks
  override def right: Expression = codes
  override def dataType: DataType = LongType

  override def nullSafeEval(cb: Any, c: Any): Any = {
    val cd = c.asInstanceOf[ArrayData]
    var s = 0L
    var mi = 0
    while (mi < cbs.length) { s += cwSq(mi)(cd.getInt(mi)); mi += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, c) => {
      val sqRef = ctx.addReferenceObj("pqCwSq", cwSq, "long[][]")
      val s = ctx.freshName("s"); val mi = ctx.freshName("mi")
      s"""
         |long $s = 0L;
         |for (int $mi = 0; $mi < $sqRef.length; $mi++) {
         |  $s += $sqRef[$mi][$c.getInt($mi)];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqReconSq =
    copy(codebooks = newLeft, codes = newRight)

  override def prettyName: String = "pq_recon_sq"
}
