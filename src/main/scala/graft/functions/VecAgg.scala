package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions}

/** Typed `Aggregator` surface (SURVEY §2.10): exact elementwise sum of
  * quantized (BIGINT) vectors. Long arithmetic keeps the aggregate
  * order-insensitive and bit-reproducible — the float version would
  * depend on partial-aggregation order.
  *
  * This is the custom-AGGREGATION extension point, complementing the
  * custom scalar [[LongDotProduct]] expression: use an `Aggregator` when
  * the state machine matters (here: a growing vector buffer with
  * map-side partial merge), an `Expression` when per-row codegen does.
  * One `groupBy(label).agg(vecSum)` computes every label centroid in a
  * single shuffle of partial sums — the k-means assignment/update step
  * for IVF at scale.
  */
object VecAgg {

  val VecSum: Aggregator[Seq[Long], Array[Long], Seq[Long]] =
    new Aggregator[Seq[Long], Array[Long], Seq[Long]] {
      override def zero: Array[Long] = Array.emptyLongArray

      private def add(b: Array[Long], v: Seq[Long]): Array[Long] =
        if (b.isEmpty) v.toArray
        else {
          require(v.length == b.length,
            s"vecSum over ragged vectors: ${v.length} vs ${b.length} elements")
          var i = 0
          while (i < b.length) { b(i) += v(i); i += 1 }
          b
        }

      override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = add(b, a)
      override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
        if (x.isEmpty) y else add(x, y.toSeq)
      override def finish(b: Array[Long]): Seq[Long] = b.toSeq

      override def bufferEncoder: Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Seq[Long]] =
        ExpressionEncoder[Seq[Long]]()
    }

  /** Column form: `vecSum(arrayCol)` sums ARRAY<BIGINT> elementwise. */
  val vecSum: org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(VecSum)
}
