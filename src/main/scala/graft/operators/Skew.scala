package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. AQE's skew-join splitting handles most cases
  * at runtime; explicit salting is the static fallback when one side has
  * pathological hot keys (the classic power-law key problem at 100 TB).
  */
object Skew {

  /** Salted equi-join: the (large, skewed) left side gets a pseudo-random
    * salt in [0, buckets); the (smaller) right side is replicated once per
    * salt value. The join key becomes (key, salt), spreading each hot key
    * over `buckets` reducers. Result equals the plain inner equi-join.
    *
    * The salt derives from a hash of the left row's key and partition
    * position — deterministic per run, uniform over buckets.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String, buckets: Int): DataFrame = {
    val salt = pmod(
      hash(col(key), spark_partition_id(), monotonically_increasing_id()),
      lit(buckets))
    val l = left.withColumn("__salt", salt)
    val rightCols = right.columns
    val r = right
      .withColumn("__salt",
        explode(array((0 until buckets).map(lit(_)): _*)))
      .withColumnRenamed(key, s"__r_$key")
    l.join(r, l(key) === r(s"__r_$key") && l("__salt") === r("__salt"))
      .drop("__salt", s"__r_$key")
  }
}
