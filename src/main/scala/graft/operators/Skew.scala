package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

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

  /** The salted join as a judged query: events (150 hot user keys — each
    * key carries ~1/150th of the fact table, pathological for a 32-way
    * hash join) enriched against customer through [[saltedJoin]], then
    * aggregated. The oracle states the PLAIN join — salting must be
    * invisible in the result, visible only in the partition histogram.
    */
  val saltedEnrich: QueryDef = QueryDef(
    "q38_skew_salted",
    Some("""SELECT c_mktsegment,
           |       count(*) AS n_events,
           |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
           |FROM events JOIN customer ON user_id = c_custkey
           |GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin),
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("value"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      saltedJoin(ev, cust, "user_id", buckets = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
        .orderBy("c_mktsegment")
    })

  def defs: Seq[QueryDef] = Seq(saltedEnrich)
}
