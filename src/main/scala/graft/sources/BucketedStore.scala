package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table storage: pre-shuffles data into a fixed number of
  * hash buckets on the join key at WRITE time, so repeated joins and
  * aggregations on that key run with NO exchange at read time — the
  * co-located-join layout that matters most at the 100 TB design point
  * (one shuffle amortized over every downstream query).
  *
  * Uses the session catalog (`saveAsTable` is the only surface that
  * records bucketing metadata; plain `.parquet()` paths cannot).
  */
object BucketedStore {

  /** Writes `df` bucketed (and sorted in-bucket) by `key`. Drops any
    * previous table AND its leftover warehouse location first — with the
    * in-memory catalog, a prior JVM's table metadata is gone but its
    * directory persists, and saveAsTable refuses to reuse the location.
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Joins two same-bucketed tables on their bucket key — planned as a
    * sort-merge join with zero shuffle when bucket counts match.
    */
  def coLocatedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable),
        spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
