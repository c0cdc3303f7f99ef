package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC read/write for graft tables — the other splittable columnar wire
  * format warehouses hand over (Hive-lineage pipelines emit ORC at least
  * as often as parquet). Spark ships the ORC datasource in-box, so the
  * engine's contract is thin by design: same declared-schema discipline
  * as the parquet path, plus the two properties that make a columnar
  * interchange worth using at 100 TB, BOTH plan-asserted in OrcStoreSpec
  * rather than assumed:
  *
  *   - **predicate pushdown**: filters reach the ORC scan as
  *     `PushedFilters` (ORC row-group/stripe statistics skip
  *     non-qualifying stripes server-side);
  *   - **column pruning**: `ReadSchema` carries only referenced columns
  *     (a scan reading all columns for a 2-column projection wastes the
  *     format).
  *
  * Zstd compression matches the parquet stores' codec posture (the hep
  * facade's codec mapping, HepWriter.scala); ORC's default is zlib,
  * which trades read throughput for nothing at these block sizes.
  */
object OrcStore {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("compression", "zstd")
      .orc(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
