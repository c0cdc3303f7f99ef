package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one-JSON-object-per-line) ingest for raw document dumps — the
  * wire format of crawl exports and annotation pipelines, upstream of the
  * parquet `documents` table every curation operator consumes.
  *
  * Design points for the 100 TB ingest case:
  *
  *   - **Explicit schema, never inference.** `spark.read.json` without a
  *     schema runs a FULL extra pass over the input just to infer types —
  *     at ingest scale that doubles the read, and a single malformed file
  *     can flip a column to string corpus-wide. The documents schema is
  *     declared once here.
  *   - **PERMISSIVE + corrupt-record capture**, not fail-fast: a crawl
  *     dump at scale ALWAYS contains bad lines; dropping them silently
  *     (DROPMALFORMED) destroys auditability and failing the job
  *     (FAILFAST) destroys throughput. Bad lines land in
  *     `_corrupt_record` and [[audit]] counts them per input file, so
  *     ingest QA is a query, not a log grep.
  *   - **Container transparency**: gzip members decode through the same
  *     reader (`.jsonl.gz`); gzip is NOT splittable, so one .gz file = one
  *     task — shard compressed dumps into many files upstream (the spec
  *     pins both paths).
  */
object JsonlDocs {

  /** The documents-table schema plus the corrupt-line capture column. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** Read a JSONL path (file, directory, or glob; plain or gzip) with the
    * declared schema. Malformed lines surface as rows whose data columns
    * are null and whose `_corrupt_record` holds the raw line.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Per-input-file ingest audit: parsed vs corrupt line counts. One pass,
    * no shuffle beyond the tiny per-file aggregate.
    *
    * The ok-count deliberately routes through `doc_id`: a JSON scan whose
    * referenced columns are ONLY `_corrupt_record` is rejected by Spark
    * (the corrupt column is populated during data-column parsing, so a
    * corrupt-only projection would be semantically vacuous); referencing a
    * data column keeps the audit a plain one-pass query with no cache.
    */
  def audit(raw: DataFrame): DataFrame =
    raw.groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("n_lines"),
        // n_ok counts rows [[clean]] actually keeps — parseable AND
        // carrying the required id/text (a structurally-valid `{}` line
        // is parseable but rejected, and must not inflate n_ok)
        count(when(col("_corrupt_record").isNull &&
          col("doc_id").isNotNull && col("text").isNotNull,
          coalesce(col("doc_id"), lit(0L)))).as("n_ok"))
      .select(col("file"), col("n_ok"),
        (col("n_lines") - col("n_ok")).as("n_corrupt"))
      .orderBy("file")

  /** The clean document frame: corrupt lines dropped, `n_chars` healed
    * from the text where the dump omitted or mis-stated it (the column is
    * derived; the text is authoritative), rows without the required id/text
    * rejected. Output matches the parquet `documents` schema exactly.
    */
  def clean(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt_record").isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("text"),
        col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))

  /** Write a documents frame back out as JSONL (sharded by partition —
    * the inverse wire format for handoff to non-parquet consumers).
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
