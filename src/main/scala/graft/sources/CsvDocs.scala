package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV/TSV ingest for raw document dumps — the other wire format crawl
  * and annotation exports arrive in (at least as often as JSONL). Same
  * contract as [[JsonlDocs]], same 100 TB design points:
  *
  *   - **Explicit schema, never inference** — `inferSchema=true` runs a
  *     FULL extra pass over the input and one weird file flips a column's
  *     type corpus-wide; the documents schema is declared once here.
  *   - **PERMISSIVE + corrupt-record capture** — malformed rows (wrong
  *     arity, unparseable numerics, stray quotes) land in
  *     `_corrupt_record` instead of silently vanishing (DROPMALFORMED)
  *     or killing the job (FAILFAST); [[audit]] makes ingest QA a query.
  *   - **Container transparency** — `.csv.gz` members decode through the
  *     same reader; gzip is not splittable (one .gz = one task), so shard
  *     compressed dumps upstream.
  *
  * CSV-specific hazards the reader pins down (spec-tested):
  *   - **quoting/escaping**: RFC-4180 double-quote quoting with `""`
  *     escapes, so embedded delimiters and newlines in `text` survive;
  *     `multiLine` stays OFF by default — quoted newlines at 100 TB make
  *     files unsplittable (the whole file becomes one record boundary
  *     domain, like gzip); exports with embedded newlines should ship
  *     `\n`-escaped text or use [[readMultiLine]] knowingly.
  *   - **delimiter**: `,` for `.csv`, `\t` via [[readTsv]] — tab data
  *     containing literal tabs must be quoted the same way.
  *   - **header**: `header=true` strips one header line PER FILE.
  */
object CsvDocs {

  /** The documents-table schema plus the corrupt-line capture column. */
  val schema: StructType = JsonlDocs.schema

  private def reader(spark: SparkSession, sep: String, multiLine: Boolean) =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("header", "true")
      .option("sep", sep)
      .option("quote", "\"")
      .option("escape", "\"") // RFC 4180: "" inside a quoted field
      .option("multiLine", multiLine.toString)

  /** Read a CSV path (file, directory, or glob; plain or gzip) with the
    * declared schema. Malformed rows surface with null data columns and
    * the raw line in `_corrupt_record`.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    reader(spark, ",", multiLine = false).csv(path)

  /** Tab-separated variant — annotation dumps' other dialect. */
  def readTsv(spark: SparkSession, path: String): DataFrame =
    reader(spark, "\t", multiLine = false).csv(path)

  /** Quoted-embedded-newline variant. Correct for such exports but NOT
    * splittable — each file parses as one stream — so only for dumps
    * already sharded into many small files.
    */
  def readMultiLine(spark: SparkSession, path: String): DataFrame =
    reader(spark, ",", multiLine = true).csv(path)

  /** Per-input-file ingest audit: kept vs corrupt row counts (header
    * lines excluded by the reader). Same n_ok contract as
    * [[JsonlDocs.audit]]: counts exactly the rows [[clean]] keeps —
    * parseable AND carrying the required id/text.
    */
  def audit(raw: DataFrame): DataFrame =
    raw.groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("_corrupt_record").isNull &&
          col("doc_id").isNotNull && col("text").isNotNull,
          lit(1))).as("n_ok"))
      .select(col("file"), col("n_ok"),
        (col("n_lines") - col("n_ok")).as("n_corrupt"))
      .orderBy("file")

  /** The clean document frame: corrupt rows dropped, `n_chars` healed
    * from the authoritative text, rows without the required id/text
    * rejected. Output matches the parquet `documents` schema exactly.
    */
  def clean(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt_record").isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("text"),
        col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))

  /** Write a documents frame back out as headered, RFC-4180-quoted CSV
    * (sharded by partition) — the inverse wire format for handoff to
    * spreadsheet/warehouse consumers.
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
}
