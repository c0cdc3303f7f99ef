package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout for multi-dimensional data skipping.
  *
  * At 100 TB the scan you avoid is the cheapest scan there is: parquet
  * readers prune whole row groups from min/max footer statistics, but a
  * layout sorted by ONE key only skips on that key — every other column's
  * per-file range spans the corpus, so its stats prune nothing. Writing
  * files clustered by the interleaved-bit Z-value keeps EVERY indexed
  * dimension's range narrow per file, so box predicates on any subset of
  * the dimensions skip most row groups (the technique Delta/Iceberg expose
  * as `OPTIMIZE ... ZORDER BY`; here it is a plain Spark write plus an
  * auditable layout contract).
  *
  * The Z-value is computed with composed bitwise Column expressions —
  * codegen'd, no UDF; `repartitionByRange` on it gives range-disjoint
  * files (one shuffle, the same cost a single-key sorted write pays) and
  * `sortWithinPartitions` keeps row groups tight inside each file.
  *
  * [[skipStats]] closes the loop: it reads the parquet FOOTERS (never the
  * data pages) and reports how many row groups a box predicate would have
  * to read under the layout — the number a 1000-executor scan's task count
  * tracks. ZOrderSpec asserts the 2-D win mechanically: a secondary-dim
  * filter prunes under Z-order and cannot prune under linear sort.
  */
object ZOrder {

  /** Morton interleave of `cols`: bit `i` of column `j` lands at position
    * `i * n + j`. Callers pass NON-NEGATIVE integer columns already
    * normalized below `2^bits` (scale/rank first; order-preserving maps
    * keep min/max stats meaningful). bits × n must fit a signed long.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n > 0, "zValue needs at least one column")
    require(bits > 0 && bits * n <= 62, s"bits=$bits × $n columns must be <= 62")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` to `path` as `numFiles` Z-clustered parquet files:
    * range-partitioned and sorted by the Z-value of `zcols` (the Z column
    * itself is dropped from the output — it is a layout key, not data).
    */
  def zorderWrite(df: DataFrame, zcols: Seq[Column], bits: Int,
      numFiles: Int, path: String): Unit = {
    require(numFiles > 0, s"numFiles must be > 0, got $numFiles")
    df.withColumn("__z", zValue(zcols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Footer-only skipping audit: how many row groups of the parquet files
    * under `dir` could contain rows with `column` in `[lo, hi]`, by their
    * min/max statistics — i.e. how many a pushed-down range predicate
    * reads. Returns (overlapping, total). Metadata-scale work: no data
    * pages are touched, exactly what a table-format planner does.
    */
  def skipStats(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long): (Int, Int) = {
    require(lo <= hi, s"empty box: lo=$lo > hi=$hi")
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    var total = 0
    var overlap = 0
    files.foreach { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        r.getFooter.getBlocks.asScala.foreach { block =>
          total += 1
          val chunk = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(throw new IllegalArgumentException(
              s"column $column not found in ${f.getPath}"))
          val stats = chunk.getStatistics
          // missing/empty stats => the reader cannot prune: counts as overlap
          val hits = stats == null || !stats.hasNonNullValue || {
            val mn = stats.genericGetMin.asInstanceOf[Number].longValue()
            val mx = stats.genericGetMax.asInstanceOf[Number].longValue()
            mx >= lo && mn <= hi
          }
          if (hits) overlap += 1
        }
      } finally r.close()
    }
    require(total > 0, s"no parquet row groups under $dir")
    (overlap, total)
  }
}
