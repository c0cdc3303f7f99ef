package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness's parquet tables (see /root/repo/TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst owns pushdown/pruning; no caching
  * here — at the 100 TB design point the scan must stream, and filters and
  * projections must reach the parquet reader (verified in plan specs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet SCHEMA memo, keyed on (session, file identity). Without an
    * explicit schema every `spark.read.parquet` call re-reads a footer to
    * infer one — paid at query-construction time by every table load on
    * every bench pass (and several queries load a table more than once).
    * The schema depends only on the file bytes and the session's type
    * mapping confs (nanosAsLong), so it is memoized per session + path +
    * mtime + length; a rebuilt store at the same path misses the memo and
    * re-infers. Non-local paths (no java.io.File identity) skip the memo.
    * This caches METADATA only — every query still scans the parquet.
    */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), org.apache.spark.sql.types.StructType]()

  /** Crude bound for the metadata memos: every in-place rewrite mints a
    * new key and old entries (which pin their SparkSession) would
    * otherwise accumulate for the JVM's lifetime. A full clear past the
    * bound costs one re-read per live entry — metadata, not data.
    */
  private[graft] def bounded[K, V](
      cache: java.util.concurrent.ConcurrentHashMap[K, V]): Unit =
    if (cache.size > 512) cache.clear()

  /** Local-file CONTENT identity for memo keys; non-local or absent paths
    * return the bare string (callers then either skip the memo or accept
    * the weaker key — each call site documents which).
    *
    * Plain files key on (path, mtime, length). Directories key on their
    * RECURSIVELY ENUMERATED content — every entry's relative name, length
    * and mtime — because `File.length` is meaningless for a directory and
    * dir mtime only changes when direct entries are created/deleted/
    * renamed: an in-place rewrite of a nested part file (same name) would
    * otherwise serve a stale schema/partition count (the r16 ADVICE
    * hole; `MemoSpec` pins the miss). Entry walks are bounded: past
    * [[identWalkCap]] entries the identity degrades to an aggregate
    * (count + total length + max mtime) over the remainder — still
    * content-sensitive for any rewrite that changes bytes or timestamps.
    */
  private[graft] def fileIdent(root: String): String = {
    val f = try {
      val u = new java.net.URI(root)
      if (u.getScheme == null) new java.io.File(root)
      else if (u.getScheme == "file") new java.io.File(u.getPath)
      else null
    } catch { case _: Exception => new java.io.File(root) }
    if (f == null || !f.exists()) root
    else if (f.isFile) s"$root|${f.lastModified}|${f.length}"
    else {
      val sb = new StringBuilder(root).append('|').append(f.lastModified)
      var walked = 0
      var aggCount = 0L; var aggLen = 0L; var aggMtime = 0L
      def walk(d: java.io.File, prefix: String): Unit = {
        val entries = Option(d.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
        entries.foreach { e =>
          if (walked < identWalkCap) {
            walked += 1
            sb.append(',').append(prefix).append(e.getName)
              .append(':').append(e.length).append(':').append(e.lastModified)
          } else {
            aggCount += 1; aggLen += e.length
            if (e.lastModified > aggMtime) aggMtime = e.lastModified
          }
          if (e.isDirectory) walk(e, s"$prefix${e.getName}/")
        }
      }
      walk(f, "")
      if (aggCount > 0)
        sb.append("|rest:").append(aggCount).append(':').append(aggLen)
          .append(':').append(aggMtime)
      sb.toString
    }
  }

  private[graft] val identWalkCap = 4096

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val f = new java.io.File(path)
    if (!f.exists()) spark.read.parquet(path)
    else {
      bounded(schemaCache)
      // fileIdent = recursive content identity for directories: a nested
      // same-name part-file rewrite mints a new key (r16 ADVICE item)
      val schema = schemaCache.computeIfAbsent(
        (spark, fileIdent(path)),
        _ => spark.read.parquet(path).schema)
      spark.read.schema(schema).parquet(path)
    }
  }

  /** Adaptive scan-parallelism guard for CPU-heavy per-row pipelines
    * (hashing, shingling, quantized vector math).
    *
    * A parquet scan cannot split below one row group, so a source written
    * as few giant row groups (or any unsplittable format — the gzip
    * problem) yields fewer input partitions than cores and the whole
    * per-row pipeline runs nearly serial. When that happens — and ONLY
    * then — redistribute round-robin to the cluster's parallelism before
    * the heavy work; the rebalance moves raw rows once and is not a keyed
    * shuffle. At a healthy 100 TB layout (input splits ≫ cores) the guard
    * is an identity and adds no exchange.
    *
    * SCAN-LEVEL ONLY: call this on a freshly loaded table (optionally
    * projected/filtered — narrow ops keep the scan's partition count),
    * never on a derived frame. Downstream of any shuffle the partition
    * count reflects `spark.sql.shuffle.partitions`, so the guard would
    * fire on corpus-scale intermediates and round-robin them for nothing;
    * `.rdd` on a post-shuffle plan also forces an RDD lineage conversion
    * at plan-build time. Library operators therefore do NOT guard their
    * inputs — the per-query entry points guard their own scans.
    */
  /** `slack` tunes when the guard fires: partitions × slack < target.
    * The default 4 tolerates partial width (a 9-partition scan on 32
    * cores is left alone — the rebalance usually costs more than the
    * residual idle); slack = 1 demands FULL width and suits only stages
    * whose per-row CPU dwarfs the rebalance (the char-5-gram md5
    * pipeline: ~5× word-shingle volume, measured 1.9 → 1.2 s at sf0.1
    * going 8 → 32-way). At a healthy layout partitions ≥ target and any
    * slack ≥ 1 is an identity.
    */
  def parallel(df: DataFrame, slack: Int = 4): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (scanPartitions(df).toLong * slack < target) df.repartition(target)
    else df
  }

  /** Full-width rebalance for CPU-dense POST-AGGREGATE stages in the
    * small-data regime — the successor to the r16 `slack = 1` probes on
    * the char-md5 lanes. Those probes called `df.rdd.getNumPartitions`
    * on a post-shuffle plan, and under AQE that EXECUTES the upstream
    * query stages at plan-construction time (the r17 profiler read d20's
    * construction at 9.4 s and the purity scan caught a job inside
    * d24's build) — the collapse aggregate ran twice per pass.
    *
    * This guard decides from DRIVER-SIDE FILE METADATA only: it fires
    * iff the plan's source relations total under `cores × 8 MB` of file
    * bytes. In that regime AQE's byte-based coalescing necessarily lands
    * the aggregate output below full width (bytes/floor < cores) while
    * the rebalance itself moves only a few MB; at production volumes the
    * post-shuffle width already covers the cluster (AQE starts shuffles
    * at `initialPartitionNum` ≥ cores and coalesces by bytes), so the
    * guard is an identity and adds no exchange. Partitioning never
    * changes these lanes' results (hash/min aggregates and equi-joins
    * downstream).
    */
  def widenSmall(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val target = df.sparkSession.sparkContext.defaultParallelism
    val rels = df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation
    }
    val known = rels.collect { case h: HadoopFsRelation => h.location.sizeInBytes }
    // any non-file source (unknown volume): stay an identity
    if (known.length == rels.length &&
        known.sum < target.toLong * 8L * 1024 * 1024) df.repartition(target)
    else df
  }

  /** Partition count of the scan under `df`, memoized per (session, scan
    * root paths). `df.rdd.getNumPartitions` plans the whole query and
    * builds its RDD lineage — ~50–150 ms of driver work per call, paid at
    * QUERY-CONSTRUCTION time by every [[parallel]] call site and again on
    * every bench pass (r16 profiler: ~60 s of construction time across the
    * catalog, a visible slice of it here). The count it produces depends
    * only on the scanned files and the session's split confs — projections
    * and filters above the scan never change it — so for a plan that is
    * scan + narrow ops over one file source (the documented [[parallel]]
    * contract) the probe is memoized on the scan's root paths. Any other
    * plan shape falls back to the direct probe, uncached.
    */
  private val scanPartsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Int]()

  private def scanPartitions(df: DataFrame): Int = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val analyzed = df.queryExecution.analyzed
    // the memo is only valid when every node above the scan preserves its
    // partitioning (narrow ops) — anything else (a join, an aggregate, a
    // repartition) changes the count and takes the uncached probe
    val narrowOnly = analyzed.collect {
      case p if !p.isInstanceOf[Project] && !p.isInstanceOf[Filter] &&
        !p.isInstanceOf[SubqueryAlias] && !p.isInstanceOf[LogicalRelation] => p
    }.isEmpty
    val roots = analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.mkString(",")
        case _ => ""
      }
    }
    if (narrowOnly && roots.length == 1 && roots.head.nonEmpty) {
      bounded(scanPartsCache)
      // the key carries the scanned file's identity (mtime+length), not
      // just its path: a store rewritten in place within one session
      // changes its split count and must re-probe, not serve a stale
      // width to the parallel guard
      scanPartsCache.computeIfAbsent(
        (df.sparkSession, roots.head.split(",").map(fileIdent).mkString(",")),
        _ => df.rdd.getNumPartitions)
    } else df.rdd.getNumPartitions
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  // NOTE: fact tables deliberately do NOT route through `parallel` — an
  // A/B bench showed the round-robin rebalance of a whole fact table costs
  // more than the serial decode it avoids for scan→agg/join queries (these
  // move columnar batches, little per-row CPU). The guard pays off only
  // where per-row work is hash/lambda-dense (see the dedup/similarity
  // operators).
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "events"))

  /** Normalizes `ts` to the engine's internal representation — raw
    * nanoseconds-since-epoch as LONG — independent of the file's physical
    * type. Stores have shipped the column both as TIMESTAMP(NANOS), which
    * Spark surfaces as LONG ns under `nanosAsLong` (see
    * [[EngineSession]]), and as TIMESTAMP_NTZ(micros); every downstream
    * event operator does exact integer arithmetic on ns (see
    * [[operators.EventOps]]) and the DuckDB oracle views the same column
    * through `epoch_ns`, so both physical types must land on identical
    * LONG ns values. The NTZ→ns conversion interprets wall-clock micros in
    * the session timezone, which the engine pins to UTC for oracle parity.
    * A codegen'd per-row multiply — no shuffle, no scan blowup; filters on
    * raw `ts` no longer push to parquet, but no event query filters the
    * scan on `ts` (range predicates ride derived keys or join bounds).
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other => throw new IllegalArgumentException(
        s"events.ts: expected LONG ns or a timestamp type, got $other")
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
