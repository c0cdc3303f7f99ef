package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for the harness's single-JVM `local[N]` mode, but every conf here is
  * equally valid on a multi-executor cluster:
  *   - AQE on: runtime partition coalescing + skew-join splitting, which is
  *     what makes the same plans survive a 100x scale-up.
  *   - shuffle partitions sized to the parallelism at hand (the driver env),
  *     not the 200 default.
  *   - UTC session timezone for oracle parity.
  *   - `nanosAsLong`: the `events` table stores TIMESTAMP(NANOS) which Spark
  *     has no native type for; we read it as a raw nanosecond `LONG` and do
  *     exact integer arithmetic on it (see [[operators.EventOps]]), which is
  *     both faster (no timestamp codec) and deterministic across engines.
  */
object EngineSession {
  def defaultCores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** `InferFiltersFromGenerate` synthesizes a `size(e) > 0` pre-filter for
    * every explode; when the exploded array is COMPUTED (a shingle/n-gram
    * `transform` lambda, as in every dedup/text operator here), predicate
    * pushdown then inlines that whole interpreted lambda into a pre-scan
    * Filter — evaluating it once per row for the filter and again for the
    * projection (measured 3-4× slowdown on d05). The rule only pays off
    * when the array is a STORED column; this engine always computes them.
    */
  val ExcludedRules: String = sys.env.getOrElse("SPARK_GRAFT_EXCLUDED_RULES",
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")

  /** Pre-coalesce shuffle width for AQE (see [[builder]]). Env-overridable
    * for A/B scale experiments.
    */
  val InitialPartitions: String =
    sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", "256")

  /** AQE coalesce floor (default 1 MB in Spark). The byte-based floor
    * under-parallelizes CPU-DENSE post-shuffle stages when the shuffled
    * bytes are small but the per-byte work is not: the dedup/similarity
    * pipelines run double-md5 + shingle explodes (~100 CPU-s per shuffled
    * MB) downstream of a collapse aggregate whose output is well under
    * 32 MB, so AQE's 1 MB floor fused them onto 1–2 tasks and the stage
    * ran serial at 32 cores (r16 profiler: d03/d09/i03 at parallelism
    * ≈ 1.0; measured d03 1.4 → 0.5 s normalized from this one conf).
    * 64 KB keeps those stages parallel in the small-bytes regime while
    * changing nothing at scale: the coalesce target is
    * max(totalBytes/parallelism, floor), and any production shuffle has
    * totalBytes/parallelism ≫ 64 KB, so the floor never binds there.
    */
  val MinPartitionSize: String =
    sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k")

  def builder(cores: String = defaultCores): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Start shuffles WIDE and let AQE coalesce down to the advisory
      // size: with width pinned to the core count, per-partition sort
      // depth grows with the data and heavy shuffles (the d05 pair
      // scaffold) go superlinear — measured 29.8 s -> 11.4 s at sf3
      // (30x) from this one conf, while sf0.1 plans coalesce back to
      // the same few partitions they used before (no small-scale cost).
      // This is how the same plan survives 100x without retuning.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        InitialPartitions)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        MinPartitionSize)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", ExcludedRules)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Subset-key co-partitioning: tables co-bucketed on (process,
      // event_id) must join exchange-free on (process, event_id, vtx) —
      // the bucket keys cluster any superset join key. The default (true)
      // forces a full reshuffle whenever partitioning keys != join keys,
      // throwing away the store's co-location; the skew the default guards
      // against does not apply to a layout keyed on the high-cardinality
      // (process, event_id). Applies only when both sides are already
      // compatibly partitioned, so plans without bucketed inputs are
      // unaffected.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // Runtime bloom-filter injection: when a fact join's build side is
      // selectively filtered, plant a bloom of its join keys on the fact
      // side BEFORE the shuffle — at 100 TB this is the single biggest
      // join saving (rows that cannot match never leave the scan stage).
      // Self-gating at small scale: injection requires the probe scan to
      // exceed applicationSideScanSizeThreshold (10 GB default) and the
      // join to be probably-shuffle, so toy runs plan identically with or
      // without it (eligibility of the engine's unhinted fact-join shape
      // is asserted in PlanQualitySpec with the thresholds dropped).
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // Generated-class cache sized for the catalog, not Spark's default
      // 100 entries: a session cycling through the 139-query catalog
      // holds ~700 codegen units, so at the default every pass re-pays
      // Janino compilation + JIT warm-up for evicted classes — measured
      // as the r9 "in-suite vs standalone" gap (full-suite sf0.1 bench
      // 79.9 s -> 54.0 s, d14 3.2 s -> 1.7 s, from this one conf; 97 s
      // of JIT-compiler time during timed passes -> 59 s). The same
      // thrash hits any production session serving a wide query mix;
      // entries are compiled-class handles, so the memory cost is small
      // relative to executor heaps. Static conf — must be set before the
      // first session builds.
      .config("spark.sql.codegen.cache.maxEntries", "2000")

  def local(cores: String = defaultCores): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Applies graft's session confs to an externally-built session builder
    * (used by Verify/Bench which own their master/parallelism settings).
    */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        InitialPartitions)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        MinPartitionSize)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules", ExcludedRules)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // catalog-sized codegen class cache (see builder() for the numbers)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
}
