package graft.hep

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import Schemas._

/** Read path of the hep facade (reference S1-S6 / P1-P16, `read/hdf.py`).
  *
  * Every projection below is a lazy DataFrame: only the accessed columns
  * reach the parquet reader (column pruning = the reference's lazy
  * per-column reads, `read/hdf.py:262-316`), and process/chunk/event
  * predicates prune partitions and row groups (= the reference's O(1)
  * `divmod` B-tree descent, `read/hdf.py:454-466`).
  *
  * Iteration contract: [[ProcessReader.events]] is UNORDERED by default,
  * matching the reference's native-order scan (`read/hdf.py:419-428`);
  * order explicitly with `.orderBy("event_id")` when needed.
  */
final class HepReader(spark: SparkSession, path: String) {

  private def table(name: String): DataFrame =
    spark.read.parquet(s"$path/$name")

  /** All process metadata (the tiny broadcastable dimension). Stores
    * written before the decay surface existed lack `in_pcls`/`out_pcls`;
    * they are patched in as empty arrays so old stores keep opening
    * (schema evolution, additive-columns-only).
    */
  def processes: Dataset[ProcessMeta] = {
    import spark.implicits._
    var df = table(ProcessesTable)
    for (c <- Seq("in_pcls", "out_pcls") if !df.columns.contains(c))
      df = df.withColumn(c, typedLit(Seq.empty[Int]))
    df.as[ProcessMeta]
  }

  /** Process lookup by key (reference `HdfReader.__getitem__`). */
  def process(key: String): ProcessReader = {
    val metas = processes.filter(col("process") === key).collect()
    require(metas.nonEmpty, s"no such process: $key")
    new ProcessReader(metas.head)
  }

  /** File-level `evts_per_chunk` attr from the `_meta.json` sidecar, read
    * through the Hadoop `FileSystem` of the store's path (works on any
    * scheme — a `java.io.File` read would silently miss the sidecar on
    * HDFS/S3 and mis-address every chunk of a non-default store).
    *
    * `lazy val`: the sidecar is written once at store creation and never
    * rewritten, so one FS read per reader is the whole cost — a plain
    * `def` re-read it on EVERY point lookup (one remote round-trip per
    * `event(n)`), the same eager-attr-cache rationale as the reference's
    * `read/hdf.py:437`. Cache-coherence is per reader instance, matching
    * the reference's per-open-file attribute snapshot.
    */
  lazy val evtsPerChunk: Int =
    HadoopIo.readString(spark, s"$path/_meta.json") match {
      case None => DefaultEvtsPerChunk
      case Some(s) =>
        "\"evts_per_chunk\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s)
          .map(_.group(1).toInt).getOrElse(DefaultEvtsPerChunk)
    }

  final class ProcessReader private[HepReader] (val meta: ProcessMeta) {
    // eager metadata snapshot, like the reference's attr cache
    // (read/hdf.py:437): one driver-side read, then dict hits.
    def processString: String = meta.process_string
    def signalPdgs: Seq[Int] = meta.signal_pdgs
    def comEnergy: (Double, String) = (meta.com_e, meta.e_unit)
    def customMeta: Map[String, String] = meta.custom_meta

    /** `len(process)` → finalized num_evts (reference `read/hdf.py:444`). */
    def length: Long = meta.num_evts

    /** Deprecated reference surface (`string` property alias of the
      * hard-process string; deprecated in the reference too): use
      * [[processString]].
      */
    @deprecated("use processString", "0.1.0")
    def string: String = processString

    /** Deprecated reference surface (`decay` property,
      * `read/hdf.py:482-485`: dict of `in_pcls`/`out_pcls` PDG arrays;
      * deprecated there in favour of `signal_pdgs`): use [[signalPdgs]].
      */
    @deprecated("use signalPdgs", "0.1.0")
    def decay: Map[String, Seq[Int]] =
      Map("in_pcls" -> meta.in_pcls, "out_pcls" -> meta.out_pcls)

    /** Deprecated reference surface (`read_event(n)`): use [[event]]. */
    @deprecated("use event(n)", "0.1.0")
    def readEvent(n: Long): EventReader = event(n)

    private def inProc(df: DataFrame): DataFrame =
      df.where(col("process") === meta.process)

    /** All particle rows of this process (unordered scan). */
    def particles: DataFrame = inProc(table(ParticlesTable))

    /** All edges of this process. */
    def edges: DataFrame = inProc(table(EdgesTable))

    /** Event-level summaries. */
    def events: DataFrame = inProc(table(EventsTable))

    /** Point lookup (reference `proc[evt_num]`): process + chunk partition
      * pruning + event_id row-group skip.
      */
    def event(n: Long): EventReader =
      new EventReader(this, n, n / evtsPerChunk)

    /** Custom datasets side table for this process. */
    def custom: DataFrame = inProc(table(CustomTable))
  }

  final class EventReader private[HepReader] (
      proc: ProcessReader, val eventId: Long, chunk: Long) {

    private def slice(df: DataFrame): DataFrame =
      df.where(col("chunk") === chunk && col("event_id") === eventId)

    /** The event's particle table slice (all columns, pruned on use). */
    def particles: DataFrame = slice(proc.particles)

    def pmu: DataFrame = particles.select(col("idx"), col("pmu"))
    def pdg: DataFrame = particles.select(col("idx"), col("pdg"))
    def status: DataFrame = particles.select(col("idx"), col("status"))
    def helicity: DataFrame = particles.select(col("idx"), col("helicity"))
    def colorCol: DataFrame = particles.select(col("idx"), col("color"))

    /** The `final` mask (reference `read/hdf.py:318-321`). */
    def finalMask: DataFrame = particles.select(col("idx"), col("fin"))

    /** A named extra mask (`masks[name]`). */
    def mask(name: String): DataFrame =
      particles.select(col("idx"),
        coalesce(element_at(col("masks"), name), lit(false)).as(name))

    /** Final-state particles only — `pmu[masks['final']]` semantics. */
    def finalParticles: DataFrame = particles.where(col("fin"))

    def edges: DataFrame = slice(proc.edges).select("src", "dst", "weight")

    /** `num_pcls` from the events summary (attr, not a scan — P8). */
    def count: Long = {
      val r = slice(proc.events).select("num_pcls").collect()
      if (r.isEmpty) 0L else r.head.getLong(0)
    }

    /** Custom dataset by name (`custom[name]`): `values` carries 1-D
      * doubles (first column, as always), `values_long` 1-D ints,
      * `values_2d` 2-D doubles, with `dtype` saying which one this
      * dataset populated (f8 / i8 / f8_2d) — the reference's
      * any-dtype/any-shape passthrough (`write/hdf.py:113-124`) without
      * coercing everything through doubles. Stores written before the
      * typed columns existed surface them as empty arrays.
      */
    def custom(name: String): DataFrame = {
      var df = slice(proc.custom).where(col("name") === name)
      if (!df.columns.contains("dtype"))
        df = df.withColumn("dtype", lit("f8"))
          .withColumn("values_long", typedLit(Seq.empty[Long]))
          .withColumn("values_2d", typedLit(Seq.empty[Seq[Double]]))
      df.select("values", "values_long", "values_2d", "dtype")
    }

    /** Event custom metadata. */
    def customMeta: Map[String, String] = {
      val r = slice(proc.events).select("custom_meta").collect()
      if (r.isEmpty) Map.empty
      else r.head.getMap[String, String](0).toMap
    }

    /** Event key name (reference P9, `read/hdf.py:251-253`). */
    def name: String = Keys.eventKey(eventId, evtsPerChunk)

    /** Deprecated reference surface (`read/hdf.py:329-332`): use
      * [[mask]] instead.
      */
    @deprecated("use mask(name)", "0.1.0")
    def maskDeprecated(nm: String): DataFrame = mask(nm)

    /** Deprecated reference surface (`read/base.py:50-51` `final`): use
      * [[finalMask]] / [[finalParticles]].
      */
    @deprecated("use finalMask", "0.1.0")
    def finalProp: DataFrame = finalMask
  }
}
