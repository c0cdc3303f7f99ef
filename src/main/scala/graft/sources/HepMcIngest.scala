package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, MapType, StringType}

/** Maps a [[HepMcSource]] frame into the engine's store model — the
  * `particles` + `edges` tables of [[graft.hep.Schemas]] — completing the
  * ingest path the reference claims but never implemented
  * (`README.md:39`: "Direct interface from HepMC files to HDF5"; here:
  * HepMC files → the parquet store, via `HepWriter` downstream).
  *
  * HepMC models particles as EDGES of the event DAG (production vertex →
  * end vertex), exactly the reference's COO edge list (`read/base.py:
  * 30-31`), so the mapping is direct — with one wrinkle: HepMC3's ASCII
  * writer ELIDES single-incoming vertices, recording the mother particle
  * id instead of a vertex id. Those vertices must be re-synthesized so the
  * DAG closes: each elided vertex gets a fresh negative id below the
  * event's real vertex ids (ordered by mother id — deterministic), the
  * child's `src` and the mother's `dst` both resolve to it, and `fin`
  * (the reference's `final` mask) becomes "no end vertex, real or
  * synthesized" — a particle whose only children ride an elided vertex is
  * correctly NOT final.
  *
  * Scale shape: synthesis is per-event relational work — a distinct on
  * (event, mother), two windows partitioned by event (events are
  * bounded-size by physics), and two equi-joins back on (event, id) —
  * all shuffle-partitioned on event_id, no driver state, no skew beyond
  * the largest single event.
  */
object HepMcIngest {

  /** `(particles, edges)` frames matching [[graft.hep.Schemas]], ready for
    * [[graft.hep.HepWriter]]. `helicity` and `color` are zeroed: the HepMC3
    * ASCII record carries neither (they live in generator-specific
    * attributes), and 0 is the store's "absent" convention.
    */
  def storeTables(hepmc: DataFrame, process: String): (DataFrame, DataFrame) = {
    val byEvent = Window.partitionBy("event_id")

    // floor for fresh vertex ids: at or below every real vertex id
    val base = hepmc.groupBy("event_id").agg(
      least(coalesce(min("prod_vtx"), lit(0)),
        coalesce(min("end_vtx"), lit(0))).as("vtx_base"))

    // one synthetic vertex per (event, elided mother)
    val synth = hepmc.filter(col("mother_id") > 0)
      .select("event_id", "mother_id").distinct()
      .join(base, "event_id")
      .withColumn("svtx",
        (col("vtx_base") -
          row_number().over(byEvent.orderBy("mother_id"))).cast("int"))
      .select("event_id", "mother_id", "svtx")

    val asMother = synth
      .withColumnRenamed("mother_id", "pcl_id")
      .withColumnRenamed("svtx", "svtx_end")

    val resolved = hepmc
      .join(synth, Seq("event_id", "mother_id"), "left")
      .join(asMother, Seq("event_id", "pcl_id"), "left")
      .withColumn("src",
        when(col("prod_vtx") < 0, col("prod_vtx"))
          .otherwise(coalesce(col("svtx"), lit(0))))
      .withColumn("dst",
        when(col("end_vtx") < 0, col("end_vtx"))
          .otherwise(coalesce(col("svtx_end"), lit(0))))

    val particles = resolved.select(
      lit(process).as("process"),
      col("event_id"),
      (row_number().over(byEvent.orderBy("pcl_id")) - 1).as("idx"),
      col("pmu"),
      col("pdg"),
      col("status").cast("short").as("status"),
      lit(0).cast("short").as("helicity"),
      struct(lit(0).as("color"), lit(0).as("anticolor")).as("color"),
      (col("dst") === 0).as("fin"),
      typedLit(Map.empty[String, Boolean]).as("masks"))

    val edges = resolved.select(
      lit(process).as("process"),
      col("event_id"),
      col("src"),
      col("dst"),
      lit(1.0).as("weight"))

    (particles, edges)
  }
}
