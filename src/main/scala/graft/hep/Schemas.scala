package graft.hep

/** The engine's data model for hierarchical event data, flattening the
  * reference's File → Process → Chunk → Event → column hierarchy
  * (reference: heparchy `README.md:14-17`, `read/hdf.py`, `write/hdf.py`)
  * into partitioned columnar tables (SURVEY.md §1.4):
  *
  *   - `particles`: one row per (process, event_id, idx) with the 7
  *     built-in per-particle columns (reference dtypes
  *     `heparchy/annotate.py:7-13`: int32/int16/float64/bool + structured
  *     void → nested structs here);
  *   - `edges`: the per-event ancestry-DAG COO edge list + weights
  *     (reference `write/hdf.py:291-320`);
  *   - `events`: per-event summary (`num_pcls`, custom metadata) —
  *     the event-level attrs of `read/hdf.py:255-260`;
  *   - `processes`: per-process metadata (`process` string, `signal_pdgs`,
  *     `com_e`/`e_unit`, `num_evts`, custom metadata) — the process attrs
  *     of `read/hdf.py:478-496`;
  *   - `custom`: per-name 1-D double datasets keyed by (process, event_id)
  *     — the dynamically-typed `custom/` group (`write/hdf.py:113-124`).
  *
  * `chunk = event_id / evtsPerChunk` is a derived partition column
  * reproducing the reference's chunked addressing (`utils.py:13-14`) as
  * parquet partition pruning.
  */
object Schemas {

  /** 4-momentum; field names follow the storage dtype `x,y,z,e`
    * (reference `write/hdf.py:336`), aka px,py,pz,E (`README.md:33`).
    */
  final case class Pmu(x: Double, y: Double, z: Double, e: Double)

  /** QCD color / anticolor pair (reference `write/hdf.py:344-352`). */
  final case class ColorPair(color: Int, anticolor: Int)

  /** One particle row. `fin` is the reference's `final` mask
    * (`read/hdf.py:318-321`); extra named masks ride in `masks`.
    */
  final case class Particle(
      process: String,
      event_id: Long,
      idx: Int,
      pmu: Pmu,
      pdg: Int,
      status: Short,
      helicity: Short,
      color: ColorPair,
      fin: Boolean,
      masks: Map[String, Boolean])

  /** One ancestry-DAG edge (reference `read/base.py:30-31`). */
  final case class EdgeRow(
      process: String,
      event_id: Long,
      src: Int,
      dst: Int,
      weight: Double)

  /** Per-event summary (event attrs, `read/hdf.py:255-260` + custom_meta). */
  final case class EventMeta(
      process: String,
      event_id: Long,
      num_pcls: Long,
      custom_meta: Map[String, String])

  /** Per-process metadata (process attrs, `read/hdf.py:478-496`).
    * Values that are not strings round-trip JSON-encoded in `custom_meta`
    * (table-property values are string-typed; SURVEY.md §7 hard part 1).
    * `in_pcls`/`out_pcls` back the deprecated `decay` surface (reference
    * `read/hdf.py:482-485`, `write/hdf.py:447-465`) — superseded by
    * `signal_pdgs` but kept so stores migrated from old files keep their
    * incoming/outgoing hard-process PDG lists.
    */
  final case class ProcessMeta(
      process: String,
      process_string: String,
      signal_pdgs: Seq[Int],
      com_e: Double,
      e_unit: String,
      num_evts: Long,
      custom_meta: Map[String, String],
      in_pcls: Seq[Int] = Nil,
      out_pcls: Seq[Int] = Nil)

  /** One named custom per-event dataset (`custom/<name>`). The reference
    * accepts ANY numpy dtype/shape unchecked (`write/hdf.py:113-124`);
    * here the self-describing `dtype` tag selects which typed column
    * carries the payload — `"f8"` → `values`, `"i8"` → `values_long`,
    * `"f8_2d"` → `values_2d` — so integer and 2-D custom data round-trip
    * without lossy double coercion, and the unused columns stay empty
    * (null-cheap in parquet).
    */
  final case class CustomRow(
      process: String,
      event_id: Long,
      name: String,
      values: Seq[Double],
      dtype: String = "f8",
      values_long: Seq[Long] = Nil,
      values_2d: Seq[Seq[Double]] = Nil)

  val ParticlesTable = "particles"
  val EdgesTable = "edges"
  val EventsTable = "events"
  val ProcessesTable = "processes"
  val CustomTable = "custom"

  /** Default events-per-chunk, matching the reference
    * (`write/hdf.py:555`).
    */
  val DefaultEvtsPerChunk = 1000
}
