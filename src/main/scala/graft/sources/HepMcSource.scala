package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** HepMC3 ASCII event records as a DataSource V2 batch source:
  * `spark.read.format("hepmc").load(path)` → one row per particle.
  *
  * The reference claims direct HepMC ingest (`README.md:39`,
  * `read/__init__.py:10-11`) but ships zero code behind the claim; this
  * source implements it for real against the PUBLIC HepMC3 Asciiv3 event
  * format (A. Buckley et al., "The HepMC3 Event Record Library",
  * Comput.Phys.Commun. 260 (2021) 107310 — the `E`/`U`/`W`/`P`/`V` line
  * records written by HepMC3's `WriterAscii`):
  *
  *   - `E <id> <n_vtx> <n_pcl>`      event header (starts a new event)
  *   - `U <mom_unit> <len_unit>`     units (GEV/MEV, MM/CM)
  *   - `W <w1> <w2> ...`             event weights
  *   - `P <id> <parent> <pdg> <px> <py> <pz> <e> <m> <status>`
  *       particle; `parent` < 0 is its production VERTEX id, > 0 is its
  *       mother PARTICLE id (the writer elides 1-in vertices), 0 is none
  *   - `V <id> <status> [p1,p2,...]` vertex with its incoming particles
  *       (optionally `@ x y z t` position, ignored — the reference's
  *       store model keeps no vertex positions)
  *
  * Unknown record kinds (`A` attributes, `T`/`N` run info, `HepMC::`
  * framing) are skipped, matching HepMC3's own tolerant readers.
  *
  * Scale shape: the format is line-oriented but an EVENT spans many lines,
  * so files are not byte-splittable without an index — parallelism is one
  * input partition PER FILE (the standard Spark treatment of non-splittable
  * text such as gzip; shard large runs across many .hepmc files, which is
  * how generators emit them anyway). The reader streams line-by-line
  * through Hadoop's FileSystem (HDFS/S3 transparent) buffering exactly one
  * event at a time — memory is bounded by the largest single event, never
  * the file. Column pruning is pushed into the reader: unrequested fields
  * are never materialized into rows.
  */
object HepMc {

  val PmuType: StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("z", DoubleType, nullable = false),
    StructField("e", DoubleType, nullable = false)))

  /** One row per particle; event-level fields (units, weights) repeat per
    * row and compress away in any columnar sink.
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("momentum_unit", StringType, nullable = true),
    StructField("length_unit", StringType, nullable = true),
    StructField("weights", ArrayType(DoubleType, containsNull = false), nullable = true),
    StructField("pcl_id", IntegerType, nullable = false),
    StructField("pdg", IntegerType, nullable = false),
    StructField("pmu", PmuType, nullable = false),
    StructField("mass", DoubleType, nullable = false),
    StructField("status", IntegerType, nullable = false),
    StructField("prod_vtx", IntegerType, nullable = false),
    StructField("mother_id", IntegerType, nullable = false),
    StructField("end_vtx", IntegerType, nullable = false)))

  private[sources] final case class Pcl(
      id: Int, parent: Int, pdg: Int,
      px: Double, py: Double, pz: Double, e: Double, m: Double,
      status: Int, var endVtx: Int = 0)

  private[sources] final class EventAcc(val eventId: Long) {
    var momUnit: String = null
    var lenUnit: String = null
    var weights: Array[Double] = null
    val pcls = mutable.ArrayBuffer.empty[Pcl]
    val vtxIncoming = mutable.ArrayBuffer.empty[(Int, Array[Int])]

    /** Resolve each particle's end vertex from the V incoming lists. */
    def sealEvent(): EventAcc = {
      if (vtxIncoming.nonEmpty) {
        val byId = pcls.iterator.map(p => p.id -> p).toMap
        vtxIncoming.foreach { case (v, in) =>
          in.foreach(pid => byId.get(pid).foreach(_.endVtx = v))
        }
      }
      this
    }
  }

  /** Parse one event body line into the accumulator; returns the id of a
    * new event when the line is an `E` header, else None. Pure, testable.
    */
  private[sources] def parseLine(line: String, acc: EventAcc): Option[Long] = {
    if (line == null || line.length < 2 || line.charAt(1) != ' ') return None
    try line.charAt(0) match {
      case 'E' =>
        Some(line.split("\\s+")(1).toLong)
      case 'U' if acc != null =>
        val t = line.split("\\s+")
        if (t.length >= 3) { acc.momUnit = t(1); acc.lenUnit = t(2) }
        None
      case 'W' if acc != null =>
        acc.weights = line.split("\\s+").tail.map(_.toDouble)
        None
      case 'P' if acc != null =>
        val t = line.split("\\s+")
        acc.pcls += Pcl(t(1).toInt, t(2).toInt, t(3).toInt,
          t(4).toDouble, t(5).toDouble, t(6).toDouble, t(7).toDouble,
          t(8).toDouble, t(9).toInt)
        None
      case 'V' if acc != null =>
        val t = line.split("\\s+")
        val vid = t(1).toInt
        t.find(_.startsWith("[")) match {
          case Some(listTok) =>
            val in = listTok.stripPrefix("[").stripSuffix("]")
            if (in.nonEmpty)
              acc.vtxIncoming += vid -> in.split(",").map(_.trim.toInt)
          case None => // vertex with no incoming list: nothing to resolve
        }
        None
      case _ => None // A/T/N/HepMC:: framing and anything unknown
    } catch {
      // malformed body records (truncated P, garbage W payloads) are
      // skipped like unknown kinds — HepMC3's own readers are tolerant;
      // a malformed E header still throws, since silently dropping an
      // event boundary would merge adjacent events undetected
      case e: RuntimeException if line.charAt(0) != 'E' &&
          (e.isInstanceOf[NumberFormatException] ||
           e.isInstanceOf[IndexOutOfBoundsException]) => None
    }
  }
}

class HepMcSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "hepmc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HepMc.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "hepmc source needs a path: spark.read.format(\"hepmc\").load(path)")
    HepMcTable(path)
  }
}

private[sources] final case class HepMcTable(path: String)
    extends Table with SupportsRead {

  override def name(): String = s"hepmc:$path"

  override def schema(): StructType = HepMc.schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HepMcScanBuilder(path)
}

private[sources] final class HepMcScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = HepMc.schema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve the engine's field definitions (nullability, nested pmu)
    // while honoring the pruned selection and its order
    required = StructType(requiredSchema.fieldNames.toSeq
      .map(n => HepMc.schema(HepMc.schema.fieldIndex(n))))
  }

  override def build(): Scan = HepMcScan(path, required)
}

private[sources] final case class HepMcScan(path: String, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"HepMcScan path=$path columns=${required.fieldNames.mkString(",")}"

  /** One partition per file: driver-side listing via the session's Hadoop
    * conf (glob, directory, or single file). Directories are walked
    * RECURSIVELY (generators often shard runs into nested dirs); hidden
    * files and hidden path components are skipped.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val hconf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    def hidden(n: String): Boolean = n.startsWith("_") || n.startsWith(".")
    val files = matched.flatMap { st =>
      if (st.isDirectory) {
        val it = fs.listFiles(st.getPath, /* recursive = */ true)
        val buf = mutable.ArrayBuffer.empty[Path]
        val rootDepth = st.getPath.depth()
        while (it.hasNext) {
          val f = it.next().getPath
          // reject if any component below the matched root is hidden
          var q = f; var keep = true
          while (q.depth() > rootDepth) { if (hidden(q.getName)) keep = false; q = q.getParent }
          if (keep) buf += f
        }
        buf.toSeq
      } else Seq(st.getPath).filterNot(f => hidden(f.getName))
    }.sortBy(_.toString)
    require(files.nonEmpty, s"hepmc: no input files at $path")
    files.map(f => HepMcInputPartition(f.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    HepMcReaderFactory(required, conf)
  }
}

private[sources] final case class HepMcInputPartition(file: String)
    extends InputPartition

private[sources] final case class HepMcReaderFactory(
    required: StructType, conf: SerializableConfiguration)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new HepMcPartitionReader(
      partition.asInstanceOf[HepMcInputPartition].file, required, conf.value)
}

/** Streams one file: buffers a single event, seals it (end-vertex
  * resolution), emits one InternalRow per particle, moves on. Only the
  * pruned columns are materialized.
  */
private[sources] final class HepMcPartitionReader(
    file: String, required: StructType, conf: Configuration)
    extends PartitionReader[InternalRow] {

  import HepMc._

  private val in = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    new BufferedReader(
      new InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
  }

  // one extractor per required top-level column — pruning happens here
  private val extractors: Array[(EventAcc, Pcl) => Any] =
    required.fieldNames.map {
      case "event_id" => (ev: EventAcc, _: Pcl) => ev.eventId
      case "momentum_unit" => (ev: EventAcc, _: Pcl) =>
        if (ev.momUnit == null) null else UTF8String.fromString(ev.momUnit)
      case "length_unit" => (ev: EventAcc, _: Pcl) =>
        if (ev.lenUnit == null) null else UTF8String.fromString(ev.lenUnit)
      case "weights" => (ev: EventAcc, _: Pcl) =>
        if (ev.weights == null) null
        else new GenericArrayData(ev.weights.map(x => x: Any))
      case "pcl_id" => (_: EventAcc, p: Pcl) => p.id
      case "pdg" => (_: EventAcc, p: Pcl) => p.pdg
      case "pmu" => (_: EventAcc, p: Pcl) =>
        new GenericInternalRow(Array[Any](p.px, p.py, p.pz, p.e))
      case "mass" => (_: EventAcc, p: Pcl) => p.m
      case "status" => (_: EventAcc, p: Pcl) => p.status
      case "prod_vtx" => (_: EventAcc, p: Pcl) => if (p.parent < 0) p.parent else 0
      case "mother_id" => (_: EventAcc, p: Pcl) => if (p.parent > 0) p.parent else 0
      case "end_vtx" => (_: EventAcc, p: Pcl) => p.endVtx
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }

  private var acc: EventAcc = null
  private var pending: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = null
  private var eof = false

  private def rowsOf(ev: EventAcc): Iterator[InternalRow] = {
    ev.sealEvent()
    ev.pcls.iterator.map { p =>
      val vals = new Array[Any](extractors.length)
      var i = 0
      while (i < extractors.length) { vals(i) = extractors(i)(ev, p); i += 1 }
      new GenericInternalRow(vals)
    }
  }

  /** Advance the line stream until another event is fully buffered. */
  private def readNextEvent(): Unit = {
    while (!pending.hasNext && !eof) {
      val line = in.readLine()
      if (line == null) {
        eof = true
        if (acc != null) { pending = rowsOf(acc); acc = null }
      } else parseLine(line, acc) match {
        case Some(newId) =>
          val done = acc
          acc = new EventAcc(newId)
          if (done != null) pending = rowsOf(done)
        case None =>
      }
    }
  }

  override def next(): Boolean = {
    readNextEvent()
    if (pending.hasNext) { current = pending.next(); true } else false
  }

  override def get(): InternalRow = current

  override def close(): Unit = in.close()
}
