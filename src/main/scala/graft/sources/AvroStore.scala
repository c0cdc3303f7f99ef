package graft.sources

import scala.collection.JavaConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file interchange — the ROW-ORIENTED wire format of the
  * Kafka/schema-registry world, implemented directly against the Avro
  * Java library (this Spark build ships no `spark-avro` datasource, so
  * the engine provides the read/write path itself rather than stubbing
  * the format).
  *
  * Both directions are DISTRIBUTED and streaming:
  *   - [[write]] emits one standard Avro container file per partition
  *     (deflate codec) through the Hadoop FileSystem API from the
  *     EXECUTORS — rows stream through `DataFileWriter`, the driver
  *     never sees data;
  *   - [[read]] parallelizes over the container files (an `.avro`
  *     container is splittable by sync markers, but file-grain
  *     parallelism is the right first cut for the many-files layouts
  *     these pipelines produce) and streams each through
  *     `DataFileReader` over [[FsInput]].
  *
  * The DECLARED-SCHEMA discipline of the JSONL/CSV sources applies: the
  * reader takes the expected Spark schema, maps it to the Avro schema it
  * requires, and fails loudly on drift — no sampling inference pass over
  * 100 TB, no silently-nulled columns.
  *
  * Type surface: the engine-table types (BOOLEAN, INT, BIGINT, FLOAT,
  * DOUBLE, STRING, BINARY, ARRAY of those) with nullable fields as
  * `union(null, T)`. Anything else fails loudly at schema-mapping time.
  */
object AvroStore {

  /** Spark → Avro schema (nullable fields become union(null, T)). */
  private[sources] def avroSchema(schema: StructType, name: String): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case ArrayType(et, _) => Schema.createArray(prim(et))
      case other => throw new IllegalArgumentException(
        s"AvroStore does not map Spark type $other")
    }
    val fields = schema.fields.map { f =>
      val base = prim(f.dataType)
      val s = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, s,
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  private def toAvro(v: Any, dt: DataType, s: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (x: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(x)
    case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
      val elemSchema = unwrap(s).getElementType
      new GenericData.Array[Any](unwrap(s),
        seq.map(e => toAvro(e, et, elemSchema)).asJava)
    case (x, _) => x
  }

  /** Strips the nullable union wrapper to the value branch. */
  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      l.asScala.map(e => fromAvro(e, et)).toSeq
    case (x, _) => x
  }

  /** One container file per partition under `path/part-NNNNN.avro`.
    *
    * Commit protocol (task output is NOT visible until job success):
    * executors write into a job-scoped staging directory
    * `path.inprogress-<uuid>`; only after the action completes does the
    * driver stamp a `_SUCCESS` marker and rename the staging directory
    * into place — so a job that dies after some tasks finish leaves
    * only staging debris, never a readable-looking partial store.
    * [[read]] requires the marker and so refuses uncommitted output.
    * (The parquet stores get the same guarantee from Spark's committer;
    * this hand-rolled container writer has to provide its own.)
    *
    * Debris hygiene: a write that DIES mid-staging (task failure, disk
    * full) strands its `.inprogress-*` directory; the next successful
    * write sweeps stranded staging older than `debrisGraceMs` (same
    * grace discipline as [[VersionedStore.expire]] — younger directories
    * are presumed a concurrent in-flight write and left alone), alongside
    * the `.replaced-*` sweep. AvroStoreEnospcSpec pins the windows with
    * injected mid-write failures.
    */
  def write(df: DataFrame, path: String,
      debrisGraceMs: Long = 3600000L): Unit = {
    val schema = df.schema
    val avroJson = avroSchema(schema, "GraftRow").toString
    val hadoopConfSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val fs = FileSystem.get(new Path(path).toUri,
      df.sparkSession.sparkContext.hadoopConfiguration)
    val stagingStr =
      path + ".inprogress-" + java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(stagingStr)
    fs.mkdirs(staging)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val avro = new Schema.Parser().parse(avroJson)
      val out = FileSystem.get(new Path(stagingStr).toUri, hadoopConfSer.value)
        .create(new Path(stagingStr, f"part-$pid%05d.avro"), true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avro))
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      w.create(avro, out)
      var n = 0L
      rows.foreach { row =>
        val rec = new GenericData.Record(avro)
        var i = 0
        while (i < schema.length) {
          rec.put(i, toAvro(row.get(i), schema(i).dataType,
            avro.getFields.get(i).schema()))
          i += 1
        }
        w.append(rec)
        n += 1
      }
      w.close()
      Iterator.single(n)
    }.sum() // action: materializes the write; per-partition counts discarded
    // commit: marker first (inside staging), then publish. The previous
    // store (if any) is moved ASIDE before the staging rename — never
    // deleted first: delete-then-rename has a crash window in which the
    // old data is gone and the new data is still in staging (no readable
    // copy at all), and a silently failed delete would make
    // rename(staging, existing-dir) nest staging INSIDE the old store.
    // A crash between the two renames here leaves the old store intact
    // under .replaced-* (recoverable by hand), and read() refuses the
    // missing/markerless destination loudly.
    fs.create(new Path(staging, "_SUCCESS"), true).close()
    val dst = new Path(path)
    val aside = new Path(path + ".replaced-" +
      java.util.UUID.randomUUID().toString.take(8))
    if (fs.exists(dst))
      require(fs.rename(dst, aside),
        s"AvroStore.write: could not move previous store $path aside")
    require(!fs.exists(dst) && fs.rename(staging, dst),
      s"AvroStore.write: commit rename $stagingStr -> $path failed")
    // best-effort cleanup AFTER the commit: a failed delete must not fail
    // the (already-committed) write, but it must not leak silently either —
    // warn, and let the sweep below reclaim it on the next successful write
    if (fs.exists(aside) && !fs.delete(aside, true))
      System.err.println(s"AvroStore.write: WARNING could not delete " +
        s"replaced store $aside — will retry on the next write")
    // sweep .replaced-* siblings stranded by earlier crashes between the
    // two commit renames or by failed deletes (globStatus returns null,
    // not empty, for a nonexistent parent glob)
    Option(fs.globStatus(new Path(path + ".replaced-*"))).getOrElse(Array.empty)
      .foreach { s =>
        if (!fs.delete(s.getPath, true))
          System.err.println(
            s"AvroStore.write: WARNING could not sweep ${s.getPath}")
      }
    // ... and staging stranded by writes that DIED mid-flight (theirs
    // never reaches this line; ours just renamed away). Age-gated: a
    // younger .inprogress-* may be a concurrent writer still staging.
    val now = System.currentTimeMillis()
    Option(fs.globStatus(new Path(path + ".inprogress-*")))
      .getOrElse(Array.empty)
      .filter(s => now - s.getModificationTime >= debrisGraceMs)
      .foreach { s =>
        if (!fs.delete(s.getPath, true))
          System.err.println(
            s"AvroStore.write: WARNING could not sweep ${s.getPath}")
      }
  }

  /** Reads every `.avro` container under `path` with file-grain
    * parallelism against a DECLARED schema; a container whose writer
    * schema lacks a declared field (or holds an unconvertible type)
    * fails loudly per file.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new Path(path).toUri, conf)
    // refuse uncommitted output: only [[write]]'s commit rename leaves
    // the marker, so a crashed job's partial part-file set is unreadable
    require(fs.exists(new Path(path, "_SUCCESS")),
      s"$path has no _SUCCESS marker — absent or uncommitted " +
        "(partial) AvroStore output; re-run the writing job")
    // globStatus returns NULL (not empty) for a nonexistent base path
    val files = Option(fs.globStatus(new Path(path, "*.avro")))
      .getOrElse(Array.empty)
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no .avro container files under $path")
    val hadoopConfSer = new org.apache.spark.util.SerializableConfiguration(conf)
    val rdd = spark.sparkContext
      .parallelize(files.toSeq, files.length)
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val in = new FsInput(new Path(p), hadoopConfSer.value)
          val reader = new DataFileReader[GenericRecord](
            in, new GenericDatumReader[GenericRecord]())
          // close on task end, not only on iterator exhaustion — an
          // early-terminating consumer (limit, drift failure below)
          // must not leak the file handle on a long-lived executor
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => reader.close()))
          try {
            val writerSchema = reader.getSchema
            schema.fields.foreach { f =>
              val wf = writerSchema.getField(f.name)
              require(wf != null,
                s"$p: declared column '${f.name}' missing from Avro schema")
              // type drift fails here with file+column context, not as an
              // opaque ClassCastException inside Catalyst row conversion
              val want = unwrap(
                avroSchema(StructType(Seq(f)), "Probe").getFields.get(0).schema())
              val got = unwrap(wf.schema())
              require(got.getType == want.getType &&
                  (got.getType != Schema.Type.ARRAY ||
                    got.getElementType.getType == want.getElementType.getType),
                s"$p: column '${f.name}' is Avro $got, declared ${f.dataType}")
            }
          } catch {
            case e: Throwable => reader.close(); throw e
          }
          new Iterator[Row] {
            def hasNext: Boolean = {
              val h = reader.hasNext
              if (!h) reader.close()
              h
            }
            def next(): Row = {
              val rec = reader.next()
              Row.fromSeq(schema.fields.toSeq.map(f =>
                fromAvro(rec.get(f.name), f.dataType)))
            }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
