package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** HepMC3 Asciiv3 WRITE sink — the inverse of [[HepMcSource]], emitting
  * the same public `E`/`U`/`W`/`P`/`V` records `WriterAscii` produces
  * (A. Buckley et al., Comput.Phys.Commun. 260 (2021) 107310), so hepmc
  * is a full interchange format like the parquet store: read → transform
  * → write → read round-trips exactly (HepMcWriterSpec).
  *
  * Record layout per event (the fixture/WriterAscii convention):
  *   - `E <id> <n_vtx> <n_pcl>`, then `U`, then `W` (when present);
  *   - particles in `pcl_id` order; a particle produced at a REAL vertex
  *     is preceded by that vertex's `V <id> 0 [incoming...]` record at
  *     its first use (vertex elision is the reader's to resolve: a
  *     particle with `mother_id > 0` writes the mother id as its parent
  *     and no `V` record — exactly what HepMC3's writer does for
  *     single-incoming vertices);
  *   - end-only vertices (no outgoing particle) follow the particle
  *     block.
  *
  * Scale shape: one output file per partition (the reader's parallelism
  * unit — the format is not byte-splittable), events hash-partitioned
  * and sorted `(event_id, pcl_id)` so each event is contiguous in
  * exactly one file; per-task memory is ONE event's rows, matching the
  * reader's bound. Doubles print via `Double.toString` (exact
  * round-trip by construction).
  */
object HepMcWriter {

  /** Writes `df` (any frame with [[HepMc.schema]]'s columns) as
    * `numFiles` HepMC3 ASCII files under `dir`.
    *
    * Commit protocol: each task writes to a temp path carrying its task
    * attempt id and renames into place only after a fully successful
    * write, so a mid-job failure or a speculative/zombie attempt can
    * never surface a truncated or interleaved final `.hepmc` file (the
    * tolerant reader would otherwise silently parse a partial file as
    * fewer events). Concurrent successful attempts each rename a
    * COMPLETE file; last rename wins, which is safe because attempts of
    * the same partition produce identical bytes (the input sort is
    * deterministic).
    */
  def write(df: DataFrame, dir: String, numFiles: Int = 1): Unit = {
    require(numFiles > 0, s"numFiles must be positive (got $numFiles)")
    val spark = df.sparkSession
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val arranged = df
      .select(HepMc.schema.fieldNames.map(col).toIndexedSeq: _*)
      .repartition(numFiles, col("event_id"))
      .sortWithinPartitions("event_id", "pcl_id")
    val dirStr = dir
    arranged.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        val attempt = tc.taskAttemptId()
        val finalPath = new Path(dirStr, f"part-$pid%05d.hepmc")
        val tmpPath = new Path(dirStr, f"_tmp-part-$pid%05d-attempt-$attempt.hepmc")
        val fs = finalPath.getFileSystem(conf.value)
        // Sweep temp files left by prior attempts of THIS partition (a
        // crashed JVM never reaches its own cleanup; the underscore prefix
        // hides them from readers but they accumulate). A swept file that
        // belonged to a still-live speculative attempt just fails that
        // attempt's write loudly — its rename never happens and Spark
        // retries — so the sweep cannot corrupt a commit.
        val stale = fs.globStatus(
          new Path(dirStr, f"_tmp-part-$pid%05d-attempt-*.hepmc"))
        if (stale != null) stale.foreach { s =>
          try fs.delete(s.getPath, false) catch { case _: Throwable => () }
        }
        var ok = false
        val out = new BufferedWriter(new OutputStreamWriter(
          fs.create(tmpPath, true), StandardCharsets.UTF_8))
        try {
          out.write("HepMC::Version 3.02.05\n")
          out.write("HepMC::Asciiv3-START_EVENT_LISTING\n")
          val buf = mutable.ArrayBuffer.empty[Row]
          var current = Long.MinValue
          var started = false
          def flush(): Unit = if (buf.nonEmpty) {
            writeEvent(out, current, buf); buf.clear()
          }
          while (it.hasNext) {
            val r = it.next()
            val ev = r.getLong(0)
            if (!started || ev != current) { flush(); current = ev; started = true }
            buf += r
          }
          flush()
          out.write("HepMC::Asciiv3-END_EVENT_LISTING\n")
          out.close()
          ok = true
        } finally {
          if (!ok) {
            try out.close() catch { case _: Throwable => () }
            fs.delete(tmpPath, false)
          }
        }
        fs.delete(finalPath, false)
        if (!fs.rename(tmpPath, finalPath)) {
          // Rename-onto-existing fails on some stores (HDFS semantics): if
          // a concurrently successful attempt committed between our delete
          // and our rename, the partition IS committed — and with identical
          // bytes, since attempts of one partition write deterministically.
          // Destination-present is success; only a vanished destination is
          // a real commit failure.
          if (fs.exists(finalPath)) { fs.delete(tmpPath, false); () }
          else throw new java.io.IOException(
            s"commit failed: rename $tmpPath -> $finalPath")
        }
      }
    }
  }

  // row layout follows HepMc.schema field order:
  // event_id, momentum_unit, length_unit, weights, pcl_id, pdg, pmu,
  // mass, status, prod_vtx, mother_id, end_vtx
  private def writeEvent(out: BufferedWriter, eventId: Long,
      rows: mutable.ArrayBuffer[Row]): Unit = {
    val realVtx = mutable.SortedSet.empty[Int](Ordering.Int.reverse) // -1, -2, …
    // elided single-incoming vertices (encoded as mother-id parent links)
    // count toward n_vtx too: HepMC3's WriterAscii counts ALL GenEvent
    // vertices in the E header, including ones it elides as V records.
    val elidedVtx = mutable.Set.empty[Int]
    rows.foreach { r =>
      val pv = r.getInt(9); val ev = r.getInt(11)
      if (pv < 0) realVtx += pv
      else { val m = r.getInt(10); if (m > 0) elidedVtx += m }
      if (ev < 0) realVtx += ev
    }
    out.write(s"E $eventId ${realVtx.size + elidedVtx.size} ${rows.size}\n")
    val head = rows.head
    if (!head.isNullAt(1) && !head.isNullAt(2))
      out.write(s"U ${head.getString(1)} ${head.getString(2)}\n")
    if (!head.isNullAt(3))
      out.write(s"W ${head.getSeq[Double](3).mkString(" ")}\n")
    // incoming lists per real vertex, in pcl_id order (rows are sorted)
    val incoming = mutable.Map.empty[Int, mutable.ArrayBuffer[Int]]
    rows.foreach { r =>
      val ev = r.getInt(11)
      if (ev < 0)
        incoming.getOrElseUpdate(ev, mutable.ArrayBuffer.empty) += r.getInt(4)
    }
    val emitted = mutable.Set.empty[Int]
    def writeVtx(v: Int): Unit = if (emitted.add(v)) {
      val in = incoming.get(v).map(_.mkString(",")).getOrElse("")
      out.write(s"V $v 0 [$in]\n")
    }
    rows.foreach { r =>
      val pv = r.getInt(9)
      if (pv < 0) writeVtx(pv)
      val parent = if (pv < 0) pv else {
        val m = r.getInt(10); if (m > 0) m else 0
      }
      val pmu = r.getStruct(6)
      out.write(s"P ${r.getInt(4)} $parent ${r.getInt(5)} " +
        s"${pmu.getDouble(0)} ${pmu.getDouble(1)} ${pmu.getDouble(2)} " +
        s"${pmu.getDouble(3)} ${r.getDouble(7)} ${r.getInt(8)}\n")
    }
    realVtx.foreach(writeVtx) // end-only vertices close the event
  }
}
