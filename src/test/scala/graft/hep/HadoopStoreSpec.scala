package graft.hep

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import Schemas._

/** Store metadata must flow through Hadoop's FileSystem API (VERDICT.md r2
  * "What's wrong" #1): these cases drive the writer guard, the `_meta.json`
  * sidecar, and the reader's `evtsPerChunk` through an explicit
  * `file:`-scheme Hadoop URI — the same code path a `hdfs:`/`s3a:` store
  * takes, where a `java.io.File` implementation silently sees nothing and
  * falls back to defaults (wrong chunk addressing).
  */
class HadoopStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), prefix)
      .toAbsolutePath.toString

  test("file:-scheme store round-trips a non-default evts_per_chunk") {
    val local = tmp("hadoopstore")
    val uri = s"file:$local/store"
    val w = new HepWriter(spark, uri, evtsPerChunk = 7)
    val p = w.newProcess("proc").setProcessString("p p > x")
    for (e <- 0 until 15) {
      val b = p.newEvent()
      b.setPdg(Array.tabulate(3)(i => 11 + i))
      p.commitEvent(b)
    }
    w.close()

    val r = new HepReader(spark, uri)
    // the sidecar value, NOT the default 1000: a local-file read through a
    // remote-style URI returning the default is exactly the silent-fallback
    // failure mode this spec pins down
    assert(r.evtsPerChunk == 7)
    val proc = r.process("proc")
    assert(proc.length == 15)
    // chunk addressing derived from the non-default value: event 13 lives
    // in chunk 13/7 = 1
    val ev = proc.event(13)
    assert(ev.count == 3)
    assert(ev.name == Keys.eventKey(13, 7))
  }

  test("writer guard refuses a path occupied by a regular file") {
    val local = tmp("hadoopguard")
    val filePath = s"$local/occupied"
    Files.writeString(java.nio.file.Paths.get(filePath), "not a store")
    val e = intercept[IllegalArgumentException] {
      new HepWriter(spark, s"file:$filePath")
    }
    assert(e.getMessage.contains("already contains data"))
  }

  test("writer guard refuses a non-empty directory, allows an empty one") {
    val local = tmp("hadoopguard2")
    Files.writeString(java.nio.file.Paths.get(local, "junk.txt"), "x")
    val e = intercept[IllegalArgumentException] {
      new HepWriter(spark, s"file:$local")
    }
    assert(e.getMessage.contains("already contains data"))
    // an existing-but-empty directory is a fresh target
    val empty = tmp("hadoopguard3")
    new HepWriter(spark, s"file:$empty") // must not throw
  }
}
