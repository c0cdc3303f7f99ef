package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.EnospcFs

/** ENOSPC-mid-write proofs for [[AvroStore]] — the one store whose
  * commit protocol is HAND-ROLLED (executor-side Avro writes into a
  * staging directory, marker, rename) rather than Spark's committer, so
  * it gets the same injected-disk-full treatment as the parquet-backed
  * artifacts:
  *
  *  - an executor's part-file write dies → `write` throws, the previous
  *    store stays fully readable (the publish renames never ran), the
  *    stranded `.inprogress-*` staging is refused by [[AvroStore.read]]
  *    and swept by the next successful write once past the debris grace;
  *  - the `_SUCCESS` marker create dies (all parts staged!) → still no
  *    publish, previous store intact, retry heals.
  */
class AvroStoreEnospcSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = graft.EngineSession.local("4")
    s.sparkContext.hadoopConfiguration
      .set("fs.enospc.impl", classOf[EnospcFs].getName)
    s
  }

  override def afterAll(): Unit = {
    EnospcFs.failWhen = _ => false
    spark.stop()
  }

  private def tmp(): String =
    "enospc:" + Files.createTempDirectory(Paths.get("target"), "avroeno")
      .toAbsolutePath.toString + "/store"

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def texts(df: DataFrame): Set[String] =
    df.select("text").collect().map(_.getString(0)).toSet

  private def local(path: String) = new java.io.File(path.stripPrefix("enospc:"))

  test("ENOSPC mid part-file write: old store intact, staging debris " +
    "refused by read and swept by the next write, retry heals") {
    val store = tmp()
    val v1 = docs((1L, "first generation content"))
    AvroStore.write(v1, store)
    assert(texts(AvroStore.read(spark, store, v1.schema)) ===
      Set("first generation content"))

    val v2 = docs((1L, "second generation content"))
    val e = intercept[Throwable] {
      EnospcFs.armed(p => p.contains(".inprogress-") && p.endsWith(".avro")) {
        AvroStore.write(v2, store)
      }
    }
    assert(EnospcFs.causeChain(e).contains("No space left on device"))

    // no publish happened: the old store reads exactly as before
    assert(texts(AvroStore.read(spark, store, v1.schema)) ===
      Set("first generation content"))
    // the torn staging is on disk but markerless — read refuses it
    val debris = local(store).getParentFile.listFiles()
      .filter(_.getName.startsWith("store.inprogress-"))
    assert(debris.nonEmpty, "expected stranded staging debris")
    val e2 = intercept[IllegalArgumentException] {
      AvroStore.read(spark, store + debris.head.getName.stripPrefix("store"),
        v1.schema)
    }
    assert(e2.getMessage.contains("_SUCCESS"))

    // retry with space back: publishes v2 AND sweeps the aged debris
    AvroStore.write(v2, store, debrisGraceMs = 0L)
    assert(texts(AvroStore.read(spark, store, v2.schema)) ===
      Set("second generation content"))
    assert(local(store).getParentFile.listFiles()
      .count(_.getName.startsWith("store.inprogress-")) === 0,
      "stranded staging must sweep on the next successful write")
  }

  test("ENOSPC on the _SUCCESS marker: parts staged but nothing " +
    "publishes; the previous store survives and a retry heals") {
    val store = tmp()
    val v1 = docs((1L, "first generation content"))
    AvroStore.write(v1, store)

    val v2 = docs((1L, "second generation content"))
    val e = intercept[Throwable] {
      EnospcFs.armed(p => p.contains(".inprogress-") &&
        p.endsWith("_SUCCESS")) {
        AvroStore.write(v2, store)
      }
    }
    assert(EnospcFs.causeChain(e).contains("No space left on device"))
    assert(texts(AvroStore.read(spark, store, v1.schema)) ===
      Set("first generation content"))

    AvroStore.write(v2, store, debrisGraceMs = 0L)
    assert(texts(AvroStore.read(spark, store, v2.schema)) ===
      Set("second generation content"))
    assert(local(store).getParentFile.listFiles()
      .count(_.getName.startsWith("store.inprogress-")) === 0)
  }
}
