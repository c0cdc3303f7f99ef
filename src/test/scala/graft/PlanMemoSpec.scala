package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The r17 analyzed-plan memo: plans, never results. These tests pin the
  * three load-bearing properties:
  *
  *   1. ENFORCEMENT — every name in [[PlanMemo.memoized]] has a build
  *      that is provably pure on this live catalog (zero Spark jobs on a
  *      warm build; every plan leaf a store relation / literal / range),
  *      so a memo hit can never skip real work. The classifier is the
  *      same code `graft.tools.PurityScan` prints with.
  *   2. FRESH EXECUTION — a hit shares the analyzed LOGICAL plan but
  *      builds a new QueryExecution, so optimization/physical planning/
  *      execution re-run; nothing computed is reused, and results equal
  *      the unmemoized build's.
  *   3. INVALIDATION — an in-place rewrite of a nested store file (same
  *      entry names, directory mtime unchanged) mints a new key.
  */
class PlanMemoSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("every memoized query's build is pure: zero warm-build jobs, " +
      "store-only plan leaves") {
    val jobs = tools.PurityScan.counter(spark)
    val byName = QueryCatalog.byName
    val failures = PlanMemo.memoized.toSeq.sorted.flatMap { name =>
      byName.get(name) match {
        case None => Some(s"$name: memoized but not in the catalog")
        case Some(q) =>
          val p = tools.PurityScan.classify(spark, jobs, q, sfDir)
          if (p.pure) None
          else Some(s"$name: warmJobs=${p.warmJobs} bad=${p.badLeaves} err=${p.err}")
      }
    }
    assert(failures.isEmpty, "impure memoized builds:\n" + failures.mkString("\n"))
  }

  test("a memo hit is a fresh execution over the same analyzed plan, " +
      "with results equal to the direct build") {
    val q = QueryCatalog.byName("q07_scan_agg")
    val a = q.run(spark, sfDir)
    val b = q.run(spark, sfDir)
    assert(a.queryExecution ne b.queryExecution,
      "each run must execute through its own QueryExecution (no result reuse)")
    assert(a.queryExecution.analyzed eq b.queryExecution.analyzed,
      "the second run should hit the memoized analyzed plan")
    val direct = q.build(spark, sfDir)
    assert(b.collect().toSeq == direct.collect().toSeq)
  }

  test("non-memoized (eager) queries bypass the memo entirely") {
    val q = QueryCatalog.byName("d07_dup_clusters")
    assert(!PlanMemo.memoized(q.name))
    val a = q.run(spark, sfDir)
    val b = q.run(spark, sfDir)
    assert(a.queryExecution.analyzed ne b.queryExecution.analyzed)
  }

  test("an in-place same-name rewrite of a nested store file misses the memo") {
    val dir = Files.createTempDirectory(Paths.get("target"), "planmemo").toString
    // a store containing only documents.parquet — enough for d01. The
    // harness store ships it as a single FILE; re-home it as a directory
    // parquet (one nested part file) so the rewrite below exercises the
    // nested-entry identity.
    val src = Paths.get(sfDir, "documents.parquet")
    val dst = Paths.get(dir, "documents.parquet")
    Files.createDirectories(dst)
    Files.copy(src, dst.resolve("part-00000.snappy.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = QueryCatalog.byName("d01_dedup_exact")
    val p1 = q.run(spark, dir).queryExecution.analyzed
    val p2 = q.run(spark, dir).queryExecution.analyzed
    assert(p1 eq p2, "stable store: second run must hit")
    // rewrite every nested entry IN PLACE: same names, same byte content,
    // fresh mtimes; the parent directory's own mtime does not change
    val dirMtimeBefore = dst.toFile.lastModified
    Files.list(dst).forEach { p =>
      val bytes = Files.readAllBytes(p)
      Files.write(p, bytes)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis + 2000))
    }
    assert(dst.toFile.lastModified == dirMtimeBefore,
      "precondition: the rewrite must not touch the directory's own mtime")
    val p3 = q.run(spark, dir).queryExecution.analyzed
    assert(p3 ne p1, "rewritten store content must miss the plan memo")
  }
}
