package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.graftaccess.Buses

/** Classifies every registered query's CONSTRUCTION (`QueryDef.build` —
  * NOT `run`, which routes through the memo under audit) as
  * plan-memo-safe or not: the r17 analyzed-plan memo must never cover a
  * query whose build does real work. A build is memo-safe iff
  *
  *   1. its WARM build starts ZERO Spark jobs (no collect/count/write/
  *      checkpoint — nothing a memo hit would silently skip; the COLD
  *      build may pay one-time schema-inference jobs, which is the r16
  *      schema memo's own miss path and never replaced by a memo hit),
  *      and
  *   2. every leaf of the analyzed plan is a parquet relation rooted
  *      under the sfDir store, a literal LocalRelation, or a Range —
  *      i.e. the plan is a pure function of (code, session, store), so
  *      keying the memo on store content identity is sound.
  *
  * `PlanMemoSpec` asserts PlanMemo.memoized ⊆ the PURE set on every test
  * run; this main regenerates the classification for inspection.
  *
  *   java -cp "classes:SPARK_JARS" graft.tools.PurityScan [sfDir] [q1,q2,...]
  */
object PurityScan {

  final case class Purity(
      coldJobs: Int, warmJobs: Int, badLeaves: Seq[String], err: Option[String]) {
    def pure: Boolean = warmJobs == 0 && badLeaves.isEmpty && err.isEmpty
  }

  /** Classifies one query's build on `spark` (which must carry a
    * [[counter]]-registered listener). Builds twice; see object scaladoc.
    */
  def classify(
      spark: SparkSession, jobs: AtomicInteger, q: graft.QueryDef,
      sfDir: String): Purity = {
    val sc = spark.sparkContext

    def leafKinds(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LeafNode, Range => LRange}
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val canonical = new java.io.File(sfDir).getCanonicalPath
      df.queryExecution.analyzed.collect {
        case l: LogicalRelation => l.relation match {
          case h: HadoopFsRelation =>
            val roots = h.location.rootPaths.map(_.toUri.getPath)
            if (roots.nonEmpty && roots.forall(p =>
              new java.io.File(p).getCanonicalPath.startsWith(canonical + "/")))
              "store-parquet"
            else s"foreign-parquet:${roots.mkString(";")}"
          case other => s"relation:${other.getClass.getSimpleName}"
        }
        case _: LocalRelation => "local"
        case _: LRange => "range"
        case leaf: LeafNode => s"leaf:${leaf.getClass.getSimpleName}"
      }
    }

    def buildOnce(): (Int, Seq[String], Option[String]) = {
      Buses.waitUntilListenerBusEmpty(sc)
      val before = jobs.get
      try {
        val df = q.build(spark, sfDir)
        val kinds = leafKinds(df)
        Buses.waitUntilListenerBusEmpty(sc)
        (jobs.get - before, kinds, None)
      } catch { case e: Throwable =>
        Buses.waitUntilListenerBusEmpty(sc)
        (jobs.get - before, Nil, Some(e.getClass.getSimpleName))
      }
    }
    val (j1, k1, e1) = buildOnce()
    val (j2, k2, e2) = buildOnce()
    val bad = (k1 ++ k2).filterNot(
      k => k == "store-parquet" || k == "local" || k == "range").distinct
    Purity(j1, j2, bad, e1.orElse(e2))
  }

  /** Registers a job-start counter on the session (returns it). */
  def counter(spark: SparkSession): AtomicInteger = {
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    jobs
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val only = args.lift(1).map(_.split(",").map(_.trim).toSet)
    val spark = graft.EngineSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val jobs = counter(spark)
    val rows = graft.QueryCatalog.all
      .filter(q => only.forall(_.contains(q.name))).map { q =>
        val p = classify(spark, jobs, q, sfDir)
        val line = s"${q.name}\t${if (p.pure) "PURE" else "EAGER"}" +
          s"\tjobs=${p.warmJobs}/cold=${p.coldJobs}" +
          (if (p.badLeaves.nonEmpty) s"\tbad=${p.badLeaves.mkString(",")}" else "") +
          p.err.map(e => s"\terr=$e").getOrElse("")
        println(line)
        line
      }
    println(s"# pure: ${rows.count(_.contains("\tPURE"))} / ${rows.size}")
    spark.stop()
  }
}
