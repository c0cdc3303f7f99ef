package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.graftaccess.Buses

/** Per-JOB timeline of one query's CONSTRUCTION + action — the drill-down
  * for driver-chain queries (i07/i08/s26...) whose wall is a sequence of
  * eager jobs, not one plan. Prints each Spark job's wall, gap since the
  * previous job ended (pure driver time), and description/call site.
  *
  *   java -cp "classes:SPARK_JARS" graft.tools.ChainProfile <query> [sfDir]
  */
object ChainProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = graft.EngineSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sc = spark.sparkContext
    final case class J(id: Int, start: Long, var end: Long,
        desc: String, site: String)
    val jobs = mutable.LinkedHashMap[Int, J]()
    sc.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.synchronized {
        jobs(j.jobId) = J(j.jobId, j.time, -1L,
          Option(j.properties.getProperty("spark.job.description")).getOrElse(""),
          Option(j.properties.getProperty("callSite.short")).getOrElse(""))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(j.jobId).foreach(_.end = j.time)
      }
    })
    // sample the driver thread's stack every 25 ms: gaps with no job
    // running are pure driver work, and the dominant frames name it
    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = mainThread.getStackTrace
        val interesting = st.dropWhile(f =>
          f.getClassName.startsWith("java.") || f.getClassName.startsWith("jdk."))
        val top = interesting.take(1).map(f =>
          s"${f.getClassName.split('.').last}.${f.getMethodName}").mkString
        val graftFrames = st.filter(_.getClassName.startsWith("graft"))
          .take(2).map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}:${f.getLineNumber}")
          .mkString(" < ")
        samples.add((System.currentTimeMillis(), s"$top  @@  $graftFrames"))
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true)

    val q = graft.QueryCatalog.byName(name)
    // warm pass (memos, JIT, artifacts)
    try q.run(spark, sfDir).count() catch { case e: Throwable => println(e) }
    Buses.waitUntilListenerBusEmpty(sc)
    jobs.synchronized(jobs.clear())
    sampler.start()
    val t0 = System.nanoTime()
    val df = q.run(spark, sfDir)
    val tBuild = (System.nanoTime() - t0) / 1e9
    df.count()
    val tAll = (System.nanoTime() - t0) / 1e9
    Buses.waitUntilListenerBusEmpty(sc)
    println(f"== $name build=$tBuild%.3f s total=$tAll%.3f s, ${jobs.size} jobs")
    sampling = false
    var prevEnd = -1L
    import scala.jdk.CollectionConverters._
    val samp = samples.asScala.toSeq
    jobs.synchronized(jobs.values.toSeq).sortBy(_.start).foreach { j =>
      val gap = if (prevEnd < 0) 0.0 else (j.start - prevEnd) / 1e3
      if (gap > 0.15) {
        // dominant driver frames during the gap window
        val inGap = samp.filter(s => s._1 >= prevEnd && s._1 <= j.start)
          .groupBy(_._2).toSeq.sortBy(-_._2.size).take(3)
        inGap.foreach { case (frame, hits) =>
          println(f"     [gap ${hits.size * 25 / 1000.0}%5.2f s] $frame")
        }
      }
      prevEnd = math.max(prevEnd, j.end)
      println(f"job ${j.id}%3d  ${(j.end - j.start) / 1e3}%7.3f s  gap $gap%7.3f s  ${j.site}  ${j.desc.take(80)}")
    }
    spark.stop()
  }
}
