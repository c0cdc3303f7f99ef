package graft.streaming

/** Runnable example: stream the harness events through the watermarked
  * hourly rollup and print the first windows.
  *
  * Run: `runMain graft.streaming.StreamDemo [eventsParquetDir]`
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("8")
    val dir = args.headOption.getOrElse {
      // stage the harness single-file table into a directory source
      val d = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("target"), "stream-demo")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        d.resolve("part-0.parquet"))
      d.toString
    }
    val q = EventStream.hourlyRollup(EventStream.events(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_demo").start()
    q.processAllAvailable()
    q.stop()
    println("DEMO streaming hourly rollup (first 10 windows):")
    spark.table("hourly_demo").orderBy("hour_id", "event_type").show(10)
    spark.stop()
  }
}
