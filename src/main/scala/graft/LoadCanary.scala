package graft

import org.apache.spark.sql.SparkSession

/** The in-run load canary: a fixed synthetic job (200M codegen'd
  * xxhash64, no I/O, no query code) whose quiet-box time is a property
  * of the MACHINE, not of the engine. Benches time it before and after
  * the measured passes and emit `canary_sec` (min of the two) plus the
  * ratio against [[referenceSec]], so a BENCH JSON self-grades: a run
  * whose ratio reads ≫ 1 was taken on a loaded box and its absolute
  * times are inflated by roughly that factor — drift separates from
  * regression mechanically, no re-run needed.
  *
  * [[referenceSec]] is re-based by `graft.BenchCanary` (min-of-N on a
  * quiet box; methodology in BASELINE.md §canary). The r7 round closed
  * with an unreproducible 0.163 s reference — r8 re-based it from a
  * 20-sample quiet run and records the sample spread alongside.
  */
object LoadCanary {

  /** Quiet-box reference for `canary_sec` on the build machine,
    * measured by `graft.BenchCanary` (min of 20 samples, idle box,
    * 32 threads). See BASELINE.md for the sample spread and date.
    */
  val referenceSec: Double = 0.240

  /** One timed canary run. Callers warm up with an untimed call first. */
  def once(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    // bit_xor, not sum: summing 200M full-range hashes overflows LONG
    // under ANSI mode; xor is overflow-free and just as unoptimizable
    spark.range(200000000L).selectExpr("bit_xor(xxhash64(id))").collect()
    (System.nanoTime() - t0) / 1e9
  }
}

/** Re-base tool for [[LoadCanary.referenceSec]]: prints N timed canary
  * samples plus min/median on a session shaped exactly like `Bench`'s.
  * Run on a QUIET box (`load-avg < 0.5`); the min of the sample is the
  * new reference.
  */
object BenchCanary {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = EngineSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LoadCanary.once(spark) // JIT warm-up, untimed
    val samples = (1 to n).map(_ => LoadCanary.once(spark))
    val sorted = samples.sorted
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"samples: ${samples.map(f3).mkString(" ")}")
    println(s"min=${f3(sorted.head)} median=${f3(sorted(n / 2))} " +
      s"max=${f3(sorted.last)} current_ref=${f3(LoadCanary.referenceSec)}")
    spark.stop()
  }
}
