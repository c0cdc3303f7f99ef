package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class EventStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  /** The file stream source needs a directory; stage the single harness
    * file into one.
    */
  lazy val eventsDir: String = {
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "stream-events")
    Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("part-0.parquet"))
    d.toString
  }

  override def afterAll(): Unit = spark.stop()

  test("streaming hourly rollup equals the batch aggregate") {
    val q = EventStream.hourlyRollup(EventStream.events(spark, eventsDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("hourly")
      .select("hour_id", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet

    val batch = graft.Tables.events(spark, sfDir)
      .groupBy(expr("ts div 3600000000000").as("hour_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .collect().map(_.toSeq).toSet

    assert(streamed == batch)
  }

  test("stateful sessionization matches the batch lag-based count") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Ev]

    // run the same state logic through a memory-source stream
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
        spark)
    input.addData(evs.collect().toSeq)
    val q = EventStream.sessionize(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("sessions").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sessions")
      .groupBy("user_id").agg(max("n_sessions").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        lag(col("ts"), 1).over(w).as("prev_ts"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("prev_ts").isNull ||
        col("ts") - col("prev_ts") > EventStream.SessionGapNs, 1L)
        .otherwise(0L)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(streamed == batch)
  }

  test("streaming transitions equal the batch q42 matrix across two batches") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Ev].collect().toSeq
    // split by TIME (not arbitrarily): the operator's contract is ordered
    // per-user arrival across micro-batches; the carried last-event state
    // must stitch the cross-batch transitions
    val cut = evs.map(_.ts).sorted.apply(evs.length / 2)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
        spark)
    input.addData(evs.filter(_.ts < cut))
    val q = EventStream.transitions(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("transitions").start()
    q.processAllAvailable()
    input.addData(evs.filter(_.ts >= cut))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("transitions")
      .groupBy("prev_type", "next_type").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.QueryCatalog.byName("q42_event_transitions")
      .run(spark, sfDir).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) ->
        r.getAs[Long]("n_transitions")).toMap

    // The ONE documented divergence: at the batch-2 boundary the engine
    // evicts users whose last event is older than watermark₁ − TTL
    // (watermark₁ = max batch-1 event time − 2 h; TTL = 2 h), losing
    // exactly the cross-cut edge of those users. Compute that set and
    // assert the streamed matrix equals batch MINUS precisely those edges.
    val maxTs1 = evs.filter(_.ts < cut).map(_.ts).max
    val evictNs = maxTs1 - (2L * 3600 + EventStream.StateTtlMs / 1000) *
      1000000000L
    val byUser = evs.groupBy(_.user_id)
    val lost = byUser.values.flatMap { us =>
      val (pre, post) = us.sortBy(e => (e.ts, e.event_id)).partition(_.ts < cut)
      if (pre.nonEmpty && post.nonEmpty && pre.last.ts < evictNs)
        Some((pre.last.event_type, post.head.event_type))
      else None
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expected = batch.map { case (k, n) =>
      k -> (n - lost.getOrElse(k, 0L))
    }.filter(_._2 > 0)
    assert(lost.values.sum > 0,
      "fixture must exercise at least one eviction or the test is vacuous")
    assert(streamed == expected)
  }

  test("transitions: one dominant user concentrating a trigger sequences exactly") {
    // the documented hot-key caveat: one user contributes ~99% of a
    // micro-batch; its whole slice materializes in one task and must
    // still sequence exactly (n-1 transitions, in (ts, event_id) order)
    import spark.implicits._
    val hot = (0 until 2000).map { i =>
      EventStream.Ev(10000L + i, 1000000000L * (i + 1), 7L,
        if (i % 3 == 0) "click" else if (i % 3 == 1) "view" else "purchase",
        1.0)
    }
    val cold = Seq(
      EventStream.Ev(30000L, 1500000000L, 8L, "click", 1.0),
      EventStream.Ev(30001L, 2500000000L, 8L, "purchase", 1.0))
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
        spark)
    input.addData(scala.util.Random.shuffle(hot ++ cold))
    val q = EventStream.transitions(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("hotuser").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("hotuser")
    assert(got.filter(col("user_id") === 7L).count() === hot.size - 1L)
    // exact sequencing, not just the count: the (click,view,purchase)
    // rotation admits only rotation-consecutive pairs
    val pairs = got.filter(col("user_id") === 7L)
      .groupBy("prev_type", "next_type").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet === Set("click" -> "view", "view" -> "purchase",
      "purchase" -> "click"))
    assert(got.filter(col("user_id") === 8L).count() === 1L)
  }

  test("stream-static enrichment equals the batch join") {
    val dim = graft.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment")
    val q2 = EventStream.enrich(
        EventStream.events(spark, eventsDir), dim, "user_id", "c_custkey")
      .groupBy("c_mktsegment").count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("enriched").start()
    q2.processAllAvailable()
    q2.stop()
    val streamed = spark.table("enriched")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val batch = graft.Tables.events(spark, sfDir)
      .join(dim, col("user_id") === col("c_custkey"), "left")
      .groupBy("c_mktsegment").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("foreachBatch ingest appends all rows exactly once") {
    val out = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "ingest").toString
    val q = EventStream.ingest(EventStream.events(spark, eventsDir), out)
    q.processAllAvailable()
    q.stop()
    val n = spark.read.parquet(out).count()
    assert(n == graft.Tables.events(spark, sfDir).count())
  }

  test("checkpointed ingest resumes across a restart: new files only, " +
      "every event exactly once") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val src = JFiles.createTempDirectory(JPaths.get("target"), "ckpt-src")
    val out = JFiles.createTempDirectory(JPaths.get("target"), "ckpt-out").toString
    val ckpt = JFiles.createTempDirectory(JPaths.get("target"), "ckpt-wal").toString
    val all = graft.Tables.events(spark, sfDir).select("event_id", "ts")
    val total = all.count()
    def stageHalf(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = JFiles.createTempDirectory(JPaths.get("target"), "ckpt-tmp")
      all.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = JFiles.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      JFiles.copy(JPaths.get(part), src.resolve(name))
    }
    stageHalf(col("event_id") % 2 === 0, "a.parquet")
    val q1 = EventStream.ingest(
      EventStream.events(spark, src.toString), out, Some(ckpt))
    q1.processAllAvailable(); q1.stop()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst > 0 && afterFirst < total)

    // second incarnation of the SAME query: new file lands, restart from
    // the checkpoint — file a must not be reprocessed
    stageHalf(col("event_id") % 2 === 1, "b.parquet")
    val q2 = EventStream.ingest(
      EventStream.events(spark, src.toString), out, Some(ckpt))
    q2.processAllAvailable(); q2.stop()
    val result = spark.read.parquet(out)
    assert(result.count() === total, "every event exactly once")
    assert(result.select("event_id").distinct().count() === total,
      "no event duplicated across the restart")
  }

  test("stream-stream interval join equals the batch attribution join") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Ev]

    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
        spark)
    input.addData(evs.collect().toSeq)
    val q = EventStream.attribution(input.toDS(), horizonMin = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attrib")
      .select("click_id", "purchase_id").collect().map(_.toSeq).toSet

    // same micro truncation as the stream side (ts div 1000)
    val e = graft.Tables.events(spark, sfDir)
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"),
        expr("ts div 1000").as("cts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
        expr("ts div 1000").as("pts"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + lit(30L * 60 * 1000000L))
      .select("click_id", "purchase_id").collect().map(_.toSeq).toSet

    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must exercise the join")
  }

  test("stream-stream LEFT OUTER interval join: matches equal the batch " +
      "left join; unconverted clicks emit null exactly once after expiry") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Ev].collect().toSeq.sortBy(e => (e.ts, e.event_id))
    val maxTs = evs.map(_.ts).max
    // watermark-advancing flush rows: the join watermark is the MIN over
    // BOTH filtered inputs, so the flush must flow through each side
    // (a foreign event_type would leave the watermark pinned 1 h behind
    // the latest real click — observed: exactly that click's null row
    // never expires). Negative ids keep them out of the comparison.
    def flush(i: Long) = EventStream.Ev(
      -i, maxTs + (10L * 3600 + i) * 1000000000L, -1L,
      if (i % 2 == 0) "click" else "purchase", 0.0)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
        spark)
    val q = EventStream.attributionOuter(input.toDS(), horizonMin = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib_outer").start()
    input.addData(evs); q.processAllAvailable()
    // BEFORE the watermark passes the horizon, null rows for the recent
    // tail cannot have been emitted: every emitted null click is already
    // expired relative to the pre-flush watermark
    val wmUs = (maxTs / 1000) - 3600L * 1000000L
    val earlyNulls = spark.table("attrib_outer")
      .filter(col("purchase_id").isNull).select("ct").collect()
      .map(r => r.getTimestamp(0).getTime * 1000 + 1800L * 1000000L)
    assert(earlyNulls.forall(_ < wmUs),
      "a null row emitted before its horizon expired")
    // null rows emit on the batch AFTER the watermark passes a click's
    // horizon; several advancing triggers drain the expiry queue fully
    (1L to 4L).foreach { i =>
      input.addData(Seq(flush(i))); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("attrib_outer")
      .filter(col("click_id") >= 0) // drop the flush rows' own emissions
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet

    val e = graft.Tables.events(spark, sfDir)
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"),
        expr("ts div 1000").as("cts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
        expr("ts div 1000").as("pts"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + lit(30L * 60 * 1000000L), "left_outer")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(batch.exists(_._2.isEmpty), "fixture must have unconverted clicks")
    assert(batch.exists(_._2.nonEmpty), "fixture must have conversions")
    assert(streamed === batch)
  }

  test("watermark-bounded streaming dedup drops replayed events") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Ev].collect().toSeq

    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
        spark)
    // batch 1: the events; batch 2: a replay of half of them (a retried
    // upstream producer) — all inside the watermark horizon
    input.addData(evs)
    val q = EventStream.dedupe(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("deduped").start()
    q.processAllAvailable()
    input.addData(evs.take(evs.size / 2))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("deduped")
    assert(out.count() == evs.size, "replayed rows must be dropped")
    assert(out.select("event_id").distinct().count() == evs.size)
  }

  /** The batch prefix-window reference for [[EventStream.anomalies]]:
    * exact integer cents, the identical double tree, |z| > 3 over n ≥ 2
    * priors with positive sample variance.
    */
  private def batchPrefixAnomalies(
      evs: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withMoments = evs
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("c"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("c")).over(w))
      .withColumn("sxx", sum(col("c") * col("c")).over(w))
    val vex = (col("sxx").cast("double")
      - col("sx").cast("double") * col("sx").cast("double") / col("n")) /
      (col("n") - 1)
    val z = (col("c").cast("double") - col("sx").cast("double") / col("n")) /
      sqrt(vex)
    withMoments
      .filter(col("n") >= 2 && vex > 0 && abs(z) > 3)
      .select(col("user_id"), col("event_id"), col("c"), z.as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  test("streaming anomalies equal the batch prefix z-scores bit-for-bit") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Ev]
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
        spark)
    input.addData(evs.collect().toSeq)
    val q = EventStream.anomalies(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("anomalies").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("anomalies")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("cents"), r.getAs[Double]("z")))
      .toSet
    val batch = batchPrefixAnomalies(
      graft.Tables.events(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value"))
    assert(batch.nonEmpty, "fixture must flag at least one anomaly")
    // SET equality on raw doubles — the stream's Scala arithmetic and the
    // batch window's codegen'd expression must round identically
    assert(streamed == batch)
  }

  test("streaming session deltas + hourly sweep state reproduce the " +
      "batch q61 concurrency profile (two-level offset stitching)") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Ev].collect().toSeq.sortBy(e => (e.ts, e.event_id))
    val maxTs = evs.map(_.ts).max
    // sentinel user advances the watermark far enough that TTL eviction
    // closes every real user's trailing session (its own session never
    // closes and never emits)
    def sentinel(i: Long) = EventStream.Ev(
      -i, maxTs + (10L * 3600 + i) * 1000000000L, -1L, "flush", 0.0)
    val cut = evs.length / 2
    val in1 =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
        spark)
    val q1 = EventStream.sessionDeltas(in1.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_deltas").start()
    in1.addData(evs.take(cut)); q1.processAllAvailable()
    in1.addData(evs.drop(cut)); q1.processAllAvailable()
    in1.addData(Seq(sentinel(1))); q1.processAllAvailable()
    in1.addData(Seq(sentinel(2))); q1.processAllAvailable()
    q1.stop()
    val deltas = spark.table("sess_deltas")
      .collect().map(r => EventStream.SessionDelta(r.getLong(0), r.getInt(1)))
      .toSeq

    // the stream's closed-session deltas are EXACTLY the batch bounds'
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t")
    val lagged = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").as("t"))
      .withColumn("new_s", when(lag(col("t"), 1).over(wu).isNull ||
        col("t") - lag(col("t"), 1).over(wu) > 1800000000000L, 1).otherwise(0))
    val bounds = lagged.withColumn("sid", sum(col("new_s")).over(wu))
      .groupBy("user_id", "sid")
      .agg(min(col("t")).as("s0"), max(col("t")).as("s1"))
    val batchDeltas = bounds.select(col("s0").as("t"), lit(1).as("d"))
      .unionAll(bounds.select((col("s1") + 1).as("t"), lit(-1).as("d")))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    assert(deltas.map(d => (d.t, d.d)).sorted === batchDeltas)

    // stage 2 across a trigger cut: per-bucket sweep state, then the
    // consumer-side spine stitch
    val in2 =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.SessionDelta](
        spark)
    val q2 = EventStream.concurrency(in2.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("conc").start()
    val dcut = deltas.length / 2
    in2.addData(deltas.take(dcut)); q2.processAllAvailable()
    in2.addData(deltas.drop(dcut)); q2.processAllAvailable()
    q2.stop()
    // final emission per bucket = the one with the most deltas folded in
    val finals = spark.table("conc").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (b, rows) => (b, rows.map(_._2).maxBy(_._3)) }
    // dense-hour stitch (r11 semantics): every hour from first to last
    // boundary emits; carried-in level joins the per-bucket max, and
    // delta-free hours report the held level
    val byBucket = finals.toMap
    val (lo, hi) = (finals.keys.min, finals.keys.max)
    val stitched = (lo to hi)
      .foldLeft((0L, Vector.empty[(Long, Long)])) {
        case ((offset, acc), b) => byBucket.get(b) match {
          case Some((localMax, total, _)) =>
            (offset + total, acc :+ (b, math.max(offset, localMax + offset)))
          case None => (offset, acc :+ (b, offset))
        }
      }._2.toMap

    val batchQ61 = graft.operators.TimeSeries.concurrency.run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(batchQ61.nonEmpty)
    assert(stitched === batchQ61)
  }

  test("built-in session_window aggregate matches the batch gap-rule " +
      "sessionization (bounds + event counts)") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Ev].collect().toSeq.sortBy(e => (e.ts, e.event_id))
    val maxTs = evs.map(_.ts).max
    def sentinel(i: Long) = EventStream.Ev(
      -i, maxTs + (10L * 3600 + i) * 1000000000L, -1L, "flush", 0.0)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
        spark)
    val q = EventStream.sessionWindows(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("native_sess").start()
    val cut = evs.length / 2
    input.addData(evs.take(cut)); q.processAllAvailable()
    input.addData(evs.drop(cut)); q.processAllAvailable()
    input.addData(Seq(sentinel(1))); q.processAllAvailable()
    input.addData(Seq(sentinel(2))); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("native_sess")
      .filter(col("user_id") >= 0) // the sentinel's own session never closes
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // batch reference: gap-rule sessions; session_window's end is
    // last-event time + the 30-minute gap
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t")
    val batch = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").as("t"))
      .withColumn("new_s", when(lag(col("t"), 1).over(wu).isNull ||
        col("t") - lag(col("t"), 1).over(wu) > 1800000000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(wu))
      .groupBy("user_id", "sid")
      .agg(min(col("t")).as("s0"), max(col("t")).as("s1"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), expr("s0 div 1000").as("s0_us"),
        expr("s1 div 1000 + 1800000000").as("s1_us"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }

  test("anomalies pin the HALF_UP cents quantization (negative half-cent)") {
    import spark.implicits._
    def ev(id: Long, minute: Long, v: Double) =
      EventStream.Ev(id, (3600L + minute * 60L) * 1000000000L, 7L, "click", v)
    // two low-variance priors, then a -0.125 outlier: DECIMAL(12,2)
    // HALF_UP rounds away from zero → -13 cents (math.round gives -12)
    val evs = Seq(ev(1, 0, 10.00), ev(2, 1, 10.02), ev(3, 2, -0.125))
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
        spark)
    input.addData(evs)
    val q = EventStream.anomalies(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("halfup").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("halfup").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("cents"),
        r.getAs[Double]("z"))).toSet
    assert(got.map(_._1) === Set(3L))
    assert(got.head._2 === -13L, s"HALF_UP must give -13 cents: $got")
    val batch = batchPrefixAnomalies(evs.toDF())
    assert(got.map(t => (t._1, t._2)) === batch.map(t => (t._2, t._3)))
  }

  test("anomalies score cross-trigger late data by ARRIVAL order " +
      "(the documented prefix-by-arrival contract)") {
    import spark.implicits._
    def ev(id: Long, minute: Long, v: Double) =
      EventStream.Ev(id, (3600L + minute * 60L) * 1000000000L, 5L, "click", v)
    // trigger 1: minutes 0,1,2,4,5 (minute 3 missing); trigger 2 delivers
    // the minute-3 outlier LATE but inside the 2 h watermark
    val quiet = Seq(ev(1, 0, 10.11), ev(2, 1, 10.15), ev(3, 2, 10.09),
      ev(5, 4, 10.13), ev(6, 5, 10.10))
    val late = ev(4, 3, 99.99)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
        spark)
    input.addData(quiet)
    val q = EventStream.anomalies(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("latearrival").start()
    q.processAllAvailable()
    input.addData(Seq(late))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("latearrival").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("z"))).toSet
    // expected: scored against ALL FIVE earlier-arriving events (arrival
    // order), not the three that precede it in timestamp order
    def zAgainst(priors: Seq[Double], v: Double): Double = {
      val cs = priors.map(p =>
        (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
      val c = (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
      val n = cs.length; val sx = cs.sum; val sxx = cs.map(x => x * x).sum
      val vv = (sxx.toDouble - sx.toDouble * sx.toDouble / n) / (n - 1)
      (c.toDouble - sx.toDouble / n) / math.sqrt(vv)
    }
    val zArrival = zAgainst(Seq(10.11, 10.15, 10.09, 10.13, 10.10), 99.99)
    val zTsOrder = zAgainst(Seq(10.11, 10.15, 10.09), 99.99)
    assert(got === Set((4L, zArrival)))
    assert(zArrival !== zTsOrder, "fixture must distinguish the contracts")
  }

  test("transformWithState user totals equal the batch aggregate across " +
      "a trigger cut (modern state API, RocksDB-backed)") {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Ev].collect().toSeq.sortBy(e => (e.ts, e.event_id))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
          spark)
      // TTL beyond the fixture's span: the identity pin must not race
      // idle-eviction (pinned separately below)
      val q = EventStream.userTotals(input.toDS(), ttlMs = 30L * 24 * 3600 * 1000)
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_totals").start()
      val cut = evs.length / 2
      input.addData(evs.take(cut)); q.processAllAvailable()
      input.addData(evs.drop(cut)); q.processAllAvailable()
      q.stop()
      // Update mode: the final emission per user carries the full totals
      val streamed = spark.table("tws_totals").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).map { case (u, rows) => (u, rows.map(_._2).maxBy(_._1)) }
      val batch = graft.Tables.events(spark, sfDir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")).as("s"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState timer eviction: a user idle past the TTL " +
      "restarts from zero (timers fire even for keys with new data)") {
    import spark.implicits._
    def ev(id: Long, user: Long, hour: Long) = EventStream.Ev(
      id, hour * 3600L * 1000000000L + 1L, user, "click", 1.0)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
          spark)
      val q = EventStream.userTotals(input.toDS(), ttlMs = 2L * 3600 * 1000)
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_evict").start()
      input.addData(Seq(ev(1, 7, 1), ev(2, 7, 1))) // user 7: 2 events
      q.processAllAvailable()
      // 30 h later another user advances the watermark far past 7's TTL
      input.addData(Seq(ev(3, 8, 31)))
      q.processAllAvailable()
      // user 7 returns: the timer fired, totals restart at 1
      input.addData(Seq(ev(4, 7, 32)))
      q.processAllAvailable()
      q.stop()
      val last7 = spark.table("tws_evict").filter(col("user_id") === 7)
        .collect().map(r => (r.getLong(1), r.getLong(2))).maxBy(_._1)
      assert(last7 === ((2L, 200L)), "pre-eviction totals")
      val all7 = spark.table("tws_evict").filter(col("user_id") === 7)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(all7.contains((1L, 100L)),
        s"the returning user must restart from zero: $all7")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("anomaly moments stitch exactly across micro-batches") {
    import spark.implicits._
    // two users, all events inside one hour (no TTL eviction possible),
    // cut mid-stream: the carried (n, Σ, Σ²) must score post-cut events
    // against the FULL prefix, not a cold restart
    // base offset keeps the first event's event-time ABOVE the initial
    // watermark (epoch 0) — an et = 0 row would be dropped as late
    def ev(id: Long, user: Long, minute: Long, v: Double) =
      EventStream.Ev(id, (3600L + minute * 60L) * 1000000000L, user, "click", v)
    val quiet = Seq(10.11, 10.15, 10.09, 10.13, 10.10)
    val evs = (1L to 2L).flatMap { u =>
      quiet.zipWithIndex.map { case (v, i) =>
        ev(u * 100 + i, u, i.toLong, v)
      } :+ ev(u * 100 + 9, u, 9L, 99.99) // the post-cut outlier
    }
    val (pre, post) = evs.partition(_.ts < (3600L + 4L * 60) * 1000000000L)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Ev](
        spark)
    input.addData(pre)
    val q = EventStream.anomalies(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("stitch").start()
    q.processAllAvailable()
    input.addData(post)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stitch")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("cents"), r.getAs[Double]("z")))
      .toSet
    val batch = batchPrefixAnomalies(evs.toDF())
    assert(batch.map(t => (t._1, t._2)) ==
      Set((1L, 109L), (2L, 209L)), "exactly the two outliers flag")
    assert(streamed == batch)
  }

  test("late data beyond the watermark is DROPPED and the drop is OBSERVABLE " +
      "in the progress metrics (the ops contract monitoring relies on)") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    import spark.implicits._
    // file 1: events up to hour H with one far-future row that drags the
    // watermark past H + 2h; file 2: a LATE row back at hour H — inside
    // the first batch it would have aggregated, now it must be dropped,
    // and stateOperators.numRowsDroppedByWatermark must say so
    val src = JFiles.createTempDirectory(JPaths.get("target"), "late-src")
    val hour = 3600000000000L
    val base = 450000L * hour
    def stage(rows: Seq[(Long, Long, Long, String, Double, String)], name: String): Unit = {
      val tmp = JFiles.createTempDirectory(JPaths.get("target"), "late-tmp")
      rows.toDF("event_id", "rawns", "user_id", "event_type", "value", "props")
        .withColumn("ts", expr("timestamp_micros(rawns div 1000)")).drop("rawns")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = JFiles.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      JFiles.copy(JPaths.get(part), src.resolve(name))
    }
    stage(Seq(
      (1L, base + 1L, 1L, "view", 10.0, "{}"),
      (2L, base + 10L * hour, 2L, "view", 20.0, "{}")), "a.parquet")

    val schema = spark.read.parquet(src.toString).schema
    val stream = graft.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src.toString))
    val q = EventStream.hourlyRollup(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("laterollup").start()
    q.processAllAvailable()
    // the LATE row: hour of `base`, far behind the watermark (base+9h)
    stage(Seq((3L, base + 2L, 1L, "view", 99.0, "{}")), "b.parquet")
    q.processAllAvailable()
    val dropped = q.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .map(_.numRowsDroppedByWatermark).sum
    q.stop()
    assert(dropped == 1L,
      s"expected exactly the late row dropped and accounted, got $dropped")
    // and the result reflects the drop: hour(base) kept its first-batch
    // aggregate, the 99.0 never entered
    val rows = spark.table("laterollup").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows.get(base / hour).forall(_ == 10.0))
  }

  test("streaming CUSUM equals batch q71 exactly, across a trigger cut") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    import spark.implicits._
    val src = JFiles.createTempDirectory(JPaths.get("target"), "cusum-src")
    val all = graft.Tables.events(spark, sfDir)
    val tsMid = all.selectExpr("percentile_approx(ts, 0.5)").head().getLong(0)
    def stage(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = JFiles.createTempDirectory(JPaths.get("target"), "cusum-tmp")
      all.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = JFiles.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      JFiles.copy(JPaths.get(part), src.resolve(name))
    }
    stage(col("ts") <= tsMid, "a.parquet")
    stage(col("ts") > tsMid, "b.parquet")

    val schema = spark.read.parquet(src.toString).schema
    val stream = graft.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src.toString))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Ev]
    val q = EventStream.cusum(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusumstream").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("cusumstream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.QueryCatalog.byName("q71_cusum_alarms").run(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch.nonEmpty, "fixture produced no alarms — test is vacuous")
    assert(streamed == batch,
      s"stream/batch alarm sets differ: only-stream=${streamed -- batch}, " +
        s"only-batch=${batch -- streamed}")
  }

  test("streaming 24h reach equals batch q65 on every emitted hour, " +
      "including across a trigger cut") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    // stage the corpus as TWO files split at the time median so the
    // chained dedup→window state crosses a real trigger boundary
    val src = JFiles.createTempDirectory(JPaths.get("target"), "reach-src")
    val all = graft.Tables.events(spark, sfDir)
    val tsMid = all.selectExpr("percentile_approx(ts, 0.5)").head().getLong(0)
    def stage(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = JFiles.createTempDirectory(JPaths.get("target"), "reach-tmp")
      all.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = JFiles.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      JFiles.copy(JPaths.get(part), src.resolve(name))
    }
    stage(col("ts") <= tsMid, "a.parquet")
    stage(col("ts") > tsMid, "b.parquet")

    val schema = spark.read.parquet(src.toString).schema
    val stream = graft.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // force the cut
        .parquet(src.toString))
    val q = EventStream.reach(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("reach24").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("reach24").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed.nonEmpty, "watermark never closed a window")

    val batch = graft.QueryCatalog.byName("q65_sliding_distinct")
      .run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    streamed.foreach { case (h, n) =>
      assert(batch.get(h).contains(n), s"hour $h: stream $n != batch ${batch.get(h)}")
    }
    // the watermark (max event time − 3 h net) must have closed almost
    // all of the span: everything up to hmax − 4 h is emitted
    val hmax = batch.keySet.max
    ((batch.keySet.min) to (hmax - 4)).foreach { h =>
      assert(streamed.contains(h), s"hour $h never emitted")
    }
  }
}
