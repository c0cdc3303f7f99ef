package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics + plan shape for the second time-series batch (q64-q66).
  *
  * q64's dyadic-weight EWMA is re-derived here by a literal driver-side
  * recursion (the fold the frame expression replaces); q65's projected
  * sliding distinct is pinned against the brute-force range-join
  * definition; q66's buckets must tile the full corpus exactly once.
  */
class TimeSeries2Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("q64 EWMA equals the driver-side truncated dyadic fold, per event") {
    val got = graft.QueryCatalog.byName("q64_ewma").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got.nonEmpty)

    // independent reference: group events locally, sort by (t, event_id),
    // fold the trailing-8 window literally
    val ev = graft.Tables.events(spark, sf)
      .filter(col("user_id") % 50 === 0)
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    var checked = 0
    byUser.foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.indices.foreach { i =>
        val frame = sorted.slice(math.max(0, i - 7), i + 1).reverse // newest first
        val num = frame.zipWithIndex.map { case (r, j) => r._4 * (1L << (7 - j)) }.sum
        val denom = 256L - (256L >> frame.length)
        val want = num.toDouble / denom.toDouble / 100
        val key = (sorted(i)._1, sorted(i)._2)
        assert(got(key) == want, s"event $key: ${got(key)} != $want")
        checked += 1
      }
    }
    assert(checked == got.size)
  }

  test("q64 rides ONE window pass (8 lags share a frame)") {
    val p = graft.QueryCatalog.byName("q64_ewma").run(spark, sf)
      .queryExecution.executedPlan.toString
    val windows = "(?m)^\\s*[+:\\-\\s]*Window ".r.findAllIn(p).size
    assert(windows == 1, s"expected 1 WindowExec, got $windows:\n$p")
  }

  test("q65 equals the brute-force trailing-24h distinct per hour") {
    val got = graft.QueryCatalog.byName("q65_sliding_distinct").run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    val uh = graft.Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 3600000000000").as("h"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val hmax = uh.map(_._2).max
    // brute force: for every hour with a window row, distinct users in range
    got.foreach { case (h, reach) =>
      assert(h <= hmax)
      val want = uh.filter(p => p._2 >= h - 23 && p._2 <= h).map(_._1).distinct.length
      assert(reach == want, s"hour $h: $reach != $want")
    }
    // completeness: every hour covered by some trailing window is present
    val expectHours = uh.flatMap(p => p._2 to math.min(p._2 + 23, hmax)).distinct
    assert(got.keySet == expectHours.toSet)
  }

  test("q67 rolling median equals the driver-side sort of each trailing frame") {
    val got = graft.QueryCatalog.byName("q67_rolling_median").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got.nonEmpty)
    val ev = graft.Tables.events(spark, sf)
      .filter(col("user_id") % 50 === 0)
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    var checked = 0
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.indices.foreach { i =>
        val frame = sorted.slice(math.max(0, i - 4), i + 1).map(_._4).sorted
        val n = frame.length
        val want =
          if (n % 2 == 1) frame((n + 1) / 2 - 1).toDouble / 100
          else (frame(n / 2 - 1).toDouble + frame(n / 2).toDouble) / 2 / 100
        val key = (sorted(i)._1, sorted(i)._2)
        assert(got(key) == want, s"event $key: ${got(key)} != $want")
        checked += 1
      }
    }
    assert(checked == got.size)
  }

  test("q67 rides ONE window pass") {
    val p = graft.QueryCatalog.byName("q67_rolling_median").run(spark, sf)
      .queryExecution.executedPlan.toString
    val windows = "(?m)^\\s*[+:\\-\\s]*Window ".r.findAllIn(p).size
    assert(windows == 1, s"expected 1 WindowExec, got $windows:\n$p")
  }

  test("q68: sketch union is lossless (merged per-day == one-pass sketch); gate true") {
    val rows = graft.QueryCatalog.byName("q68_hll_mergeable").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("approx_ok"),
      s"${r.getString(0)}: sketch estimate outside 5% of exact"))
    // the mergeability CLAIM itself: unioning the per-day sketches gives
    // the SAME estimate as one sketch over the whole stream (HLL union at
    // equal lgk is register-wise lossless)
    val e = graft.Tables.events(spark, sf).select(
      col("event_type"), expr("ts div 86400000000000").as("day"), col("user_id"))
    val merged = e.groupBy("event_type", "day")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("m"))
    val direct = e.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("d"))
    val cmp = merged.join(direct, "event_type").collect()
    cmp.foreach { r =>
      assert(r.getAs[Long]("m") == r.getAs[Long]("d"),
        s"${r.getString(0)}: merged ${r.get(1)} != direct ${r.get(2)}")
    }
  }

  test("q70: exact side equals q65; every window's sketch estimate inside 5%") {
    val q70 = graft.QueryCatalog.byName("q70_sliding_reach_hll").run(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getAs[Boolean](2)))).toMap
    val q65 = graft.QueryCatalog.byName("q65_sliding_distinct").run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q70.keySet == q65.keySet)
    q70.foreach { case (h, (exact, ok)) =>
      assert(exact == q65(h), s"hour $h exact side diverged from q65")
      assert(ok, s"hour $h sketch estimate outside 5%")
    }
  }

  test("q71 CUSUM equals a driver-side recursion and is partition-independent") {
    val got = graft.QueryCatalog.byName("q71_cusum_alarms").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // driver-side recursion with reset, same parameters
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      var s = 0L
      rows.sortBy(r => (r._3, r._2)).flatMap { r =>
        val pre = math.max(0L, s + r._4 - 5000L)
        val alarm = pre > 50000L
        s = if (alarm) 0L else pre
        if (alarm) Some((u, r._2, pre)) else None
      }
    }
    assert(got.toSet == want.toSet && got.nonEmpty)
    // the fold must not depend on physical partitioning: the operator
    // repartitions by user itself, so a skewed input changes nothing
    val again = graft.QueryCatalog.byName("q71_cusum_alarms")
      .run(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(again.toSet == got.toSet)
  }

  test("q72: merged per-day CMS estimates equal the one-pass sketch; never undercounts") {
    import org.apache.spark.util.sketch.CountMinSketch
    val rows = graft.QueryCatalog.byName("q72_cms_mergeable").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("cms_ok"), r.toString))
    val e = graft.Tables.events(spark, sf)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"))
    def sk(df: org.apache.spark.sql.DataFrame): CountMinSketch =
      df.collect().map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]](0)))
        .reduceLeft { (a, b) => a.mergeInPlace(b); a }
    val merged = sk(e.groupBy("day")
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk"))
      .select("sk"))
    val onePass = sk(e.agg(
      expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk")))
    val types = rows.map(_.getString(0))
    types.foreach { t =>
      val b = t.getBytes("UTF-8")
      assert(merged.estimateCount(b) == onePass.estimateCount(b),
        s"$t: merged CMS diverges from the one-pass sketch")
    }
  }

  test("q73: merged partials equal the full recompute (q22) cell-for-cell") {
    val got = graft.QueryCatalog.byName("q73_incremental_rollup").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val full = graft.QueryCatalog.byName("q22_hourly_rollup").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == full.keySet)
    got.foreach { case (k, (n, s, parts)) =>
      assert(full(k) == ((n, s)), s"cell $k diverged from full recompute")
      assert(parts == 1L || parts == 2L)
    }
    assert(got.values.exists(_._3 == 1L))

    // the fixture's cut hour is sparse (no cell straddles the instant),
    // so prove the 2-partial merge on a handcrafted store: four events,
    // one hour, one type, two on each side of the (min+max)/2 midpoint
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "q73-mini")
    val hour0 = 400000L * 3600000000000L
    Seq(
      (1L, hour0 + 1L, 10L, "click", 10.0, "{}"),
      (2L, hour0 + 2L, 10L, "click", 20.0, "{}"),
      (3L, hour0 + 3000000000000L, 11L, "click", 30.0, "{}"),
      (4L, hour0 + 3100000000000L, 11L, "click", 40.0, "{}"))
      .toDF("event_id", "rawns", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(rawns div 1000)")).drop("rawns")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val mini = graft.QueryCatalog.byName("q73_incremental_rollup")
      .run(spark, dir.toString).collect()
    assert(mini.length == 1)
    assert(mini.head.getLong(2) == 4L && mini.head.getDouble(3) == 100.0)
    assert(mini.head.getLong(4) == 2L,
      "the straddling cell must merge exactly two partials")
  }

  test("q74 CUPED: pooled mean preserved; real variance reduction on a correlated store") {
    // identity: the pooled (user-weighted) adjusted mean equals the raw
    // pooled mean — θ·Σ(x − x̄) telescopes to zero across all users
    val rows = graft.QueryCatalog.byName("q74_cuped").run(spark, sf).collect()
    assert(rows.length == 2)
    val pooledRaw = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    val pooledAdj = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(pooledRaw - pooledAdj) < 1e-6 * math.abs(pooledRaw),
      s"adjustment moved the pooled mean: $pooledRaw -> $pooledAdj")

    // constructed store: post ≈ pre per user (corr ≈ 1) ⇒ CUPED must
    // collapse the variance; the flat fixture above shows ratio ≈ 1
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "cuped-mini")
    val hour = 3600000000000L
    val base = 400000L * hour
    val evs = (0 until 60).flatMap { u =>
      val v = 50.0 + (u % 17) * 20.0 // per-user level, varied
      Seq(
        (2L * u, base + u * 1000L, u.toLong, "view", v, "{}"),
        (2L * u + 1, base + 700 * hour + u * 1000L, u.toLong, "view",
          v + (u % 3) * 1.0, "{}")) // post = pre + tiny noise
    }
    evs.toDF("event_id", "rawns", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(rawns div 1000)")).drop("rawns")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val mini = graft.QueryCatalog.byName("q74_cuped").run(spark, dir.toString)
      .collect()
    mini.foreach { r =>
      val vr = r.getDouble(4)
      assert(vr < 0.05,
        s"arm ${r.get(0)}: correlated store must collapse variance, got $vr")
    }
  }

  test("q66 buckets tile the corpus: counts sum to |events|, buckets in [0,19]") {
    val rows = graft.QueryCatalog.byName("q66_histogram").run(spark, sf).collect()
    val total = graft.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 19)
    }
    // per-type sums reconcile with the direct per-type aggregate
    val byType = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getAs[Long]("n")).sum)
    val want = graft.Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.toMap == want)
  }

  test("q61 dense-hour semantics: carried-in level survives a −1-only " +
      "hour, and delta-free hours inside open sessions emit the held level") {
    import spark.implicits._
    val m = 60L * 1000000000L // one minute in ns
    // user 10: one session spanning hours 0..3 (events every 20 min)
    val u10 = (0L to 180L by 20L).map(t => (10L, t * m))
    // user 20: session [h0+5min, h1+5min] — its end is hour 1's only
    //          delta alongside nothing else raising the level there
    val u20 = (5L to 65L by 20L).map(t => (20L, t * m))
    // user 30: point session inside hour 0
    val u30 = Seq((30L, 10L * m))
    val rows = (u10 ++ u20 ++ u30).zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, t, u, "e", 0.0)
    }
    val dir = java.nio.file.Files.createTempDirectory("q61dense").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeSeries.concurrency.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // hour 0: +1,+1,+1,−1 → peak 3; hour 1: carried 2, only a −1 → the
    // carried-in level is the max (delta-point form would say 1); hour 2:
    // NO deltas, held level 1 (delta-point form emits no row); hour 3:
    // carried 1, the spanning session ends → 1
    assert(got == Map(0L -> 3L, 1L -> 2L, 2L -> 1L, 3L -> 1L))
  }
}
