package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SamplingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def docs = graft.Tables.documents(spark, sfDir)

  test("hashSample is deterministic and partitioning-independent") {
    val once = Sampling.hashSample(docs, col("doc_id"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Sampling.hashSample(docs.repartition(13), col("doc_id"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again, "same sample regardless of run or partitioning")
    val n = docs.count().toDouble
    assert(math.abs(once.size / n - 0.25) < 0.15, s"~25% kept, got ${once.size / n}")
  }

  test("stratifiedSample: full default rate keeps every unlisted stratum") {
    val kept = Sampling.stratifiedSample(
      docs, col("lang"), col("doc_id"), Map("en" -> 0.0))
    assert(kept.filter(col("lang") === "en").count() == 0)
    assert(kept.count() == docs.filter(col("lang") =!= "en").count())
  }

  test("split: total partition, consistent with thresholds, stable") {
    val s = Sampling.split(docs, col("doc_id"), train = 0.8, validation = 0.1)
    assert(s.count() == docs.count())
    val byLabel = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    val n = docs.count().toDouble
    assert(byLabel("train") / n > 0.7 && byLabel("train") / n < 0.9)
    // a doc keeps its split when the corpus around it changes
    val subset = Sampling.split(docs.filter(col("doc_id") % 2 === 0),
      col("doc_id"), train = 0.8, validation = 0.1)
    val full = s.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.select("doc_id", "split").collect().foreach { r =>
      assert(full(r.getLong(0)) == r.getString(1))
    }
  }

  test("hashSample nesting: a smaller fraction's sample is a subset of a larger's") {
    // threshold sampling's defining contract — growing the rate only ADDS
    // rows (so a pipeline can raise its sampling rate without churning
    // previously selected data). Checked across the whole fraction grid.
    val fractions = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val samples = fractions.map { f =>
      f -> Sampling.hashSample(docs, col("doc_id"), f)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    samples.sliding(2).foreach { case Seq((f1, s1), (f2, s2)) =>
      assert(s1.subsetOf(s2), s"sample($f1) must nest inside sample($f2)")
    }
    // rate endpoints
    assert(Sampling.hashSample(docs, col("doc_id"), 0.0).count() == 0)
    assert(Sampling.hashSample(docs, col("doc_id"), 1.0).count() == docs.count())
  }

  test("shuffleShards: total coverage, uniform-ish, partitioning-independent") {
    val n = docs.count()
    val sharded = Sampling.shuffleShards(docs, col("doc_id"), 8)
    assert(sharded.count() == n, "sharding never drops or duplicates rows")
    val counts = sharded.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0L until 8L).toSet, "every shard populated")
    val mean = n.toDouble / 8
    counts.values.foreach(c =>
      assert(math.abs(c - mean) < mean, s"shard count $c far from uniform $mean"))
    // assignment is a pure key function: identical under repartitioning
    val a = sharded.select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sampling.shuffleShards(docs.repartition(13), col("doc_id"), 8)
      .select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // order decorrelates from ingest order: within a shard, consecutive
    // sort_keys come from unrelated doc_ids (weak check: the per-shard
    // doc_id sequence ordered by sort_key is not monotonic)
    val shard0 = sharded.filter(col("shard") === 0)
      .orderBy("sort_key").select("doc_id").collect().map(_.getLong(0))
    assert(shard0.length > 3)
    assert(!shard0.sliding(2).forall { case Array(x, y) => x < y },
      "shuffled order must not reproduce ingest order")
  }

  test("writeTrainingShards lays out one deterministic directory per shard") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "shards").toString
    Sampling.writeTrainingShards(docs, col("doc_id"), 4, dir)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.toSeq == Seq("shard=0", "shard=1", "shard=2", "shard=3"))
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    // the same write is byte-stable in content: re-read ids per shard match
    // a recomputed assignment
    val expected = Sampling.shuffleShards(docs, col("doc_id"), 4)
      .groupBy("shard").agg(sum(col("doc_id")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = back.groupBy("shard").agg(sum(col("doc_id")).as("s")).collect()
      .map(r => r.getAs[Number]("shard").longValue() -> r.getLong(1)).toMap
    assert(got == expected)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("weightedSystematic two-level prefix sum equals the naive global window") {
    import spark.implicits._
    // sparse keys spanning many bins, adversarial weights (zeros, heavy)
    val rows = (0 until 4000).map { i =>
      val key = i.toLong * 7919 % 50000 * 1048576L / 37 // scattered across bins
      (key, (i * i % 97).toLong)
    }.groupBy(_._1).valuesIterator.map(_.head).toSeq // unique keys
    val df = rows.toDF("k", "w")
    val step = 113L
    val naive = df
      .withColumn("cum0",
        sum(col("w")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("k"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("cum0", coalesce(col("cum0"), lit(0L)) + lit(step))
      .filter(expr(s"(cum0 + w - 1) div $step > (cum0 - 1) div $step"))
      .select("k").as[Long].collect().toSet
    val fast = Sampling.weightedSystematic(df, col("k"), col("w"), lit(step))
      .select("k").as[Long].collect().toSet
    assert(fast == naive, "two-level prefix-sum selection == global-window selection")
    assert(fast.nonEmpty)
    // partitioning-independence: the selection is a pure data function
    val repart = Sampling
      .weightedSystematic(df.repartition(17), col("k"), col("w"), lit(step))
      .select("k").as[Long].collect().toSet
    assert(repart == fast)
    // weight mass between consecutive selections is ~step: total selected
    // count equals ceil(total/step) bounds
    val total = rows.map(_._2).sum
    assert(math.abs(fast.size - total / step.toDouble) <= 1)
  }

  test("weightedSystematic selects heavy rows with certainty when w >= step") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 300L), (3L, 4L), (4L, 250L), (5L, 1L))
      .toDF("k", "w")
    val sel = Sampling.weightedSystematic(df, col("k"), col("w"), lit(100L))
      .select("k").as[Long].collect().toSet
    assert(Set(2L, 4L).subsetOf(sel), "rows with w >= step always selected")
  }

  test("p16 interleave is proportional: a 2:1 source alternates 2-then-1") {
    import spark.implicits._
    // source A has 10 rows, source B has 5: at equal epoch progress the
    // schedule must emit exactly two A-rows per B-row, every cycle
    val docs = ((0 until 10).map(i => ("A", i.toLong)) ++
      (0 until 5).map(i => ("B", 100L + i))).toDF("source", "doc_id")
    docs.createOrReplaceTempView("p16docs")
    val n = docs.groupBy("source").agg(count(lit(1)).as("ns"))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val order = docs
      .withColumn("j", row_number().over(ws))
      .join(n, "source")
      .withColumn("vtime", col("j").cast("double") / col("ns"))
      .orderBy(col("vtime"), col("source"), col("doc_id"))
      .select("source").collect().map(_.getString(0)).toSeq
    assert(order.size == 15)
    // every epoch-fifth contains 2 A's and 1 B; B never starves
    order.grouped(3).foreach { cycle =>
      assert(cycle.count(_ == "A") == 2 && cycle.count(_ == "B") == 1,
        s"cycle $cycle breaks the 2:1 proportion")
    }
  }
}
