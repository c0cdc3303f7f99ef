package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics for p19 (group-aware k-fold), t19 (vocabulary profile) and
  * d22 (URL-canonical dedup), plus unit pins for every clause of the
  * [[Urls.canonicalizeUrl]] contract on handcrafted URLs.
  */
class UrlsKfoldSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("p19 folds partition the corpus; zero leaked sources; fold is a pure function of source") {
    val rows = graft.QueryCatalog.byName("p19_kfold").run(spark, sf).collect()
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("leak_sources") == 0L,
        s"fold ${r.get(0)} reports leaked sources")
      val f = r.getAs[Long]("fold")
      assert(f >= 0 && f < 5)
    }
    // independent recomputation: fold(source) via the same 48-bit hash
    val bySource = graft.Tables.documents(spark, sf)
      .select(col("source"),
        (conv(substring(md5(col("source")), 1, 12), 16, 10).cast("long")
          % 5).as("fold"))
      .distinct().collect().map(r => r.getString(0) -> r.getLong(1))
    assert(bySource.map(_._1).distinct.length == bySource.length,
      "a source maps to more than one fold")
  }

  test("t19 vocabulary profile equals a driver-side tokenization") {
    val got = graft.QueryCatalog.byName("t19_vocab_zipf").run(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.nonEmpty)
    val docs = graft.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (lang, rows) =>
      val words = rows.flatMap(r => "[a-z]+".r.findAllIn(r._2))
      val counts = words.groupBy(identity).view.mapValues(_.size)
      val r = got(lang)
      assert(r.getAs[Long]("n_tokens") == words.length.toLong)
      assert(r.getAs[Long]("n_types") == counts.size.toLong)
      assert(r.getAs[Long]("n_hapax") == counts.count(_._2 == 1).toLong)
      assert(r.getAs[Long]("top_freq") == counts.values.max.toLong)
      assert(r.getAs[Double]("ttr") ==
        counts.size.toDouble / words.length.toDouble)
    }
  }

  test("canonicalizeUrl: each contract clause, on handcrafted URLs") {
    import spark.implicits._
    val cases = Seq(
      // case + www + default port + fragment + param sort + tracking strip
      ("HTTPS://WWW.Site.ORG:443/A/B/?z=1&a=2&utm_campaign=c#frag",
        "https://site.org/A/B?a=2&z=1"),
      // non-default port preserved; path case preserved
      ("http://site.org:8080/Path/", "http://site.org:8080/Path"),
      // ONLY the scheme's own default port strips: http on :443 and
      // https on :80 are different resources and must survive
      ("http://site.org:443/p", "http://site.org:443/p"),
      ("https://site.org:80/p", "https://site.org:80/p"),
      ("http://site.org:80/p", "http://site.org/p"),
      // empty query: '?' dropped; bare host: no trailing slash to strip
      ("http://Site.org?", "http://site.org"),
      // fbclid/gclid stripped, legit params kept in byte order
      ("http://a.b/p?gclid=g&b=2&fbclid=f&a=1", "http://a.b/p?a=1&b=2"),
      // utm prefix must match utm_ exactly: 'utmx' survives
      ("http://a.b/p?utmx=1", "http://a.b/p?utmx=1"),
      // multiple trailing slashes collapse away
      ("http://a.b/p///", "http://a.b/p"))
    val got = cases.map(_._1).toDF("url")
      .select(Urls.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalizeUrl($in) = $g, want $want")
    }
  }

  test("canonicalizeUrl is IDEMPOTENT on generated URLs (fixed-seed property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // generator over the canonicalizer's whole input surface: mixed-case
    // schemes/hosts, optional www., ports, messy param lists (tracking
    // and legit, duplicated, empty), trailing slashes, fragments
    val genUrl: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "Https")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("Example.COM", "a.b.c", "SITE.org")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      segs <- Gen.choose(0, 3)
      path <- Gen.listOfN(segs, Gen.oneOf("A", "b", "c9")).map(
        l => if (l.isEmpty) "" else l.mkString("/", "/", ""))
      slashes <- Gen.oneOf("", "/", "//")
      params <- Gen.someOf("a=1", "b=2", "z=9", "utm_source=x",
        "utm_medium=y", "fbclid=f", "gclid=g", "")
      frag <- Gen.oneOf("", "#x", "#frag-2")
    } yield {
      val qs = if (params.isEmpty) "" else params.mkString("?", "&", "")
      s"$scheme://$www$host$port$path$slashes$qs$frag"
    }
    val params = Gen.Parameters.default
    val urls = (0 until 300).flatMap(i =>
      genUrl.apply(params, Seed(i.toLong))).distinct
    assert(urls.size > 200)
    val twice = urls.toDF("url")
      .select(col("url"), Urls.canonicalizeUrl(col("url")).as("c1"))
      .select(col("url"), col("c1"), Urls.canonicalizeUrl(col("c1")).as("c2"))
      .collect()
    twice.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"not idempotent on ${r.getString(0)}: ${r.getString(1)} -> ${r.getString(2)}")
    }
  }

  test("d23 ensemble clusters equal a driver-side union-find over both lanes") {
    val got = graft.QueryCatalog.byName("d23_ensemble_dedup").run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // driver union-find: same-URL-group (doc_id div 4 — the synthetic
    // surface's canonical identity) OR byte-identical text
    val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    docs.groupBy(_._1 / 4).values.foreach { g =>
      g.map(_._1).toSeq.sliding(2).foreach {
        case Seq(a, b) => union(a, b); case _ => ()
      }
    }
    docs.groupBy(_._2).values.foreach { g =>
      g.map(_._1).toSeq.sliding(2).foreach {
        case Seq(a, b) => union(a, b); case _ => ()
      }
    }
    val want = docs.map(d => d._1 -> find(d._1)).toMap
    assert(got == want)
    // the ensemble is strictly coarser than the URL lane alone iff any
    // text dup crosses a URL group — report either way, assert coherence
    val crossLane = docs.groupBy(_._2).values.exists(g =>
      g.map(_._1 / 4).distinct.size > 1)
    if (crossLane)
      assert(got.values.toSet.size < docs.map(_._1 / 4).distinct.size,
        "cross-lane text dup must merge URL groups")
  }

  test("d22: groups collapse all four surface variants; keep is min doc_id") {
    val rows = graft.QueryCatalog.byName("d22_url_canonical").run(spark, sf)
      .collect()
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_dups")).sum == total)
    rows.foreach { r =>
      val canon = r.getString(0)
      assert(canon.matches("^http://example\\.com/docs/\\d+\\?a=1&b=2$"),
        s"unexpected canonical form $canon")
      // every surface form in a group is distinct
      assert(r.getAs[Long]("n_surface_forms") == r.getAs[Long]("n_dups"))
      // keep_doc belongs to the group: doc_id div 4 == page in the path
      val page = canon.replaceAll("^.*/docs/", "").replaceAll("\\?.*$", "").toLong
      assert(r.getAs[Long]("keep_doc") / 4 == page)
    }
  }
}
