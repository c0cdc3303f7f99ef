package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("decodeStub: per-partition decode is deterministic and complete") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val feats = Multimodal.decodeStub(media)
    assert(feats.count() == media.count())
    val row = feats.filter(col("media_id") === 0).collect().head
    // histogram is normalized: 8 buckets summing to ~1
    assert(row.features.length == 8)
    assert(math.abs(row.features.sum - 1f) < 1e-4)
    // partitioning-independent
    val repart = Multimodal.decodeStub(media.repartition(7))
      .filter(col("media_id") === 0).collect().head
    assert(repart.features.toSeq == row.features.toSeq)
    assert(repart.n_bytes == row.n_bytes && repart.header == row.header)
  }

  test("frameSample: offsets step through the payload, nothing collected") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val frames = Multimodal.frameSample(media, step = 64)
    val one = frames.filter(col("media_id") === 0)
      .orderBy("frame_idx").collect()
    val nBytes = media.filter(col("media_id") === 0)
      .select(octet_length(col("content"))).collect().head.getInt(0)
    assert(one.head.getAs[Int]("byte_offset") == 0)
    assert(one.map(_.getAs[Int]("byte_offset")).toSeq ==
      (0 until nBytes by 64).toSeq)
    // every media row contributes at least one frame
    assert(frames.select("media_id").distinct().count() == media.count())
  }

  test("decodeImage: committed fixture PNG decodes to the independent " +
      "encoder's pixel law") {
    import spark.implicits._
    // gradient.png is written by tools/make_png_fixture.py — a pure-python
    // zlib PNG encoder, NOT ImageIO — so this decode is verified against an
    // independent implementation (values printed by the generator).
    val bytes = {
      val in = getClass.getResourceAsStream("/graft/gradient.png")
      try in.readAllBytes() finally in.close()
    }
    val feats = Multimodal.decodeImage(
      Seq(Multimodal.MediaRow(7L, "image", bytes)).toDS()).collect().head
    assert(feats.width == 16)
    assert(feats.height == 9)
    assert(feats.pixel_sum == 43344L)
    assert(feats.n_bytes == bytes.length.toLong)
  }

  test("decodeImage: synthetic PNG round-trip matches the closed form, " +
      "partition-independent") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 63L, 64L, 97L, 100L, 12345L)
    val media = ids.toDS().repartition(3)
      .map(id => Multimodal.MediaRow(id, "image", Multimodal.syntheticPng(id)))
    val got = Multimodal.decodeImage(media).collect()
      .map(f => f.media_id -> ((f.width, f.height, f.pixel_sum))).toMap
    ids.foreach { id =>
      val w = 1 + (id % 64).toInt; val h = 1 + (id % 48).toInt
      val c = (id % 100).toInt
      val expect = 3L * h * (w.toLong * c + w.toLong * (w - 1) / 2)
      assert(got(id) == ((w, h, expect)), s"id=$id")
    }
    // non-image bytes fail loudly, not as zeroed features
    val bad = Seq(Multimodal.MediaRow(1L, "image", Array[Byte](1, 2, 3))).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImage(bad).collect()
    }
    assert(ex.getMessage.contains("not a decodable image") ||
      Option(ex.getCause).exists(_.getMessage.contains("not a decodable image")))
  }

  test("decodeWav: committed fixture WAV decodes to the independent " +
      "encoder's sample law") {
    import spark.implicits._
    // tone.wav is written by tools/make_wav_fixture.py — python's stdlib
    // `wave` RIFF encoder, NOT javax.sound — so this decode is verified
    // against an independent implementation (values printed by the
    // generator; its sample law differs from m05's on purpose).
    val bytes = {
      val in = getClass.getResourceAsStream("/graft/tone.wav")
      try in.readAllBytes() finally in.close()
    }
    val f = Multimodal.decodeWav(
      Seq(Multimodal.MediaRow(3L, "audio", bytes)).toDS()).collect().head
    assert(f.n_samples == 400L)
    assert(f.sample_sum == -1168522L)
    assert(f.energy == 151320494624L)
    assert(f.peak == 32760L)
  }

  test("decodeWav: synthetic WAV round-trip matches the integer law, " +
      "partition-independent; junk fails loudly") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 255L, 256L, 777L)
    val media = ids.toDS().repartition(3)
      .map(id => Multimodal.MediaRow(id, "audio", Multimodal.syntheticWav(id)))
    val got = Multimodal.decodeWav(media).collect()
      .map(f => f.media_id -> ((f.n_samples, f.sample_sum, f.energy, f.peak)))
      .toMap
    ids.foreach { id =>
      val n = 256 + (id % 256).toInt
      val xs = (0 until n).map(i => ((i * 7919L + id * 104729L) % 65536L) - 32768L)
      val expect = (n.toLong, xs.sum, xs.map(x => x * x).sum, xs.map(math.abs).max)
      assert(got(id) == expect, s"id=$id")
    }
    val bad = Seq(Multimodal.MediaRow(9L, "audio", Array[Byte](1, 2, 3))).toDS()
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWav(bad).collect()
    }
  }

  test("openAudio: decodes byte-identically to AudioSystem on fixture and " +
      "synthetic clips; junk still raises UnsupportedAudioFileException") {
    // openAudio replaces AudioSystem.getAudioInputStream (which re-runs a
    // globally synchronized provider scan per call) with a once-loaded
    // provider list — the decode itself must be THE SAME codec's output.
    val fixture = {
      val in = getClass.getResourceAsStream("/graft/tone.wav")
      try in.readAllBytes() finally in.close()
    }
    val clips = fixture +: Seq(0L, 1L, 255L, 777L).map(Multimodal.syntheticWav)
    clips.foreach { bytes =>
      val viaSystem = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val viaOpen = Multimodal.openAudio(bytes)
      assert(viaOpen.getFormat.toString == viaSystem.getFormat.toString)
      assert(viaOpen.readAllBytes().toSeq == viaSystem.readAllBytes().toSeq)
    }
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      Multimodal.openAudio(Array[Byte](1, 2, 3))
    }
  }

  test("wavFrames: frame features partition the clip exactly (energies " +
      "sum to the whole-clip energy; zc law on a sign-alternating frame)") {
    import spark.implicits._
    val ids = Seq(0L, 255L, 256L, 777L)
    val media = ids.toDS().repartition(3)
      .map(id => Multimodal.MediaRow(id, "audio", Multimodal.syntheticWav(id)))
    val frames = Multimodal.wavFrames(media).collect()
    val whole = Multimodal.decodeWav(media).collect()
      .map(f => f.media_id -> f.energy).toMap
    ids.foreach { id =>
      val fs = frames.filter(_.media_id == id)
      assert(fs.map(_.n_in_frame).sum == 256 + (id % 256),
        s"id=$id frames must cover the clip exactly once")
      assert(fs.map(_.energy).sum == whole(id),
        s"id=$id frame energies must sum to the clip energy")
      // per-frame zc law against the sample formula (within-frame pairs)
      val n = (256 + (id % 256)).toInt
      val xs = (0 until n).map(i => ((i * 7919L + id * 104729L) % 65536L) - 32768L)
      fs.foreach { fr =>
        val from = fr.frame_idx * 256
        val until = math.min(from + 256, n)
        val zc = (from + 1 until until).count(i => xs(i - 1) * xs(i) < 0)
        assert(fr.zero_crossings == zc, s"id=$id frame=${fr.frame_idx}")
      }
    }
  }

  test("resizeStub: strided downsample preserves schema and determinism") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val small = Multimodal.resizeStub(media, factor = 4)
    assert(small.count() == media.count())
    val orig = media.filter(col("media_id") === 1).collect().head
    val shrunk = small.filter(col("media_id") === 1).collect().head
    assert(shrunk.content.length == (orig.content.length + 3) / 4)
    assert(shrunk.content.toSeq ==
      orig.content.indices.collect { case i if i % 4 == 0 => orig.content(i) }.toSeq)
    // decode composes downstream of resize
    val feats = Multimodal.decodeStub(small)
    assert(feats.count() == media.count())
  }

  test("resizeImage: identity-size resample reproduces the full decode sum") {
    import spark.implicits._
    val ids = Seq(5L, 64L, 131L)
    val media = ids.toDS()
      .map(id => Multimodal.MediaRow(id, "image", Multimodal.syntheticPng(id)))
    val full = Multimodal.decodeImage(media).collect()
      .map(f => f.media_id -> f.pixel_sum).toMap
    ids.foreach { id =>
      val w = 1 + (id % 64).toInt
      val h = 1 + (id % 48).toInt
      val same = Multimodal.resizeImage(
        media.filter(_.media_id == id), w, h).collect().head
      assert(same.pixel_sum == full(id),
        s"identity resize must equal decode for id=$id")
      assert((same.src_w, same.src_h, same.out_w, same.out_h) == (w, h, w, h))
    }
  }

  test("resizeImage: nearest-neighbor law on the committed gradient fixture") {
    import spark.implicits._
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/graft/gradient.png").toURI))
    val media = Seq(Multimodal.MediaRow(42L, "image", bytes)).toDS()
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (w, h, outW, outH) = (img.getWidth, img.getHeight, 8, 6)
    var expect = 0L
    for (y <- 0 until outH; x <- 0 until outW) {
      val rgb = img.getRGB(x * w / outW, y * h / outH)
      expect += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
    }
    val got = Multimodal.resizeImage(media, outW, outH).collect().head
    assert(got.pixel_sum == expect && got.src_w == w && got.src_h == h)
  }

  test("decodeImage is codec-agnostic: JPEG bytes ride the same pipeline") {
    import spark.implicits._
    // transcode the committed PNG fixture to JPEG with the JDK encoder;
    // the decode operator must handle it UNCHANGED (ImageIO sniffs the
    // container), with exact dimensions and lossy-but-bounded pixels
    val png = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/graft/gradient.png").toURI))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    // JPEG has no alpha: render onto an RGB canvas first
    val rgb = new java.awt.image.BufferedImage(
      img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    rgb.createGraphics().drawImage(img, 0, 0, null)
    assert(javax.imageio.ImageIO.write(rgb, "jpg", bos), "JDK must encode JPEG")
    val jpeg = bos.toByteArray

    val media = Seq(
      Multimodal.MediaRow(1L, "image", png),
      Multimodal.MediaRow(2L, "image", jpeg)).toDS()
    val feats = Multimodal.decodeImage(media).collect()
      .map(f => f.media_id -> f).toMap
    val (p, j) = (feats(1L), feats(2L))
    assert(j.width == p.width && j.height == p.height,
      "lossy compression must not change dimensions")
    // per-channel-pixel mean drift under default-quality JPEG stays small
    val perSample = math.abs(j.pixel_sum - p.pixel_sum).toDouble /
      (3.0 * p.width * p.height)
    assert(perSample < 3.0,
      s"JPEG round-trip drifted $perSample per channel-sample")
  }

  test("aHash is brightness-invariant and pattern-discriminating through the real codec") {
    import spark.implicits._
    // same pattern class p, three different brightness offsets → one hash;
    // different p → different hash (for these classes)
    val ids = Seq(3L, 19L, 35L, /* p=3 with c=3,19,35 */ 4L /* p=4 */)
    val media = ids.map(id =>
      Multimodal.MediaRow(id, "image", Multimodal.syntheticPatternPng(id))).toDS()
    val h = Multimodal.aHash(media).collect()
      .map(r => r.media_id -> (r.phash_hi, r.phash_lo)).toMap
    assert(h(3L) == h(19L) && h(19L) == h(35L),
      "uniform brightness shift changed the aHash")
    assert(h(3L) != h(4L), "distinct patterns collided")
    // halves are unsigned 32-bit
    h.values.foreach { case (hi, lo) =>
      assert(hi >= 0 && hi <= 0xffffffffL && lo >= 0 && lo <= 0xffffffffL)
    }
  }

  test("audioFingerprint is gain-invariant and pattern-discriminating through the real codec") {
    import spark.implicits._
    // ids 2, 9, 114 share pattern p=2 at gains a=3, 3... pick ids with
    // same p different a: p = id%16, a = 1+id%7. id 2 -> (p2,a3),
    // id 18 -> (p2,a5), id 34 -> (p2,a0+1=6+... 34%7=6 -> a7)
    val samePattern = Seq(2L, 18L, 34L)
    val other = 3L // p=3
    val media = (samePattern :+ other).map(id =>
      Multimodal.MediaRow(id, "audio", Multimodal.syntheticPatternWav(id))).toDS()
    val fp = Multimodal.audioFingerprint(media).collect()
      .map(r => r.media_id -> r.fp).toMap
    assert(fp(2L) == fp(18L) && fp(18L) == fp(34L),
      "uniform gain changed the audio fingerprint")
    assert(fp(2L) != fp(other), "distinct patterns collided")
    fp.values.foreach(v => assert(v >= 0 && v <= 127))
  }

  test("m08 groups span multiple distinct brightness levels (the near-dup signal)") {
    val rows = graft.QueryCatalog.byName("m08_phash_dedup").run(spark, sfDir).collect()
    val total = graft.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_images")).sum == total)
    // at least one group holds >1 image (sf0.001 has >16 docs), and the
    // collapse is perceptual, not exact: grouped ids differ in brightness
    assert(rows.exists(_.getAs[Long]("n_images") > 1))
  }
}
