package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * BINARY columns with typed metadata; decode/feature-extraction runs
  * per-partition over the binary batches.
  *
  * IMAGE decode is REAL: [[decodeImage]] runs `javax.imageio` (the JDK's
  * own PNG/BMP/GIF codecs — zero extra dependencies) per-partition over
  * the binary batches, and [[pngAudit]] (m04) oracle-gates it end to end:
  * deterministic PNGs are ImageIO-ENCODED from a closed-form pixel law,
  * ImageIO-DECODED back, and width/height/pixel-checksum must match the
  * SQL closed form. MultimodalSpec additionally decodes a COMMITTED
  * fixture PNG written by an independent encoder (pure-python zlib,
  * `tools/make_png_fixture.py`), so the decode is cross-implementation
  * verified, not self-inverse.
  *
  * AUDIO decode is REAL too: [[decodeWav]] parses RIFF/WAVE through
  * `javax.sound.sampled` (the JDK's own audio file codec), and [[wavAudit]]
  * (m05) oracle-gates it end to end against the sample law's arithmetic;
  * MultimodalSpec additionally decodes a COMMITTED fixture written by an
  * independent encoder (python's stdlib `wave`, `tools/make_wav_fixture.py`).
  *
  * VIDEO decode stays STUBBED (no video codec ships with the JDK or this
  * environment): [[decodeStub]] is a deterministic fake that derives
  * "features" from the bytes. Everything Spark-side is real and tested —
  * the schema, the binary column handling, the mapPartitions batch shape
  * (one iterator per partition, no per-row task overhead, no driver
  * collect), and the frame-sampling explode. Swapping the stub for a real
  * codec is a one-function change, exactly the change [[decodeImage]] and
  * [[decodeWav]] demonstrate for images and audio.
  */
object Multimodal {

  /** One media payload row. `content` is the opaque binary blob. */
  final case class MediaRow(
      media_id: Long,
      kind: String,
      content: Array[Byte])

  /** Fake decoded features: deterministic function of the payload bytes
    * (byte count, a header byte, an 8-bucket byte histogram as the
    * "embedding"). Real decode (JPEG/WAV/MP4) plugs in here.
    */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      header: Int,
      features: Array[Float])

  /** Builds a media table from `documents` (utf-8 bytes as the payload) —
    * the harness ships no binary fixtures, so the documents table stands in
    * as a deterministic byte source.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 3).cast("int").as("k"),
        col("text").cast("binary").as("content"))
      .withColumn("kind",
        element_at(array(lit("image"), lit("audio"), lit("video")), col("k") + 1))
      .select($"media_id", $"kind", $"content").as[MediaRow]
  }

  /** STUB decode: per-partition iterator transform — the production shape
    * for batch codec work (amortizes codec init per partition, streams, no
    * driver materialization). Deterministic fake in place of real decoding.
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: init codec once per partition here
      rows.map { r =>
        val hist = new Array[Float](8)
        var i = 0
        while (i < r.content.length) {
          hist((r.content(i) & 0xff) >> 5) += 1f
          i += 1
        }
        val n = r.content.length.toFloat.max(1f)
        var j = 0
        while (j < 8) { hist(j) /= n; j += 1 }
        MediaFeatures(
          r.media_id, r.kind, r.content.length.toLong,
          if (r.content.nonEmpty) r.content(0) & 0xff else 0, hist)
      }
    }
  }

  /** Frame sampling: one row per sampled frame offset (every `step` bytes
    * stands in for every Nth video frame) — explode of a per-row sequence,
    * fully parallel.
    */
  def frameSample(media: Dataset[MediaRow], step: Int): DataFrame =
    media.toDF().select(col("media_id"), col("kind"),
        posexplode(expr(s"sequence(0, greatest(length(content) - 1, 0), $step)"))
          .as(Seq("frame_idx", "byte_offset")))

  /** STUB resize: shrink each payload to `factor`-strided bytes (stands in
    * for image downscaling / audio resampling). Same per-partition batch
    * shape as [[decodeStub]] — a real scaler replaces only the inner
    * function; the schema (same MediaRow, smaller content) is what
    * downstream stages contract on.
    */
  def resizeStub(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(factor >= 1, s"factor must be >= 1, got $factor")
    media.mapPartitions { rows =>
      // real impl: init scaler/codec once per partition here
      rows.map { r =>
        val out = new Array[Byte]((r.content.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = r.content(i * factor); i += 1 }
        MediaRow(r.media_id, r.kind, out)
      }
    }
  }

  /** Decoded image features from a REAL codec pass: dimensions straight
    * from the decoder and the sum of all RGB channel values (the "pixel
    * checksum" — order-independent, exact integer).
    */
  final case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      n_bytes: Long,
      pixel_sum: Long)

  /** Deterministic synthetic PNG for `id`: `w = 1 + id mod 64`,
    * `h = 1 + id mod 48`, every channel of pixel (x, y) equals
    * `c + x` with `c = id mod 100` (max 99 + 63 < 256, so no modular
    * wrap and the checksum has the closed form
    * `3 h (w c + w (w - 1) / 2)` the m04 oracle states). The bytes are
    * REAL PNGs — ImageIO's encoder, zlib IDAT and all — so the decode
    * side exercises the full codec, not a fake.
    */
  /** ImageIO defaults to `useCache=true`: every encode/decode of a byte
    * stream spools through a TEMP FILE on executor disk — one file create
    * + delete per image, which dominates small-image codec work and ties
    * throughput to local-disk latency. Feature extraction is pure
    * in-memory streaming; disable once per executor JVM (static,
    * idempotent, called from every codec closure so it also holds on a
    * real multi-executor cluster).
    */
  private def imageioInMemory(): Unit =
    if (javax.imageio.ImageIO.getUseCache) javax.imageio.ImageIO.setUseCache(false)

  def syntheticPng(id: Long): Array[Byte] = {
    imageioInMemory()
    val w = 1 + (math.floorMod(id, 64)).toInt
    val h = 1 + (math.floorMod(id, 48)).toInt
    val c = (math.floorMod(id, 100)).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = c + x
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One synthetic PNG payload per document id — the image-table stand-in
    * (the harness ships no binary media fixtures; the documents table
    * provides the id spine). Encoding runs per-partition on executors:
    * the corpus never holds more than one partition's images in memory
    * and the driver never sees a byte.
    */
  def syntheticImages(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.parallel(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map(id => MediaRow(id, "image", syntheticPng(id))))
  }

  /** REAL image decode: `javax.imageio.ImageIO.read` per payload, in the
    * same per-partition batch shape as [[decodeStub]] (codec dispatch is
    * JVM-static, rows stream, nothing driver-side). Null decodes (bytes
    * that are not a decodable image) fail loudly rather than silently
    * zeroing features.
    */
  def decodeImage(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      imageioInMemory()
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(r.content))
        require(img != null,
          s"media_id ${r.media_id}: payload is not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        ImageFeatures(r.media_id, w, h, r.content.length.toLong, sum)
      }
    }
  }

  /** Decoded audio features from a REAL codec pass: sample count straight
    * from the decoder, exact integer sample sum / energy / peak.
    */
  final case class AudioFeatures(
      media_id: Long,
      n_samples: Long,
      sample_sum: Long,
      energy: Long,
      peak: Long)

  /** Deterministic synthetic WAV for `id`: `n = 256 + id mod 256` mono
    * PCM16LE samples at 8 kHz with the integer law
    * `x_i = ((7919 i + 104729 id) mod 65536) - 32768` (full int16 range,
    * no float anywhere). The bytes are REAL RIFF/WAVE files — encoded by
    * `javax.sound.sampled.AudioSystem`, header chunks and all — so the
    * decode side exercises the JDK's actual audio codec, not a fake.
    */
  /** Canonical 44-byte RIFF/WAVE container around mono PCM16LE samples.
    * Byte-for-byte the standard header (what `AudioSystem.write` also
    * emits for this format) — written directly because the generator is
    * per-clip hot on large stores (AudioSystem's stream plumbing costs
    * ~200 µs/clip, ~100 s of the sf10 bench for pure generation); the
    * DECODE side still goes through the real `javax.sound` codec, which
    * is the path under test.
    */
  private def riffWavBytes(pcm: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val n = pcm.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate = sr * block
      .putShort(2).putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(n).put(pcm)
    bb.array()
  }

  def syntheticWav(id: Long): Array[Byte] = {
    val n = 256 + math.floorMod(id, 256L).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val x = ((i * 7919L + id * 104729L) % 65536L).toInt - 32768
      pcm(2 * i) = (x & 0xff).toByte
      pcm(2 * i + 1) = ((x >> 8) & 0xff).toByte
      i += 1
    }
    riffWavBytes(pcm)
  }

  /** One synthetic WAV payload per document id — executor-side encoding,
    * same contract as [[syntheticImages]].
    */
  def syntheticAudio(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.parallel(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map(id => MediaRow(id, "audio", syntheticWav(id))))
  }

  /** The JDK audio-file SPI providers, loaded ONCE per JVM. Every
    * `AudioSystem.getAudioInputStream(stream)` call re-runs the provider
    * lookup through `JDK13Services.getProviders` — a STATIC SYNCHRONIZED
    * service-loader scan that re-walks META-INF/services per call — so
    * concurrently decoding tasks serialize on one JVM-global class lock
    * (r17 JFR on an m09 run: 58–74 s of monitor-blocked time across 32
    * workers, the whole scaling gap of the audio family). The readers
    * themselves are stateless and shareable; loading them once and
    * dispatching directly is the same decode through the same codec,
    * minus the global lock. Guide §4.5 (heavyweight state once per task,
    * here once per JVM).
    */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.toSeq
  }

  /** The reader that accepted the LAST clip, tried first on the next one:
    * a corpus is format-homogeneous in practice, and without this hint
    * every clip pays an `UnsupportedAudioFileException` (constructed per
    * rejecting provider) from each reader ahead of the right one in SPI
    * order — measured +0.15–0.3 s on m05/m07/m09 at sf0.1. Benign race:
    * worst case a thread reads a stale hint and falls through to the scan.
    */
  @volatile private var preferredReader: javax.sound.sampled.spi.AudioFileReader = _

  /** `AudioSystem.getAudioInputStream` minus the per-call provider scan.
    * Each provider sees a fresh in-memory stream and rejects foreign
    * formats with `UnsupportedAudioFileException` (the same contract
    * `AudioSystem` relies on); exactly one JDK reader accepts a given
    * container, so provider order — and the [[preferredReader]] shortcut —
    * cannot change the result.
    */
  private[operators] def openAudio(content: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val pref = preferredReader
    if (pref != null) {
      try return pref.getAudioInputStream(new ByteArrayInputStream(content))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    val it = audioReaders.iterator
    while (it.hasNext) {
      val reader = it.next()
      if (reader ne pref) {
        try {
          val stream = reader.getAudioInputStream(new ByteArrayInputStream(content))
          preferredReader = reader
          return stream
        } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
      }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "Stream of unsupported format")
  }

  /** REAL audio decode: the RIFF container is parsed by the JDK's own
    * `javax.sound.sampled` codec (via [[openAudio]] — same readers
    * `AudioSystem` dispatches to) and features are exact integer
    * aggregates of the decoded int16 samples (energy fits a long:
    * 2^30 per sample × bounded clip length). Non-audio bytes and
    * unexpected formats fail loudly. Same per-partition batch shape as
    * [[decodeImage]].
    */
  def decodeWav(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val ais = openAudio(r.content)
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian && fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"media_id ${r.media_id}: expected mono PCM16LE, got $fmt")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var sum = 0L; var energy = 0L; var peak = 0L
        var i = 0
        while (i < n) {
          val x = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
          sum += x
          energy += x * x
          val a = math.abs(x)
          if (a > peak) peak = a
          i += 1
        }
        AudioFeatures(r.media_id, n.toLong, sum, energy, peak)
      }
    }
  }

  /** One fixed-length analysis frame of a decoded clip. */
  final case class AudioFrame(
      media_id: Long,
      frame_idx: Int,
      n_in_frame: Long,
      energy: Long,
      zero_crossings: Long)

  /** FRAME-level feature extraction over the real WAV decode: the clip is
    * cut into fixed `frameLen`-sample windows (non-overlapping, partial
    * tail kept) and each frame reports exact integer energy (Σx²) and
    * zero crossings (pairs with strictly opposite signs, counted WITHIN
    * the frame — the boundary pair belongs to neither). This is the
    * front half of every audio featurizer (VAD, silence trimming,
    * speech-vs-music heuristics run on exactly these series); downstream
    * models consume the frame table like any other feature column.
    *
    * Scale shape: identical to [[decodeWav]] — per-partition batch
    * decode, one output row per frame, no shuffle until whatever
    * aggregate the caller adds. All-integer features, so the m05
    * discipline holds: the oracle re-derives them arithmetically from
    * the synthetic sample formula, never from another codec run.
    */
  def wavFrames(media: Dataset[MediaRow], frameLen: Int = 256): Dataset[AudioFrame] = {
    import media.sparkSession.implicits._
    require(frameLen > 0, s"frameLen must be positive (got $frameLen)")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val ais = openAudio(r.content)
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian && fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"media_id ${r.media_id}: expected mono PCM16LE, got $fmt")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        def sample(i: Int): Long =
          ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
        (0 until (n + frameLen - 1) / frameLen).map { f =>
          val from = f * frameLen
          val until = math.min(from + frameLen, n)
          var energy = 0L; var zc = 0L
          var i = from
          while (i < until) {
            val x = sample(i)
            energy += x * x
            if (i > from && sample(i - 1) * x < 0) zc += 1
            i += 1
          }
          AudioFrame(r.media_id, f, (until - from).toLong, energy, zc)
        }
      }
    }
  }

  /** m07: the frame-feature audit — [[wavFrames]] over the synthetic
    * clips, pinned to the oracle's closed-form restatement of the same
    * per-frame sums (the m04/m05/m06 discipline).
    */
  val wavFrameAudit: QueryDef = q(
    "m07_wav_frames",
    """WITH v AS (
      |  SELECT doc_id AS media_id, 256 + doc_id % 256 AS n FROM documents),
      |idx AS (SELECT unnest(range(0, 512)) AS i),
      |s AS (
      |  SELECT media_id, n, i,
      |         ((i * 7919 + media_id * 104729) % 65536) - 32768 AS x
      |  FROM v JOIN idx ON idx.i < v.n),
      |p AS (
      |  SELECT media_id, i // 256 AS frame_idx, x,
      |    CASE WHEN i % 256 <> 0
      |          AND x * lag(x) OVER (PARTITION BY media_id ORDER BY i) < 0
      |         THEN 1 ELSE 0 END AS zc
      |  FROM s)
      |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
      |       CAST(count(*) AS BIGINT) AS n_in_frame,
      |       CAST(sum(x * x) AS BIGINT) AS energy,
      |       CAST(sum(zc) AS BIGINT) AS zero_crossings
      |FROM p GROUP BY media_id, frame_idx
      |ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
    wavFrames(syntheticAudio(s, d)).toDF()
      .orderBy("media_id", "frame_idx")
  }

  final case class ResizedFeatures(
      media_id: Long,
      src_w: Int,
      src_h: Int,
      out_w: Int,
      out_h: Int,
      pixel_sum: Long)

  /** REAL image resize: decode with the actual codec, then NEAREST-
    * NEIGHBOR resample to a fixed thumbnail grid — the standard
    * vision-pipeline normalization step before feature extraction.
    * Nearest-neighbor (src = `out·srcDim div outDim`, floor) is chosen
    * deliberately: it is pure integer arithmetic on decoded pixels, so
    * the result is bit-identical on every JVM/platform — bilinear goes
    * through float weights whose rounding is implementation-defined
    * (`Graphics2D` interpolation hints are NOT spec-pinned), which would
    * make the operator untestable against an independent oracle.
    * Same per-partition batch shape as [[decodeImage]]: rows stream,
    * nothing driver-side, executor-local codec state only.
    */
  def resizeImage(
      media: Dataset[MediaRow], outW: Int, outH: Int): Dataset[ResizedFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      imageioInMemory()
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(r.content))
        require(img != null,
          s"media_id ${r.media_id}: payload is not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < outH) {
          val sy = y * h / outH
          var x = 0
          while (x < outW) {
            val rgb = img.getRGB(x * w / outW, sy)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        ResizedFeatures(r.media_id, w, h, outW, outH, sum)
      }
    }
  }

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  /** Binary-column metadata scan: payload size, header byte, chunk count —
    * the catalog-building pass of a multimodal pipeline (oracle-checkable
    * because it never needs the stubbed codec).
    */
  val binaryMeta: QueryDef = q(
    "m01_multimodal_meta",
    """SELECT doc_id AS media_id,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  ascii(substr(text, 1, 1)) AS header,
      |  CAST(ceil(octet_length(CAST(text AS BLOB)) / 256.0) AS BIGINT) AS n_chunks
      |FROM documents
      |ORDER BY media_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      octet_length(col("text").cast("binary")).as("n_bytes"),
      ascii(substring(col("text"), 1, 1)).as("header"),
      ceil(octet_length(col("text").cast("binary")) / 256.0).cast("long")
        .as("n_chunks"))
      .orderBy("media_id")
  }

  /** Decoded-feature aggregate by kind, through the real mapPartitions
    * pipeline ([[mediaFromDocuments]] → [[decodeStub]]). The stub is
    * deterministic integer arithmetic, so it is still oracle-expressible.
    */
  val decodeAgg: QueryDef = q(
    "m02_multimodal_decode",
    """SELECT kind, count(*) AS n_media,
      |  CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
      |  min(ascii(substr(text, 1, 1))) AS min_header,
      |  max(ascii(substr(text, 1, 1))) AS max_header
      |FROM (SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |             WHEN 1 THEN 'audio' ELSE 'video' END AS kind, text
      |      FROM documents)
      |GROUP BY kind
      |ORDER BY kind""".stripMargin) { (s, d) =>
    decodeStub(mediaFromDocuments(s, d)).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("header")).as("min_header"),
        max(col("header")).as("max_header"))
      .orderBy("kind")
  }

  /** m03: the frame-sampling audit — per-video frame counts, offset
    * checksum, and last offset through the REAL posexplode pipeline
    * ([[frameSample]], step 64). The oracle states the closed forms
    * (n = ⌊(len−1)/64⌋+1, Σoffsets = 64·n·(n−1)/2), so the generator's
    * row-local expansion is verified against arithmetic, not another
    * generator.
    */
  val frameAudit: QueryDef = q(
    "m03_frame_sample",
    """WITH v AS (
      |  SELECT doc_id AS media_id,
      |         (greatest(octet_length(CAST(text AS BLOB)) - 1, 0) // 64) + 1 AS n
      |  FROM documents
      |  WHERE CAST(doc_id % 3 AS INT) = 2)
      |SELECT media_id,
      |       CAST(n AS BIGINT) AS n_frames,
      |       CAST(64 * n * (n - 1) / 2 AS BIGINT) AS offset_sum,
      |       CAST(64 * (n - 1) AS BIGINT) AS last_offset
      |FROM v
      |ORDER BY media_id""".stripMargin) { (s, d) =>
    frameSample(mediaFromDocuments(s, d), 64)
      .filter(col("kind") === "video")
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("byte_offset")).cast("long").as("offset_sum"),
        max(col("byte_offset")).cast("long").as("last_offset"))
      .orderBy("media_id")
  }

  /** m04: the REAL-codec audit — every document id becomes a genuine
    * ImageIO-encoded PNG on the executors, [[decodeImage]] decodes it
    * back with the JDK codec, and the oracle pins width/height/checksum
    * to the pixel law's closed form (w = 1 + id%64, h = 1 + id%48,
    * sum = 3·h·(w·c + w(w−1)/2) with c = id%100). Like m03, the
    * round-trip is verified against ARITHMETIC, not against another run
    * of the same codec; n_bytes is deliberately excluded (PNG encoding
    * size is codec-internal, not part of the decode contract).
    */
  val pngAudit: QueryDef = q(
    "m04_png_decode",
    """SELECT doc_id AS media_id,
      |  CAST(1 + doc_id % 64 AS INT) AS width,
      |  CAST(1 + doc_id % 48 AS INT) AS height,
      |  CAST(3 * (1 + doc_id % 48)
      |       * ((1 + doc_id % 64) * (doc_id % 100)
      |          + ((1 + doc_id % 64) * (doc_id % 64)) // 2)
      |       AS BIGINT) AS pixel_sum
      |FROM documents
      |ORDER BY media_id""".stripMargin) { (s, d) =>
    decodeImage(syntheticImages(s, d)).toDF()
      .select(col("media_id"), col("width"), col("height"), col("pixel_sum"))
      .orderBy("media_id")
  }

  /** m05: the REAL-audio-codec audit — every document id becomes a genuine
    * `AudioSystem`-encoded RIFF/WAVE clip on the executors, [[decodeWav]]
    * parses it back through the JDK codec, and the oracle pins sample
    * count / sum / energy / peak to the sample law restated as SQL over an
    * unnested index range. Like m04, the round-trip is verified against
    * ARITHMETIC computed by a different engine, not another run of the
    * same codec.
    */
  val wavAudit: QueryDef = q(
    "m05_wav_decode",
    """WITH v AS (
      |  SELECT doc_id AS media_id, 256 + doc_id % 256 AS n FROM documents),
      |idx AS (SELECT unnest(range(0, 512)) AS i),
      |s AS (
      |  SELECT media_id, n,
      |         ((i * 7919 + media_id * 104729) % 65536) - 32768 AS x
      |  FROM v JOIN idx ON idx.i < v.n)
      |SELECT media_id, CAST(n AS BIGINT) AS n_samples,
      |       CAST(sum(x) AS BIGINT) AS sample_sum,
      |       CAST(sum(x * x) AS BIGINT) AS energy,
      |       CAST(max(abs(x)) AS BIGINT) AS peak
      |FROM s GROUP BY media_id, n
      |ORDER BY media_id""".stripMargin) { (s, d) =>
    decodeWav(syntheticAudio(s, d)).toDF()
      .select(col("media_id"), col("n_samples"), col("sample_sum"),
        col("energy"), col("peak"))
      .orderBy("media_id")
  }

  /** m06: the REAL-resize audit — every synthetic gradient PNG decoded by
    * the actual codec and nearest-neighbor-resampled to 32×24; the oracle
    * states the resampled pixel sum in closed form (the gradient row is
    * `c + x`, so the thumbnail sum is
    * `out_h · Σ_x 3(c + (x·w div out_w)) = 2304c + 72·Σ (x·w div 32)`),
    * computed by a different engine over an unnested index range — the
    * m04/m05 discipline: codec output pinned to arithmetic, never to
    * another run of the same codec.
    */
  val resizeAudit: QueryDef = q(
    "m06_resize_real",
    """WITH x AS (SELECT unnest(range(0, 32)) AS x),
      |v AS (SELECT doc_id AS media_id,
      |             1 + doc_id % 64 AS w, 1 + doc_id % 48 AS h,
      |             doc_id % 100 AS c
      |      FROM documents),
      |s AS (SELECT media_id, CAST(sum((x.x * w) // 32) AS BIGINT) AS sx
      |      FROM v, x GROUP BY media_id)
      |SELECT v.media_id AS media_id,
      |       CAST(v.w AS INT) AS src_w, CAST(v.h AS INT) AS src_h,
      |       32 AS out_w, 24 AS out_h,
      |       CAST(2304 * v.c + 72 * s.sx AS BIGINT) AS pixel_sum
      |FROM v JOIN s ON s.media_id = v.media_id
      |ORDER BY v.media_id""".stripMargin) { (s, d) =>
    resizeImage(syntheticImages(s, d), 32, 24).toDF()
      .orderBy("media_id")
  }

  /** 64-bit average-hash of an image, split into two 32-bit halves for
    * cross-engine portability (a full 64-bit hash with bit 63 set is a
    * negative BIGINT whose construction overflows DuckDB's checked
    * integer ops; two unsigned halves compare and group identically).
    */
  final case class ImageHash(media_id: Long, phash_hi: Long, phash_lo: Long)

  /** PERCEPTUAL hash (aHash) through the REAL codec: decode, 8×8
    * nearest-neighbor grayscale thumbnail, one bit per cell — set iff the
    * cell is brighter than the thumbnail mean (computed as the exact
    * integer comparison `64·g > Σg`, no division). aHash is invariant to
    * uniform brightness shifts (the mean shifts with the cells) and to
    * resolution (the thumbnail is fixed-size) — the two cheapest
    * transformations a re-hosted image undergoes, which is exactly what
    * m08's dedup demonstrates: same-gradient images at different
    * brightness collapse to one hash.
    *
    * Same scale shape as [[decodeImage]]: per-partition streaming decode,
    * JVM-static codec dispatch, 16 bytes of output per image.
    */
  /** The per-image aHash core (decode → 8×8 NN grayscale → mean bits),
    * returned as (hi, lo) unsigned 32-bit halves. Pure executor-side
    * function; [[aHash]] and the streaming MediaStream lane both ride it
    * so batch and stream agree by construction.
    */
  private[graft] def aHashBytes(content: Array[Byte], mediaId: Long): (Long, Long) = {
    imageioInMemory()
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(content))
    require(img != null,
      s"media_id $mediaId: payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val g = new Array[Long](64)
    var yp = 0
    while (yp < 8) {
      val sy = ((yp * h) / 8).toInt
      var xp = 0
      while (xp < 8) {
        val sx = ((xp * w) / 8).toInt
        val rgb = img.getRGB(sx, sy)
        g(8 * yp + xp) =
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        xp += 1
      }
      yp += 1
    }
    var s = 0L
    var k = 0
    while (k < 64) { s += g(k); k += 1 }
    var hash = 0L
    k = 0
    while (k < 64) {
      if (g(k) * 64L > s) hash |= (1L << k)
      k += 1
    }
    (hash >>> 32, hash & 0xffffffffL)
  }

  def aHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (hi, lo) = aHashBytes(r.content, r.media_id)
        ImageHash(r.media_id, hi, lo)
      }
    }
  }

  /** Deterministic 32×32 PATTERN PNG for `id`: pixel value
    * `v(x,y) = c + ((⌊x/4⌋·(p+2) + ⌊y/4⌋·(2p+1)) mod 120)` with pattern
    * class `p = id mod 16` and brightness `c = id mod 100`. The pattern
    * is 4×4-blocky ON PURPOSE: the 8×8 thumbnail's nearest-neighbor taps
    * (stride 4) land on block corners, so the aHash of the REAL decoded
    * PNG has the closed form the m08 oracle states. Images sharing `p`
    * differ only by uniform brightness — the perceptual-dup class.
    */
  def syntheticPatternPng(id: Long): Array[Byte] = {
    imageioInMemory()
    val p = math.floorMod(id, 16L).toInt
    val c = math.floorMod(id, 100L).toInt
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val v = c + (((x / 4) * (p + 2) + (y / 4) * (2 * p + 1)) % 120)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One pattern PNG per document id — executor-side encoding, the
    * [[syntheticImages]] shape.
    */
  def syntheticPatternImages(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.parallel(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map(id => MediaRow(id, "image", syntheticPatternPng(id))))
  }

  /** m08: perceptual-hash image dedup — every document id becomes a real
    * ImageIO-encoded pattern PNG ([[syntheticPatternPng]]), [[aHash]]
    * hashes it through the real codec, and images group by hash. The
    * oracle states the hash in closed form from the pixel law
    * (`g(x',y') = c + ((x'(p+2) + y'(2p+1)) mod 120)`, bit set iff
    * `64·g > Σg`) — the m04/m06 discipline: codec output pinned to
    * arithmetic computed by a different engine. The brightness term `c`
    * cancels against the mean, so the ~16 pattern classes each collapse
    * ~31 differently-bright source images into one hash group — the
    * near-dup signal content hashing (d01/m04's pixel checksum) cannot
    * see.
    *
    * Scale shape: decode+hash is a per-partition streaming map emitting
    * 16 bytes/image; the ONLY exchange is the group-by on the hash
    * halves (map-side partials). The 100 TB profile is a scan of the
    * image store plus a kilobyte-scale aggregate.
    */
  val phashDedup: QueryDef = q(
    "m08_phash_dedup",
    """WITH v AS (
      |  SELECT doc_id AS media_id, doc_id % 16 AS p, doc_id % 100 AS c
      |  FROM documents),
      |xs AS (SELECT unnest(range(0, 8)) AS xp),
      |ys AS (SELECT unnest(range(0, 8)) AS yp),
      |g AS (SELECT media_id, xp, yp,
      |             c + ((xp * (p + 2) + yp * (2 * p + 1)) % 120) AS gv
      |      FROM v, xs, ys),
      |sg AS (SELECT media_id, sum(gv) AS s FROM g GROUP BY 1),
      |hh AS (
      |  SELECT g.media_id,
      |    CAST(sum(CASE WHEN 64 * g.gv > sg.s AND yp >= 4
      |                  THEN CAST(1 AS BIGINT) << (8 * (yp - 4) + xp)
      |                  ELSE 0 END) AS BIGINT) AS phash_hi,
      |    CAST(sum(CASE WHEN 64 * g.gv > sg.s AND yp < 4
      |                  THEN CAST(1 AS BIGINT) << (8 * yp + xp)
      |                  ELSE 0 END) AS BIGINT) AS phash_lo
      |  FROM g JOIN sg ON sg.media_id = g.media_id
      |  GROUP BY 1)
      |SELECT phash_hi, phash_lo, count(*) AS n_images,
      |       min(media_id) AS keep_id
      |FROM hh GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    aHash(syntheticPatternImages(s, d)).toDF()
      .groupBy(col("phash_hi"), col("phash_lo"))
      .agg(count(lit(1)).as("n_images"), min(col("media_id")).as("keep_id"))
      .orderBy("phash_hi", "phash_lo")
  }

  /** Deterministic pattern WAV for `id`: 512 mono PCM16 samples
    * `x_i = a · b_i(p)` with pattern class `p = id mod 16`, amplitude
    * `a = 1 + id mod 7`, and base law
    * `b_i(p) = ((i·(2p+3) + 37p) mod 4001) − 2000` (|x| ≤ 14000, in
    * int16 range). Clips sharing `p` differ only by a GAIN factor — the
    * perceptual-dup class for audio, exactly m08's brightness story.
    */
  def syntheticPatternWav(id: Long): Array[Byte] = {
    val p = math.floorMod(id, 16L).toInt
    val a = 1 + math.floorMod(id, 7L).toInt
    val n = 512
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val b = ((i.toLong * (2 * p + 3) + 37L * p) % 4001L).toInt - 2000
      val x = a * b
      pcm(2 * i) = (x & 0xff).toByte
      pcm(2 * i + 1) = ((x >> 8) & 0xff).toByte
      i += 1
    }
    riffWavBytes(pcm)
  }

  def syntheticPatternAudio(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.parallel(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map(id => MediaRow(id, "audio", syntheticPatternWav(id))))
  }

  /** One audio fingerprint: 7 energy-delta sign bits over 8 frames. */
  final case class AudioFp(media_id: Long, fp: Long)

  /** GAIN-INVARIANT audio fingerprint through the REAL codec: decode,
    * frame into 8×64 samples, exact integer frame energies, one bit per
    * adjacent-frame comparison (`E_{f+1} > E_f`). A uniform gain scales
    * every energy by a², leaving every comparison — and the fingerprint —
    * unchanged: the audio twin of [[aHash]]'s brightness invariance,
    * catching re-levelled copies that byte/sample checksums miss. Same
    * per-partition streaming-decode scale shape; 8 bytes out per clip.
    */
  def audioFingerprint(media: Dataset[MediaRow]): Dataset[AudioFp] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val ais = openAudio(r.content)
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian,
          s"media_id ${r.media_id}: need mono PCM16LE")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        val nf = n / 64
        val e = new Array[Long](nf)
        var i = 0
        while (i < nf * 64) {
          val x = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toLong
          e(i / 64) += x * x
          i += 1
        }
        var fp = 0L
        var f = 0
        while (f + 1 < nf) {
          if (e(f + 1) > e(f)) fp |= (1L << f)
          f += 1
        }
        AudioFp(r.media_id, fp)
      }
    }
  }

  /** m09: gain-invariant audio dedup — every document id becomes a real
    * RIFF/WAVE pattern clip, [[audioFingerprint]] hashes it through the
    * real codec, clips group by fingerprint. The oracle states the
    * fingerprint in closed form from the base law (the gain factor a²
    * cancels in every energy comparison) — the m04/m05/m08 discipline.
    * The ~16 pattern classes each collapse clips at 7 different gains.
    */
  val audioFpDedup: QueryDef = q(
    "m09_audio_fp_dedup",
    """WITH v AS (
      |  SELECT doc_id AS media_id, CAST(doc_id % 16 AS INT) AS p
      |  FROM documents),
      |idx AS (SELECT unnest(range(0, 512)) AS i),
      |s AS (
      |  SELECT media_id, i // 64 AS f,
      |         ((i * (2 * p + 3) + 37 * p) % 4001) - 2000 AS b
      |  FROM v, idx),
      |en AS (SELECT media_id, f, CAST(sum(b * b) AS BIGINT) AS e
      |       FROM s GROUP BY 1, 2),
      |bits AS (
      |  SELECT a.media_id, a.f,
      |         CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
      |  FROM en a JOIN en b ON b.media_id = a.media_id AND b.f = a.f + 1),
      |fp AS (SELECT media_id, CAST(sum(bit * (1 << f)) AS BIGINT) AS fp
      |       FROM bits GROUP BY 1)
      |SELECT fp, count(*) AS n_clips, min(media_id) AS keep_id
      |FROM fp GROUP BY 1
      |ORDER BY fp""".stripMargin) { (s, d) =>
    audioFingerprint(syntheticPatternAudio(s, d)).toDF()
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_clips"), min(col("media_id")).as("keep_id"))
      .orderBy("fp")
  }

  def defs: Seq[QueryDef] =
    Seq(binaryMeta, decodeAgg, frameAudit, pngAudit, wavAudit, resizeAudit,
      wavFrameAudit, phashDedup, audioFpDedup)
}
