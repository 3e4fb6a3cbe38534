package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus typed metadata, processed batch-at-a-time with
  * `mapPartitions` over typed Datasets (the Scala analogue of
  * mapInPandas — one JVM iterator per partition, no per-row UDF overhead,
  * arbitrary native/library calls inside).
  *
  * The IMAGE path is REAL: PNG/JPEG bytes are decoded with
  * `javax.imageio` (on the JDK, zero extra dependencies), dimensions and
  * features come from actual pixels, and resize re-encodes actual
  * pixels. The AUDIO/VIDEO codec work remains STUBBED (no ffmpeg-class
  * libraries in this environment): `FakeCodec` derives deterministic
  * pseudo-metadata from the bytes, so the Spark-side plumbing — schema,
  * partitioning, batch iteration shape, output schema — is real and
  * tested, and the audio/video codec body is the only thing to swap for
  * production.
  */
object Multimodal {

  /** Canonical asset schema: id + modality + raw bytes + source metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  final case class Asset(
      asset_id: Long,
      modality: String,
      content: Array[Byte],
      source: String,
      mime: String)

  final case class DecodedAsset(
      asset_id: Long,
      modality: String,
      width: Int,
      height: Int,
      duration_ms: Long,
      n_frames: Int,
      feature: Array[Float])

  /** Real image codec over `javax.imageio` — decode, deterministic
    * synth, feature-extract, resize. All pure functions of the bytes:
    * safe inside executors, deterministic across runs.
    */
  object ImageCodec {

    /** Decode image bytes to a BufferedImage; None when the bytes are
      * not a decodable image (corrupt samples must not kill a 100 TB
      * job — callers surface them as n_frames = 0 rows instead).
      */
    def decode(bytes: Array[Byte]): Option[BufferedImage] =
      if (bytes == null || bytes.length == 0) None
      else
        try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case _: Exception => None }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Deterministic synthetic PNG: dimensions and pixels are a pure
      * function of the seed (splitmix-style mixing per pixel), so
      * fixtures and benches get REAL decodable images without bundling
      * binary test data.
      */
    def makePng(seed: Long): Array[Byte] = {
      val w = 8 + math.abs(seed % 16).toInt
      val h = 8 + math.abs((seed >> 4) % 12).toInt
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var z = seed + x * 0x9e3779b97f4a7c15L + y * 0xc2b2ae3d27d4eb4fL
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          img.setRGB(x, y, ((z >>> 33) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    /** Real feature extraction from pixels: dim-bucket grayscale
      * histogram, L1-normalized — a genuine (if simple) visual
      * signature; swap for a model embedding in production.
      */
    def grayHistogram(img: BufferedImage, dim: Int): Array[Float] = {
      val counts = new Array[Float](dim)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val gray = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          counts(math.min(dim - 1, gray * dim / 256)) += 1f
          x += 1
        }
        y += 1
      }
      val n = img.getWidth.toFloat * img.getHeight
      counts.map(_ / n)
    }

    /** Deterministic STRUCTURED synthetic PNG — a seed-phased sinusoid
      * field. [[makePng]]'s per-pixel noise has no stable low-frequency
      * signature for [[pHash]] to latch onto; this generator produces
      * the content class perceptual hashing is designed for, so
      * fixtures can exercise near-dup detection without binary test
      * data.
      */
    def makeStructuredPng(seed: Long, w: Int = 64, h: Int = 64): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val fx = 1 + math.floorMod(seed, 3).toInt
      val fy = 1 + math.floorMod(seed >> 2, 3).toInt
      val phase = math.floorMod(seed, 7) * 0.9
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = 128 + (90 * math.sin(2 * math.Pi * fx * x / w + phase) *
            math.cos(2 * math.Pi * fy * y / h)).toInt
          val c = math.max(0, math.min(255, v))
          img.setRGB(x, y, (c << 16) | (c << 8) | c)
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    /** Deterministic ±delta checkerboard jitter of a decodable image —
      * the "same content, slightly different bytes" fixture for
      * near-dup tests (re-encoded PNG, so the BYTES differ a lot while
      * the pixels barely do).
      */
    def jitterPng(bytes: Array[Byte], delta: Int): Array[Byte] = {
      val img = decode(bytes).get
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val c = (img.getRGB(x, y) & 0xff) + (if ((x + y) % 2 == 0) delta else -delta)
          val cc = math.max(0, math.min(255, c))
          img.setRGB(x, y, (cc << 16) | (cc << 8) | cc)
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    /** 64-bit perceptual hash (pHash, DCT variant): decode → 32×32
      * box-filtered grayscale → 2-D DCT-II → top-left 8×8
      * low-frequency block → bit per coefficient, set when the
      * coefficient exceeds the median of the 63 non-DC values. All
      * arithmetic is fixed-order doubles on deterministic pixel data,
      * so the hash is a pure function of the decoded pixels: a
      * re-encode or mild noise moves a few bits, an unrelated image
      * ~half of them. None for undecodable bytes.
      */
    def pHash(bytes: Array[Byte]): Option[Long] = decode(bytes).map { img =>
      val N = 32
      // box-filter grayscale resample: average the source region per cell
      val g = new Array[Double](N * N)
      val w = img.getWidth; val h = img.getHeight
      var ty = 0
      while (ty < N) {
        val y0 = ty * h / N; val y1 = math.max(y0 + 1, (ty + 1) * h / N)
        var tx = 0
        while (tx < N) {
          val x0 = tx * w / N; val x1 = math.max(x0 + 1, (tx + 1) * w / N)
          var s = 0.0; var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              s += ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000.0
              x += 1
            }
            y += 1
          }
          g(ty * N + tx) = s / ((y1 - y0) * (x1 - x0))
          tx += 1
        }
        ty += 1
      }
      // 2-D DCT-II of the top-left 8×8 frequencies only (O(64·N²))
      val coef = new Array[Double](64)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0.0; var y = 0
          while (y < N) {
            var x = 0
            while (x < N) {
              s += g(y * N + x) *
                math.cos((2 * y + 1) * u * math.Pi / (2.0 * N)) *
                math.cos((2 * x + 1) * v * math.Pi / (2.0 * N))
              x += 1
            }
            y += 1
          }
          coef(u * 8 + v) = s
          v += 1
        }
        u += 1
      }
      val nonDc = coef.drop(1).sorted
      val median = (nonDc(30) + nonDc(31)) / 2.0 // 63 values: mid-pair
      var bits = 0L; var i = 0
      while (i < 64) {
        if (coef(i) > median) bits |= 1L << i
        i += 1
      }
      bits
    }

    /** [[pHash]] with a boxed-null miss — the codegen-callable shape
      * for the SQL surface's `phash(content)` (PHashExpr): undecodable
      * bytes hash to SQL NULL, mirroring [[pHashes]]' decodable-only
      * contract.
      */
    def pHashOrNull(bytes: Array[Byte]): java.lang.Long =
      pHash(bytes).map(java.lang.Long.valueOf).orNull

    /** Aspect-preserving fit of real pixels into (maxW, maxH), PNG
      * re-encode. None when the input is not decodable.
      */
    def resize(bytes: Array[Byte], maxW: Int, maxH: Int): Option[(Array[Byte], Int, Int)] =
      decode(bytes).map { img =>
        val scale = math.min(1.0, math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
        val nw = math.max(1, (img.getWidth * scale).toInt)
        val nh = math.max(1, (img.getHeight * scale).toInt)
        if (nw == img.getWidth && nh == img.getHeight) (bytes, nw, nh)
        else {
          val dst = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try g.drawImage(img.getScaledInstance(nw, nh, java.awt.Image.SCALE_SMOOTH), 0, 0, null)
          finally g.dispose()
          (encodePng(dst), nw, nh)
        }
      }
  }

  /** Real audio codec over `javax.sound.sampled` (on the JDK, zero
    * extra dependencies): WAV/AIFF/AU decode — duration, sample rate,
    * channels, and amplitude features from actual samples. Compressed
    * formats (mp3/ogg) have no JDK codec and fall back to the stub.
    */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** Decode audio bytes: (duration_ms, sample_rate, channels), or None
      * when the bytes are not a JDK-decodable audio container.
      */
    def decode(bytes: Array[Byte]): Option[(Long, Int, Int)] =
      if (bytes == null || bytes.length == 0) None
      else
        try {
          val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          try {
            val fmt = in.getFormat
            val frames = in.getFrameLength
            if (frames <= 0 || fmt.getFrameRate <= 0) None
            else Some((
              (frames * 1000.0 / fmt.getFrameRate).toLong,
              fmt.getSampleRate.toInt,
              fmt.getChannels))
          } finally in.close()
        } catch { case _: Exception => None }

    /** Deterministic synthetic WAV: 8 kHz 8-bit unsigned mono PCM sine,
      * duration and frequency a pure function of the seed — real
      * decodable audio for fixtures without bundling binary test data.
      */
    def makeWav(seed: Long): Array[Byte] = {
      val rate = 8000
      val frames = 1600 + math.abs(seed % 14401).toInt // 0.2 .. 2.0 s
      val freq = 200.0 + math.abs((seed >> 3) % 800)
      val data = new Array[Byte](frames)
      var i = 0
      while (i < frames) {
        data(i) = (128 + 100 * math.sin(2 * math.Pi * freq * i / rate)).toByte
        i += 1
      }
      val fmt = new AudioFormat(rate.toFloat, 8, 1, false, false)
      val out = new ByteArrayOutputStream()
      val stream = new AudioInputStream(new ByteArrayInputStream(data), fmt, frames.toLong)
      AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Deterministic STRUCTURED WAV: 64 constant-amplitude segments of
      * 200 samples each (8 kHz 8-bit unsigned mono, 1.6 s), segment
      * amplitude/frequency a seeded xorshift walk — the audio analogue
      * of [[ImageCodec.makeStructuredPng]]. [[makeWav]]'s constant-
      * amplitude sine makes every frame energy equal, so any
      * energy-delta fingerprint degenerates on it; the segment walk
      * gives each seed a distinctive energy CONTOUR for near-dup
      * fixtures.
      */
    def makeStructuredWav(seed: Long): Array[Byte] = {
      val rate = 8000; val segLen = 200; val nSeg = 64
      val data = new Array[Byte](segLen * nSeg)
      var x = seed * 0x9E3779B97F4A7C15L + 1
      var s = 0
      while (s < nSeg) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        val amp = 20 + math.floorMod(x, 81).toInt // 20..100
        val freq = 200.0 + math.floorMod(x >> 8, 700).toInt
        var i = 0
        while (i < segLen) {
          val t = s * segLen + i
          data(t) = (128 + amp * math.sin(2 * math.Pi * freq * t / rate)).toByte
          i += 1
        }
        s += 1
      }
      val fmt = new AudioFormat(rate.toFloat, 8, 1, false, false)
      val out = new ByteArrayOutputStream()
      val stream = new AudioInputStream(new ByteArrayInputStream(data), fmt, data.length.toLong)
      AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Deterministic volume jitter of a decodable 8-bit mono WAV: every
      * sample's deviation from the 128 midpoint scales by num/den and
      * the stream re-encodes — most BYTES change while the energy
      * ORDER across frames doesn't (uniform gain), the audio twin of
      * [[ImageCodec.jitterPng]]'s "same content, different bytes"
      * fixture. Truncation noise may flip near-tie fingerprint bits
      * only.
      */
    def jitterWavGain(bytes: Array[Byte], num: Int = 7, den: Int = 8): Array[Byte] = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
          "jitterWavGain expects 8-bit mono (the fixture generators' format)")
        val raw = readAll(in)
        var i = 0
        while (i < raw.length) {
          val d = (raw(i) & 0xff) - 128
          raw(i) = (128 + d * num / den).toByte
          i += 1
        }
        val out = new ByteArrayOutputStream()
        val st = new AudioInputStream(new ByteArrayInputStream(raw), fmt, raw.length.toLong)
        AudioSystem.write(st, AudioFileFormat.Type.WAVE, out)
        out.toByteArray
      } finally in.close()
    }

    private def readAll(in: AudioInputStream): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    }

    /** 64-bit audio fingerprint (Haitsma–Kalker sign-of-energy-delta,
      * collapsed to one band): decode → channel-averaged sample
      * magnitudes → 64 equal frames → mean |deviation from silence|
      * per frame → bit i set when e(i) > e((i+1) mod 64). Comparing
      * ADJACENT frame energies makes the hash invariant to uniform
      * gain (every energy scales by the same factor, preserving
      * order) — the audio analogue of pHash's median rule: a
      * volume-jittered re-encode moves only near-tie bits, an
      * unrelated clip ~half of them. Fixed-order double arithmetic on
      * deterministic samples ⇒ a pure function of the decoded audio.
      * None for undecodable bytes, unsupported sample widths, or
      * clips too short to frame (< 128 samples).
      */
    def aHash(bytes: Array[Byte]): Option[Long] =
      if (bytes == null || bytes.length == 0) None
      else
        try {
          val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          try {
            val fmt = in.getFormat
            val bits = fmt.getSampleSizeInBits
            val ch = fmt.getChannels
            if (bits != 8 && bits != 16) None
            else {
              val raw = readAll(in)
              val bps = bits / 8
              val n = raw.length / (bps * ch)
              if (n < 128) None
              else {
                val e = new Array[Double](64)
                val cnt = new Array[Long](64)
                var i = 0
                while (i < n) {
                  var s = 0.0
                  var c = 0
                  while (c < ch) {
                    val off = (i * ch + c) * bps
                    val v =
                      if (bits == 8) {
                        if (fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED)
                          (raw(off) & 0xff) - 128.0
                        else raw(off).toDouble
                      } else if (fmt.isBigEndian)
                        ((raw(off).toInt << 8) | (raw(off + 1) & 0xff)).toDouble
                      else
                        ((raw(off + 1).toInt << 8) | (raw(off) & 0xff)).toDouble
                    s += math.abs(v)
                    c += 1
                  }
                  val f = (i.toLong * 64 / n).toInt
                  e(f) += s / ch
                  cnt(f) += 1
                  i += 1
                }
                var h = 0L
                var f = 0
                while (f < 64) {
                  val g = (f + 1) % 64
                  if (e(f) / cnt(f) > e(g) / cnt(g)) h |= (1L << f)
                  f += 1
                }
                Some(h)
              }
            }
          } finally in.close()
        } catch { case _: Exception => None }

    /** Real feature extraction from samples: dim-bucket amplitude
      * histogram over the decoded 8-bit stream, L1-normalized. Swap for
      * a spectral embedding in production.
      */
    def amplitudeHistogram(bytes: Array[Byte], dim: Int): Array[Float] =
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        try {
          val counts = new Array[Float](dim)
          var total = 0L
          val buf = new Array[Byte](4096)
          var n = in.read(buf)
          while (n > 0) {
            var i = 0
            while (i < n) {
              counts(((buf(i) & 0xff) * dim) / 256) += 1f
              i += 1
            }
            total += n
            n = in.read(buf)
          }
          if (total == 0) counts else counts.map(_ / total)
        } finally in.close()
      } catch { case _: Exception => new Array[Float](dim) }
  }

  /** STUB codec for VIDEO (and non-JDK-decodable audio) — deterministic
    * fake standing in for a real decoder (??? boundary). Production:
    * replace body with e.g. ffmpeg bindings; signature and batch shape
    * stay identical. (Image routes to [[ImageCodec]], WAV-class audio to
    * [[AudioCodec]].)
    */
  object FakeCodec {
    def decode(modality: String, bytes: Array[Byte]): (Int, Int, Long, Int) = {
      val h = if (bytes == null) 0L else bytes.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
      val w = 64 + math.abs(h % 1024).toInt
      val ht = 64 + math.abs((h >> 10) % 1024).toInt
      modality match {
        case "image" => (w, ht, 0L, 1)
        case "audio" => (0, 0, 1000 + math.abs(h % 600000), 0)
        case _       => (w, ht, 1000 + math.abs(h % 600000), 1 + math.abs((h >> 20) % 3000).toInt)
      }
    }

    /** Fake feature extraction: dim-length deterministic float vector. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      var h = if (bytes == null) 7L else bytes.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
      Array.fill(dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        ((h >>> 33).toInt % 1000) / 1000.0f
      }
    }
  }

  /** Decode + feature-extract a binary asset frame, one partition batch at
    * a time. Input must have columns (asset_id, modality, content, source,
    * mime); output is flat typed metadata + feature vector.
    *
    * Image rows: REAL decode (javax.imageio) — width/height/features
    * from actual pixels; undecodable image bytes yield an all-zero row.
    * The corrupt-sample marker is `modality = 'image' AND width = 0`
    * (IMAGE rows only — audio rows legitimately have width 0 and
    * n_frames 0); at 100 TB you filter these, never throw. Audio rows:
    * REAL decode for JDK-supported containers (WAV/AIFF/AU via
    * javax.sound.sampled) — duration and amplitude features from actual
    * samples; other audio bytes fall back to the FakeCodec stub (the
    * honest pretend-decode for codecs the JDK lacks — NOT marked
    * corrupt). Video rows: FakeCodec stub.
    */
  def decodeAssets(spark: SparkSession, assets: DataFrame, featureDim: Int = 16): Dataset[DecodedAsset] = {
    import spark.implicits._
    assets
      .select(
        col("asset_id").cast("long"),
        col("modality").cast("string"),
        col("content").cast("binary"),
        col("source").cast("string"),
        col("mime").cast("string"))
      .as[Asset]
      .mapPartitions { batch =>
        // per-partition: init codec state once, stream the batch through
        batch.map { a =>
          a.modality match {
            case "image" =>
              ImageCodec.decode(a.content) match {
                case Some(img) =>
                  DecodedAsset(a.asset_id, a.modality, img.getWidth, img.getHeight, 0L, 1,
                    ImageCodec.grayHistogram(img, featureDim))
                case None =>
                  DecodedAsset(a.asset_id, a.modality, 0, 0, 0L, 0, new Array[Float](featureDim))
              }
            case "audio" =>
              AudioCodec.decode(a.content) match {
                case Some((durMs, _, _)) =>
                  DecodedAsset(a.asset_id, a.modality, 0, 0, durMs, 0,
                    AudioCodec.amplitudeHistogram(a.content, featureDim))
                case None => // not a JDK container — stub path
                  val (w, h, dur, frames) = FakeCodec.decode(a.modality, a.content)
                  DecodedAsset(a.asset_id, a.modality, w, h, dur, frames,
                    FakeCodec.features(a.content, featureDim))
              }
            case m =>
              val (w, h, dur, frames) = FakeCodec.decode(m, a.content)
              DecodedAsset(a.asset_id, m, w, h, dur, frames,
                FakeCodec.features(a.content, featureDim))
          }
        }
      }
  }

  final case class ResizedAsset(
      asset_id: Long,
      modality: String,
      width: Int,
      height: Int,
      content: Array[Byte])

  /** Resize image/video assets to a target box, batch-at-a-time.
    * Decodable images are REALLY resized (scaled pixels, PNG re-encode);
    * video (and undecodable image bytes) keep the STUB path — fake
    * dimensions scaled by the same aspect-fit math, bytes passed through.
    * Audio rows pass through untouched.
    */
  def resizeAssets(
      spark: SparkSession,
      assets: DataFrame,
      maxW: Int,
      maxH: Int): Dataset[ResizedAsset] = {
    import spark.implicits._
    assets
      .select(
        col("asset_id").cast("long"),
        col("modality").cast("string"),
        col("content").cast("binary"),
        col("source").cast("string"),
        col("mime").cast("string"))
      .as[Asset]
      .mapPartitions { batch =>
        batch.map { a =>
          a.modality match {
            case "audio" => ResizedAsset(a.asset_id, a.modality, 0, 0, a.content)
            case m =>
              val real = if (m == "image") ImageCodec.resize(a.content, maxW, maxH) else None
              real match {
                case Some((bytes, nw, nh)) => // one decode, real pixels
                  ResizedAsset(a.asset_id, m, nw, nh, bytes)
                case None => // video, or undecodable image bytes: stub path
                  val (w, h, _, _) = FakeCodec.decode(m, a.content)
                  // aspect-preserving fit into (maxW, maxH) — real math, fake pixels
                  val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
                  val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
                  ResizedAsset(a.asset_id, m, nw, nh, a.content)
              }
          }
        }
      }
  }

  /** Per-image perceptual hashes: (asset_id, phash) for every DECODABLE
    * image row; non-image and corrupt rows drop out (at 100 TB you
    * filter, never throw). Batch-at-a-time decode like [[decodeAssets]].
    */
  def imagePHashes(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets
      .select(
        col("asset_id").cast("long"),
        col("modality").cast("string"),
        col("content").cast("binary"),
        col("source").cast("string"),
        col("mime").cast("string"))
      .as[Asset]
      .mapPartitions { batch =>
        batch.flatMap { a =>
          if (a.modality == "image") ImageCodec.pHash(a.content).map(h => (a.asset_id, h))
          else None
        }
      }
      .toDF("asset_id", "phash")
  }

  /** Pigeonhole-banded Hamming pairs over ANY 64-bit perceptual hash —
    * the shared physical shape of image (pHash) and audio (aHash)
    * near-dup, reusing SimHash text dedup's banding: the 64-bit hash
    * splits into `nBands` equal chunks, and any pair within hamming ≤
    * nBands−1 must agree on at least one chunk verbatim, so candidates
    * come from an EQUI-join on (band, chunk) — the shuffle carries
    * (id, hash) only, never pixels or samples — and exact
    * bit_count(XOR) verifies. Recall is 1.0 for maxHamming ≤ nBands−1
    * (enforced); more bands raise the bound but shrink chunk width
    * (16-bit chunks at 4 bands keep bucket cardinality high — prefer
    * that at corpus scale). Input is (asset_id, h64[, is_batch]); with
    * `incremental` the output keeps only pairs TOUCHING a batch row.
    */
  private def bandedHamming64(
      hashed: DataFrame,
      maxHamming: Int,
      nBands: Int,
      incremental: Boolean): DataFrame = {
    require(64 % nBands == 0, "nBands must divide 64")
    require(maxHamming <= nBands - 1,
      s"pigeonhole guarantee needs maxHamming <= ${nBands - 1} for $nBands bands " +
        "(a pair differing in b bits can corrupt at most b chunks)")
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val banded = hashed
      .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
      .withColumn("chunk", expr(s"shiftright(h64, band * $width) & ${mask}L"))
    def side(sfx: String) = {
      val base = banded.select(
        (Seq(col("band"), col("chunk"),
          col("asset_id").as(s"id_$sfx"), col("h64").as(s"h_$sfx")) ++
          (if (incremental) Seq(col("is_batch").as(s"b_$sfx")) else Nil)): _*)
      base
    }
    val joined = side("a").join(side("b"), Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
    val scoped =
      if (incremental) joined.filter(col("b_a") === 1 || col("b_b") === 1)
      else joined
    scoped
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Near-duplicate IMAGES by pHash hamming distance — the visual twin
    * of SimHash text dedup; see [[bandedHamming64]] for the banding
    * argument (the shuffle carries (id, phash) only, never pixels).
    */
  def imageNearDups(
      spark: SparkSession,
      assets: DataFrame,
      maxHamming: Int = 3,
      nBands: Int = 4): DataFrame =
    bandedHamming64(
      imagePHashes(spark, assets).select(col("asset_id"), col("phash").as("h64")),
      maxHamming, nBands, incremental = false)

  /** Incremental visual near-dup: pair a NEW batch of images against a
    * persisted pHash store without re-decoding history — the daily
    * shape of [[imageNearDups]], mirroring the text side's
    * `minHashNearDupsIncremental`. Emits pairs TOUCHING THE BATCH only
    * (batch↔batch and batch↔history; history-internal pairs were a
    * previous run's output). The store is (asset_id, phash) — 16 bytes
    * a row, so a billion images is a ~16 GB parquet join side while
    * the pixels stay cold. Same pigeonhole banding and hamming bound
    * as the batch operator; append the returned batch hashes to the
    * store after each run.
    */
  def imageNearDupsIncremental(
      spark: SparkSession,
      batchAssets: DataFrame,
      store: DataFrame,
      maxHamming: Int = 3,
      nBands: Int = 4): DataFrame =
    bandedHamming64(
      imagePHashes(spark, batchAssets)
        .select(col("asset_id"), col("phash").as("h64")).withColumn("is_batch", lit(1))
        .unionByName(store.select(col("asset_id").cast("long"),
          col("phash").cast("long").as("h64")).withColumn("is_batch", lit(0))),
      maxHamming, nBands, incremental = true)

  /** Per-clip audio fingerprints: (asset_id, ahash) for every
    * JDK-decodable audio row ([[AudioCodec.aHash]]); non-audio and
    * undecodable rows drop out. Batch-at-a-time decode like
    * [[imagePHashes]] — the acoustic half of the perceptual-hash
    * surface.
    */
  def audioFingerprints(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets
      .select(
        col("asset_id").cast("long"),
        col("modality").cast("string"),
        col("content").cast("binary"),
        col("source").cast("string"),
        col("mime").cast("string"))
      .as[Asset]
      .mapPartitions { batch =>
        batch.flatMap { a =>
          if (a.modality == "audio") AudioCodec.aHash(a.content).map(h => (a.asset_id, h))
          else None
        }
      }
      .toDF("asset_id", "ahash")
  }

  /** Near-duplicate AUDIO by fingerprint hamming distance — the
    * acoustic twin of [[imageNearDups]]: gain-jittered re-encodes land
    * within a few bits of their original while unrelated clips differ
    * in ~32; same pigeonhole banding, the shuffle carries (id, ahash)
    * only, never samples.
    */
  def audioNearDups(
      spark: SparkSession,
      assets: DataFrame,
      maxHamming: Int = 3,
      nBands: Int = 4): DataFrame =
    bandedHamming64(
      audioFingerprints(spark, assets).select(col("asset_id"), col("ahash").as("h64")),
      maxHamming, nBands, incremental = false)

  /** Incremental acoustic near-dup against a persisted (asset_id,
    * ahash) store — the daily shape of [[audioNearDups]], mirroring
    * [[imageNearDupsIncremental]]: batch clips are decoded once, the
    * store joins at 16 bytes/row while the samples stay cold, and only
    * pairs touching the batch emit (history-internal pairs were a
    * previous run's output). Append the batch's fingerprints to the
    * store after each run.
    */
  def audioNearDupsIncremental(
      spark: SparkSession,
      batchAssets: DataFrame,
      store: DataFrame,
      maxHamming: Int = 3,
      nBands: Int = 4): DataFrame =
    bandedHamming64(
      audioFingerprints(spark, batchAssets)
        .select(col("asset_id"), col("ahash").as("h64")).withColumn("is_batch", lit(1))
        .unionByName(store.select(col("asset_id").cast("long"),
          col("ahash").cast("long").as("h64")).withColumn("is_batch", lit(0))),
      maxHamming, nBands, incremental = true)

  /** Frame sampling plan for video assets: every `everyMs` milliseconds,
    * capped at `maxFrames` — returns (asset_id, frame_idx, ts_ms) rows.
    * Pure expressions (sequence + explode), no decode needed for the plan.
    */
  def sampleFramePlan(decoded: DataFrame, everyMs: Long = 1000L, maxFrames: Int = 32): DataFrame =
    decoded
      .filter(col("modality") === "video")
      .withColumn(
        "ts_ms",
        explode(slice(
          sequence(lit(0L), col("duration_ms"), lit(everyMs)), 1, maxFrames)))
      .withColumn("frame_idx", (col("ts_ms") / everyMs).cast("int"))
      .select("asset_id", "frame_idx", "ts_ms")

  /** Segment plan for audio assets: overlapping analysis windows of
    * `windowMs` every `hopMs`, capped — (asset_id, seg_idx, start_ms,
    * end_ms) rows. Pure expressions, audio only; the codec-side cut is
    * the stub boundary, the plan is real.
    */
  def segmentPlan(
      decoded: DataFrame,
      windowMs: Long = 2000L,
      hopMs: Long = 1000L,
      maxSegments: Int = 64): DataFrame =
    decoded
      .filter(col("modality") === "audio" && col("duration_ms") > 0)
      .withColumn(
        "start_ms",
        explode(slice(
          sequence(lit(0L), greatest(col("duration_ms") - windowMs, lit(0L)), lit(hopMs)),
          1, maxSegments)))
      .withColumn("seg_idx", (col("start_ms") / hopMs).cast("int"))
      .withColumn("end_ms", least(col("start_ms") + windowMs, col("duration_ms")))
      .select("asset_id", "seg_idx", "start_ms", "end_ms")

  /** Deterministic fake assets derived from any table — lets tests and
    * benches exercise the binary plumbing without bundling media files.
    * Image rows carry REAL (synthesized, seeded-by-id) PNG bytes and
    * audio rows REAL WAV bytes, so the javax.imageio / javax.sound
    * decode paths run on actual pixels/samples; video rows carry the
    * UTF-8 of the text (opaque bytes for the stub codec). Modality
    * round-robins on id.
    */
  def syntheticAssets(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null ids cannot round-trip the non-nullable Long encoder — drop
    // them (a synthetic-fixture generator, not a data path); floorMod
    // keeps negative ids in [0, 3)
    df.select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("txt"))
      .filter(col("id").isNotNull)
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, txt) =>
          val modality = Seq("image", "audio", "video")(java.lang.Math.floorMod(id, 3L).toInt)
          val (content, mime) = modality match {
            case "image" => (ImageCodec.makePng(id), "image/png")
            case "audio" => (AudioCodec.makeWav(id), "audio/wav")
            case _ =>
              (Option(txt).getOrElse("").getBytes("UTF-8"), "application/octet-stream")
          }
          Asset(id, modality, content, "synthetic", mime)
        }
      }
      .toDF()
  }
}
