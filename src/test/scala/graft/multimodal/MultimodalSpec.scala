package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  lazy val assets = Multimodal.syntheticAssets(
    spark.read.parquet(s"$sf/documents.parquet").limit(30), "doc_id", "text")

  test("synthetic assets: binary content + modality round-robin") {
    val schema = assets.schema
    assert(schema("content").dataType.typeName == "binary")
    val mods = assets.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods == Set("image", "audio", "video"))
  }

  test("decodeAssets is deterministic and typed per modality") {
    val d1 = Multimodal.decodeAssets(spark, assets).collect().sortBy(_.asset_id)
    val d2 = Multimodal.decodeAssets(spark, assets).collect().sortBy(_.asset_id)
    assert(d1.map(_.width).toSeq == d2.map(_.width).toSeq)
    assert(d1.map(a => a.feature.toSeq).toSeq == d2.map(a => a.feature.toSeq).toSeq)
    d1.foreach { a =>
      a.modality match {
        case "image" => assert(a.n_frames == 1 && a.duration_ms == 0 && a.width > 0)
        case "audio" => assert(a.width == 0 && a.duration_ms > 0)
        case "video" => assert(a.n_frames >= 1 && a.duration_ms > 0)
      }
      assert(a.feature.length == 16)
    }
  }

  test("image path decodes an embedded PNG's real pixels (javax.imageio)") {
    import spark.implicits._
    // hand-made 8x5 PNG — known real dimensions, not codec-stub output
    val img = new java.awt.image.BufferedImage(8, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(x => (0 until 5).foreach(y => img.setRGB(x, y, x * 31 + y)))
    val png = Multimodal.ImageCodec.encodePng(img)

    val asset = Seq((42L, "image", png, "test", "image/png"))
      .toDF("asset_id", "modality", "content", "source", "mime")
    val d = Multimodal.decodeAssets(spark, asset).collect().head
    assert(d.width == 8 && d.height == 5 && d.n_frames == 1)
    // histogram feature comes from real pixels: L1-normalized over 40 px
    assert(math.abs(d.feature.sum - 1.0f) < 1e-5)

    // corrupt image bytes surface as an undecodable row, never a throw
    val bad = Seq((43L, "image", "not a png".getBytes("UTF-8"), "test", "image/png"))
      .toDF("asset_id", "modality", "content", "source", "mime")
    val b = Multimodal.decodeAssets(spark, bad).collect().head
    assert(b.n_frames == 0 && b.width == 0)
  }

  test("real resize scales pixels and re-encodes a decodable PNG") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(100, 60, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val png = Multimodal.ImageCodec.encodePng(img)
    val asset = Seq((7L, "image", png, "test", "image/png"))
      .toDF("asset_id", "modality", "content", "source", "mime")

    val r = Multimodal.resizeAssets(spark, asset, maxW = 50, maxH = 50).collect().head
    assert(r.width == 50 && r.height == 30) // aspect preserved: 100x60 → 50x30
    val back = Multimodal.ImageCodec.decode(r.content)
    assert(back.isDefined, "resized bytes must be a real decodable image")
    assert(back.get.getWidth == 50 && back.get.getHeight == 30)
  }

  test("audio path decodes a real WAV's duration and samples (javax.sound)") {
    import spark.implicits._
    // 8000 frames at 8 kHz = exactly 1000 ms
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val samples = Array.tabulate[Byte](8000)(i => (128 + (i % 64)).toByte)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(samples), fmt, 8000L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)

    val asset = Seq((9L, "audio", out.toByteArray, "test", "audio/wav"))
      .toDF("asset_id", "modality", "content", "source", "mime")
    val d = Multimodal.decodeAssets(spark, asset).collect().head
    assert(d.duration_ms == 1000L && d.width == 0 && d.n_frames == 0)
    // amplitude histogram comes from real samples and is L1-normalized
    assert(math.abs(d.feature.sum - 1.0f) < 1e-5)
    // samples were constructed in [128, 192) → upper-half buckets only
    assert(d.feature.take(8).forall(_ == 0f), "lower amplitude buckets must be empty")
  }

  test("synthetic WAV generation is deterministic and really decodable") {
    val a = Multimodal.AudioCodec.makeWav(77L)
    assert(a.toSeq == Multimodal.AudioCodec.makeWav(77L).toSeq)
    val meta = Multimodal.AudioCodec.decode(a)
    assert(meta.isDefined)
    val (durMs, rate, ch) = meta.get
    assert(rate == 8000 && ch == 1 && durMs >= 200 && durMs <= 2000)
    // non-WAV bytes fall back to None (stub path), never throw
    assert(Multimodal.AudioCodec.decode("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("synthetic PNG generation is deterministic and really decodable") {
    val a = Multimodal.ImageCodec.makePng(123L)
    val b = Multimodal.ImageCodec.makePng(123L)
    assert(a.toSeq == b.toSeq)
    assert(Multimodal.ImageCodec.decode(a).isDefined)
  }

  test("frame-sample plan: every second, capped frames, video only") {
    val decoded = Multimodal.decodeAssets(spark, assets).toDF()
    val plan = Multimodal.sampleFramePlan(decoded, everyMs = 1000L, maxFrames = 32)
    val n = plan.count()
    assert(n > 0)
    val perAsset = plan.groupBy("asset_id").count().agg(max("count")).head.getLong(0)
    assert(perAsset <= 32)
    // joins back only to video assets
    val videoIds = decoded.filter(col("modality") === "video")
      .select("asset_id").collect().map(_.getLong(0)).toSet
    val planIds = plan.select("asset_id").distinct().collect().map(_.getLong(0)).toSet
    assert(planIds.subsetOf(videoIds))
  }

  test("segmentPlan: overlapping audio windows, capped, audio only") {
    val decoded = Multimodal.decodeAssets(spark, assets).toDF
    val plan = Multimodal.segmentPlan(decoded, windowMs = 2000, hopMs = 1000, maxSegments = 8)
    val rows = plan.collect()
    assert(rows.nonEmpty)
    // hop spacing and window bounds hold
    rows.groupBy(_.getLong(0)).foreach { case (_, segs) =>
      val sorted = segs.sortBy(_.getInt(1))
      assert(sorted.length <= 8)
      sorted.foreach { s =>
        assert(s.getLong(2) % 1000 == 0 && s.getLong(3) - s.getLong(2) <= 2000)
      }
    }
    // audio only
    val audioIds = decoded.filter(col("modality") === "audio")
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet.subsetOf(audioIds))
  }

  test("resizeAssets fits visual assets into the box, passes audio through") {
    val resized = Multimodal.resizeAssets(spark, assets, maxW = 128, maxH = 128)
      .collect()
    val visual = resized.filter(r => r.modality != "audio")
    assert(visual.nonEmpty)
    assert(visual.forall(r => r.width <= 128 && r.height <= 128 && r.width >= 1))
    // aspect ratio preserved within integer rounding
    val decoded = Multimodal.decodeAssets(spark, assets).collect()
      .map(d => d.asset_id -> d).toMap
    visual.foreach { r =>
      val d = decoded(r.asset_id)
      val expectScale = math.min(1.0, math.min(128.0 / d.width, 128.0 / d.height))
      assert(r.width == math.max(1, (d.width * expectScale).toInt))
      assert(r.height == math.max(1, (d.height * expectScale).toInt))
    }
    assert(resized.filter(_.modality == "audio").forall(r => r.width == 0 && r.height == 0))
  }

  private def structuredPng(seed: Long): Array[Byte] =
    Multimodal.ImageCodec.makeStructuredPng(seed)

  private def jitter(bytes: Array[Byte], delta: Int): Array[Byte] =
    Multimodal.ImageCodec.jitterPng(bytes, delta)

  test("pHash: invariant to re-encode, tolerant to jitter and resize, far across content") {
    val a = structuredPng(1)
    // PNG is lossless: decode → re-encode → identical pixels → bit 0
    val reenc = Multimodal.ImageCodec.encodePng(Multimodal.ImageCodec.decode(a).get)
    assert(Multimodal.ImageCodec.pHash(a) == Multimodal.ImageCodec.pHash(reenc))
    // ±2 pixel jitter barely moves low-frequency coefficients
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val hJit = ham(Multimodal.ImageCodec.pHash(a).get,
      Multimodal.ImageCodec.pHash(jitter(a, 2)).get)
    assert(hJit <= 3, s"jitter moved $hJit bits")
    // a half-resolution copy stays measurably closer than unrelated
    // content (SMOOTH rescaling phase-shifts the field, so bits near
    // the median threshold flip — resize robustness is partial, which
    // is the honest pHash contract; exact copies and jitter are the
    // tight cases above)
    val (half, _, _) = Multimodal.ImageCodec.resize(a, 32, 32).get
    val hRes = ham(Multimodal.ImageCodec.pHash(a).get,
      Multimodal.ImageCodec.pHash(half).get)
    val hDiff = ham(Multimodal.ImageCodec.pHash(a).get,
      Multimodal.ImageCodec.pHash(structuredPng(9)).get)
    assert(hRes <= 20, s"resize moved $hRes bits")
    assert(hDiff >= 16, s"unrelated images only $hDiff bits apart")
    assert(hRes < hDiff, s"resized copy ($hRes) not closer than unrelated ($hDiff)")
    assert(Multimodal.ImageCodec.pHash("not an image".getBytes).isEmpty)
  }

  test("incremental image near-dup equals the full pass minus history-internal pairs") {
    import spark.implicits._
    def png(i: Long) = structuredPng(i * 11 + 1)
    // history: assets 0..5; batch: jittered twins of 0..2 (ids 100..102)
    // plus an exact duplicate of history asset 3 (id 103)
    val history = (0L to 5L).map(i => (i, "image", png(i), "s", "image/png"))
      .toDF("asset_id", "modality", "content", "source", "mime")
    val batch = ((0L to 2L).map(i => (100L + i, "image", jitter(png(i), 2), "s", "image/png")) :+
      ((103L, "image", png(3), "s", "image/png")))
      .toDF("asset_id", "modality", "content", "source", "mime")

    val store = Multimodal.imagePHashes(spark, history)
    val incr = Multimodal.imageNearDupsIncremental(spark, batch, store, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Multimodal.imageNearDups(spark,
      history.unionByName(batch), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val historyIds = (0L to 5L).toSet
    val expected = full.filterNot { case (x, y) => historyIds(x) && historyIds(y) }
    assert(incr == expected,
      s"missing=${expected -- incr} extra=${incr -- expected}")
    assert(incr.contains((3L, 103L)), "exact duplicate of history must pair")
    assert(incr.forall { case (x, y) => !(historyIds(x) && historyIds(y)) })
  }

  test("aHash: deterministic, gain-invariant to jitter, far across clips, degenerate-safe") {
    val A = Multimodal.AudioCodec
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val h1 = A.aHash(A.makeStructuredWav(7)).get
    assert(h1 == A.aHash(A.makeStructuredWav(7)).get, "not deterministic")
    // volume jitter re-encodes most bytes but preserves the energy order
    val j = A.jitterWavGain(A.makeStructuredWav(7))
    assert(!java.util.Arrays.equals(j, A.makeStructuredWav(7)), "jitter must change bytes")
    assert(ham(h1, A.aHash(j).get) <= 3, s"jitter moved ${ham(h1, A.aHash(j).get)} bits")
    // unrelated clips land far apart
    val dists = (0 until 8).combinations(2).map { case Seq(x, y) =>
      ham(A.aHash(A.makeStructuredWav(x * 13 + 1)).get,
        A.aHash(A.makeStructuredWav(y * 13 + 1)).get)
    }.toSeq
    assert(dists.forall(_ > 10), s"unrelated clips too close: $dists")
    // undecodable / too-short input declines instead of throwing
    assert(A.aHash("not audio".getBytes("UTF-8")).isEmpty)
    assert(A.aHash(null).isEmpty)
  }

  test("audioNearDups finds gain-jittered twins; incremental equals full minus history-internal") {
    import spark.implicits._
    val A = Multimodal.AudioCodec
    def wav(i: Long) = A.makeStructuredWav(i * 13 + 1)
    val history = ((0L to 5L).map(i => (i, "audio", wav(i), "s", "audio/wav")) :+
      ((999L, "image", Multimodal.ImageCodec.makePng(5), "s", "image/png")))
      .toDF("asset_id", "modality", "content", "source", "mime")
    val batch = ((0L to 2L).map(i => (100L + i, "audio", A.jitterWavGain(wav(i)), "s", "audio/wav")) :+
      ((103L, "audio", wav(3), "s", "audio/wav")))
      .toDF("asset_id", "modality", "content", "source", "mime")

    val full = Multimodal.audioNearDups(spark, history.unionByName(batch), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((0L, 100L), (1L, 101L), (2L, 102L), (3L, 103L)).subsetOf(full),
      s"missing twins: $full")
    assert(full.forall { case (x, y) => y - x == 100 }, s"false positives: $full")

    val store = Multimodal.audioFingerprints(spark, history)
    val incr = Multimodal.audioNearDupsIncremental(spark, batch, store, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val historyIds = (0L to 5L).toSet
    val expected = full.filterNot { case (x, y) => historyIds(x) && historyIds(y) }
    assert(incr == expected, s"missing=${expected -- incr} extra=${incr -- expected}")
  }

  test("imageNearDups: banded pHash join finds jittered copies, never unrelated ones") {
    import spark.implicits._
    // 6 originals + jittered twins of the first three; audio row ignored
    val rows = (0 until 6).map(i =>
      (i.toLong, "image", structuredPng(i * 11 + 1), "s", "image/png")) ++
      (0 until 3).map(i =>
        (100L + i, "image", jitter(structuredPng(i * 11 + 1), 2), "s", "image/png")) :+
      ((999L, "audio", Multimodal.AudioCodec.makeWav(5), "s", "audio/wav"))
    val assets = rows.toDF("asset_id", "modality", "content", "source", "mime")

    val pairs = Multimodal.imageNearDups(spark, assets, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((0L, 100L), (1L, 101L), (2L, 102L)).subsetOf(pairs),
      s"missing jittered twins: $pairs")
    // no unrelated originals pair up
    assert(pairs.forall { case (x, y) => (y - x) == 100 },
      s"false positives: ${pairs.filterNot { case (x, y) => y - x == 100 }}")
  }
}
