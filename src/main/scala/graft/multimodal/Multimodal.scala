package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus typed metadata, processed batch-at-a-time with
  * `mapPartitions` over typed Datasets (the Scala analogue of
  * mapInPandas — one JVM iterator per partition, no per-row UDF overhead,
  * arbitrary native/library calls inside).
  *
  * The actual codec work is STUBBED (no image/audio libraries in this
  * environment): `FakeCodec` derives deterministic pseudo-metadata and
  * pseudo-features from the bytes, so the Spark-side plumbing — schema,
  * partitioning, batch iteration shape, output schema — is real and
  * tested, and the codec body is the only thing to swap for production.
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

  /** STUB codec — deterministic fake standing in for a real decoder
    * (??? boundary). Production: replace body with e.g. javax.imageio /
    * ffmpeg bindings; signature and batch shape stay identical.
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
          val (w, h, dur, frames) = FakeCodec.decode(a.modality, a.content)
          DecodedAsset(a.asset_id, a.modality, w, h, dur, frames,
            FakeCodec.features(a.content, featureDim))
        }
      }
  }

  final case class ResizedAsset(
      asset_id: Long,
      modality: String,
      width: Int,
      height: Int,
      content: Array[Byte])

  /** Resize image/video assets to a target box, batch-at-a-time. The
    * pixel work is the STUB (???-boundary: FakeCodec scales the fake
    * dimensions and re-hashes bytes deterministically); the distributed
    * shape — typed Dataset in, mapPartitions, typed Dataset out, non-image
    * rows passed through untouched — is the real contract.
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
          val (w, h, _, _) = FakeCodec.decode(a.modality, a.content)
          if (a.modality == "audio") ResizedAsset(a.asset_id, a.modality, 0, 0, a.content)
          else {
            // aspect-preserving fit into (maxW, maxH) — real math, fake pixels
            val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
            val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
            ResizedAsset(a.asset_id, a.modality, nw, nh, a.content)
          }
        }
      }
  }

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
    * benches exercise the binary plumbing without real media. Bytes are the
    * UTF-8 of a seed string; modality round-robins.
    */
  def syntheticAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      encode(col(textCol), "UTF-8").as("content"),
      lit("synthetic").as("source"),
      lit("application/octet-stream").as("mime"))
}
