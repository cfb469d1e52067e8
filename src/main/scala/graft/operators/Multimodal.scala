package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video modeled as opaque
  * `binary` payload columns with typed metadata, processed by
  * partition-mapped batch functions (the Scala analog of the
  * mapInPandas pattern).
  *
  * The actual media decode is STUBBED — this container has no image /
  * audio codecs — with a deterministic fake (metadata and features are
  * derived from a stable content hash). Everything around the stub is
  * real and tested: the binary schema, the typed metadata struct, the
  * `Dataset[T]` encoder plumbing, partition-preserving execution (no
  * shuffle for per-row media ops), and the explode shape for frame
  * sampling. Swapping the stub for a real codec changes only the bodies
  * marked `STUB`.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedRow(doc_id: Long, media_type: String, byte_len: Int,
      width: Int, height: Int, channels: Int)
  case class FeatureRow(doc_id: Long, feature: Array[Float])
  case class FrameRow(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Model documents as media blobs: payload = utf-8 bytes of the text
    * (stand-in for image/audio bytes), media_type from the source tag. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(lit("media/"), col("source")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  private def stableHash(bytes: Array[Byte]): Long = {
    // FNV-1a 64-bit — cheap, deterministic, dependency-free
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** "Decode" each payload into typed media metadata.
    * STUB: width/height/channels are derived from a content hash instead
    * of a real codec. Partition-mapped: no shuffle, constant memory per
    * batch — the shape a real decoder needs at 100 TB. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val h = stableHash(m.payload)                     // STUB decode
        DecodedRow(m.doc_id, m.media_type, m.payload.length,
          width = 64 + (math.abs(h) % 1024).toInt,
          height = 64 + (math.abs(h >> 16) % 1024).toInt,
          channels = 1 + (math.abs(h >> 32) % 4).toInt)
      }
    }
  }

  /** Feature extraction: payload → fixed-size float vector.
    * STUB: 8 floats from chunk hashes instead of a vision model. The
    * output schema (`array<float>`) plugs directly into
    * [[Similarity]] / [[Dedup.embeddingNearDup]]. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[FeatureRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val n = 8
        val f = new Array[Float](n)
        val step = math.max(1, m.payload.length / n)
        var i = 0
        while (i < n) {                                   // STUB features
          val from = math.min(i * step, m.payload.length)
          val until = math.min((i + 1) * step, m.payload.length)
          val h = stableHash(java.util.Arrays.copyOfRange(
            m.payload, from, until))
          f(i) = (h.toDouble / Long.MaxValue.toDouble).toFloat
          i += 1
        }
        FeatureRow(m.doc_id, f)
      }
    }
  }

  /** Frame sampling: treat the payload as a "video" and emit every k-th
    * fixed-size chunk as a frame row (explode shape: one row per frame,
    * ordered frame_idx). STUB: chunks instead of real frames. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameSize: Int = 256, everyK: Int = 4): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { m =>
      val nFrames = math.max(1, m.payload.length / frameSize)
      (0 until nFrames by everyK).map { idx =>
        val from = idx * frameSize
        val until = math.min(from + frameSize, m.payload.length)
        FrameRow(m.doc_id, idx,
          java.util.Arrays.copyOfRange(m.payload, from, until))
      }
    }
  }

  /** End-to-end pipeline used by the declared query: media modeling →
    * stubbed decode → per-type size/shape stats. Aggregation is plain
    * groupBy — fully distributed, no driver materialization. */
  def pipelineStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val decoded = decodeMeta(spark, asMedia(docs))
    decoded.groupBy("media_type")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("byte_len").cast("long")).as("total_bytes"),
        min("width").as("min_w"), max("width").as("max_w"),
        min("height").as("min_h"), max("height").as("max_h"))
      .orderBy("media_type")
  }
}
