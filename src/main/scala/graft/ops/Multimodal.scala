package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque
 * `binary` columns with typed metadata — the Spark-side analog of the
 * reference's five justification modalities (Text/Image/KeyFrameVideo/
 * ShotVideo/Audio with bounding boxes and timestamps,
 * /root/reference/update_kg/sparqls.py:115-164, turtle templates
 * update_kg/Updater.py:385-485).
 *
 * The decode/feature-extract kernels are STUBBED with a deterministic
 * fake (this container ships no image/audio codecs); the Spark-side
 * contract — schema, batch shape, partition-parallel mapPartitions,
 * failure capture — is real and tested. Swapping the stub for a JNI/
 * codec call changes only `decodeKernel`.
 */
object Multimodal {

  /** Typed media row: payload + modality metadata (sparse by modality,
    * like the reference's ij CSV — update_kg/Updater.py:360-487). */
  final case class MediaRow(
      media_id: String,
      modality: String, // image | audio | video
      payload: Array[Byte],
      width: Int, // image/video; 0 otherwise
      height: Int,
      duration_ms: Long, // audio/video; 0 otherwise
      source_doc: String)

  /** Extracted features: fixed-size embedding + decode status. */
  final case class MediaFeatures(
      media_id: String,
      modality: String,
      n_bytes: Int,
      embedding: Array[Float],
      ok: Boolean,
      error: String)

  val EmbeddingDim = 16

  /** STUB decode/feature kernel — deterministic bytes→features fake.
    * Real implementation would decode (JPEG/PCM/H.264) and run a
    * feature net; marked intentionally. */
  private[ops] def decodeKernel(payload: Array[Byte]): Array[Float] = {
    // deterministic fake: chunked byte sums, L2-normalized
    val acc = new Array[Float](EmbeddingDim)
    var i = 0
    while (i < payload.length) {
      acc(i % EmbeddingDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.sqrt(acc.map(v => v * v).sum).toFloat
    if (n == 0f) acc else acc.map(_ / n)
  }

  /** Partition-parallel feature extraction over binary payloads.
    * mapPartitions (not per-row map) so a real kernel can amortize
    * codec/model init per partition — the batch shape a Pandas-UDF /
    * mapInPandas port would use. Failures are captured per row, not
    * thrown (reference fail.log semantics,
    * json_head/get_json_head.py:96-110). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init point for a real codec/model handle
      rows.map { r =>
        try {
          val emb = decodeKernel(if (r.payload == null) Array.emptyByteArray else r.payload)
          MediaFeatures(r.media_id, r.modality,
            if (r.payload == null) 0 else r.payload.length, emb, ok = true, null)
        } catch {
          case e: Exception =>
            MediaFeatures(r.media_id, r.modality, 0, new Array[Float](EmbeddingDim),
              ok = false, e.getMessage)
        }
      }
    }
  }

  /** Deterministic synthetic media table (payload = seeded bytes) for
    * tests/benches — no external data. */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val mod = Array("image", "audio", "video").apply((i % 3).toInt)
      val len = 64 + (Math.floorMod(i * 2654435761L + seed, 192L)).toInt
      val payload = Array.tabulate(len)(j =>
        ((i * 31 + j * 7 + seed) % 251).toByte)
      MediaRow(f"m$i%06d", mod, payload,
        if (mod != "audio") 64 else 0, if (mod != "audio") 48 else 0,
        if (mod != "image") 1000 + (i % 9000) else 0, f"doc${i % 97}%04d")
    }
  }

  /** Frame-sampling plumbing for video: one row per sampled frame
    * index (stride sampling), ready for a per-frame decode. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("modality") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), greatest(col("duration_ms") - 1, lit(0L)), lit(everyMs))))
      .select(col("media_id"), col("frame_ms"), col("payload"))
}
