package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` columns with typed metadata, processed per-partition in
  * bounded batches.
  *
  * The actual byte→pixels/samples decode is STUBBED (`StubDecoder`): no
  * image/audio libraries exist in this container. Everything around the
  * stub — schema, batching, partition-local processing, deterministic
  * feature output — is real Spark and unit-tested; swapping `StubDecoder`
  * for a JNI/FFI decoder changes no plumbing.
  *
  * Scale design: `mapPartitions` keeps the decode zero-copy per executor
  * (no shuffle), media bytes never hit the driver, and feature extraction
  * emits fixed-width vectors so downstream operators (dedup, ANN — see
  * graft.queries.Llm) are column-oriented again.
  */
object Multimodal {

  /** One media item: opaque payload plus the typed metadata a catalog
    * would carry. */
  case class MediaRow(
      media_id: Long,
      modality: String,          // "image" | "audio" | "video"
      payload: Array[Byte],      // opaque encoded bytes
      width: Int,                // media-intrinsic metadata
      height: Int,
      sample_rate: Int)

  /** Deterministic decoded features (what a real decoder would emit). */
  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      checksum: Long,            // stand-in for a perceptual hash
      feature: Array[Float])     // fixed-width feature vector (dim 8)

  /** STUB: a real implementation decodes payload → pixels/samples and runs
    * feature extraction (resize, frame-sample, mel-spectrogram, …). This
    * deterministic fake preserves the interface: bounded memory, pure
    * function of the bytes. */
  object StubDecoder {
    val FeatureDim = 8
    def decode(r: MediaRow): MediaFeatures = {
      var crc = 1125899906842597L
      var i = 0
      while (i < r.payload.length) { crc = crc * 31 + (r.payload(i) & 0xff); i += 1 }
      val feat = new Array[Float](FeatureDim)
      i = 0
      while (i < r.payload.length) { feat(i % FeatureDim) += (r.payload(i) & 0xff) / 255.0f; i += 1 }
      MediaFeatures(r.media_id, r.modality, r.payload.length, crc, feat)
    }
  }

  /** The pipeline: partition-local decode in batches. Equivalent shape to
    * PySpark's mapInPandas(batch_fn) — here a typed mapPartitions with an
    * iterator (streaming, no partition materialization). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(StubDecoder.decode))
  }

  /** Entry point from an untyped DataFrame carrying a binary column. */
  def extractFeaturesDf(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    extractFeatures(df.as[MediaRow]).toDF()
  }

  /** One sampled video frame: the 1→N output of [[sampleFrames]]. */
  case class FrameRow(
      media_id: Long,
      frame_index: Int,          // index in the decoded frame sequence
      ts_millis: Long,           // presentation time of the frame
      frame_payload: Array[Byte],
      frame_checksum: Long)

  /** Frame sampling: every `everyNth` frame of each video row — the 1→N
    * cardinality-changing shape (decode → explode) that distinguishes
    * video plumbing from per-item transforms. Implemented as a typed
    * flatMap with an ITERATOR over frame indices, so memory per task is
    * one frame, not one video — the property that matters when a row is
    * a 10 GB clip. The stub "decoder" derives a deterministic frame
    * count and per-frame payload slice from the bytes; a real decoder
    * swaps in behind the same iterator contract. Non-video rows emit no
    * frames (a real pipeline routes them to [[extractFeatures]]). */
  def sampleFrames(media: Dataset[MediaRow], everyNth: Int): Dataset[FrameRow] = {
    require(everyNth > 0, "everyNth must be positive")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.modality != "video" || r.payload.length == 0) Iterator.empty
      else {
        val nFrames = r.payload.length / 100 + 1 // stub: ~1 frame per 100 bytes
        Iterator.range(0, nFrames, everyNth).map { fi =>
          val start = (fi * 100) % r.payload.length
          val slice = r.payload.slice(start, math.min(start + 100, r.payload.length))
          var crc = 1125899906842597L
          var i = 0
          while (i < slice.length) { crc = crc * 31 + (slice(i) & 0xff); i += 1 }
          FrameRow(r.media_id, fi, fi * 40L, slice, crc) // 25 fps → 40 ms/frame
        }
      }
    }
  }

  /** Resize: per-item payload transform preserving the MediaRow schema —
    * the in-place map shape (decode → scale → re-encode). The stub
    * "resampler" keeps every kth byte so output size tracks the target
    * dimensions deterministically; metadata is updated in lockstep with
    * the payload, which is the actual contract a catalog depends on. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.modality != "image" || r.width <= 0 || r.height <= 0) r
      else {
        val scale = math.max(1, math.ceil(
          (r.width.toLong * r.height) / math.max(1.0, targetW.toLong * targetH)).toInt)
        val resampled = Array.range(0, r.payload.length, scale).map(r.payload)
        r.copy(payload = resampled, width = math.min(r.width, targetW),
          height = math.min(r.height, targetH))
      }
    }
  }

  /** Synthesizes a media table from the documents fixture (text bytes as
    * the opaque payload) — the test harness for the plumbing above. */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
        col("text").cast("binary").as("payload"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit(16000).as("sample_rate"))
      .as[MediaRow]
  }
}
