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
