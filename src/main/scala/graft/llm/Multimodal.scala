package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` columns with typed metadata, processed per-partition in
  * bounded batches.
  *
  * The IMAGE decode path is REAL: `ImageDecoder` decodes PNG/JPEG bytes
  * with `javax.imageio` (in the JDK — zero new dependencies) into actual
  * pixel dimensions plus a luma histogram feature vector. The AUDIO
  * decode path is REAL for WAV/PCM: `AudioDecoder` parses RIFF/WAVE
  * bytes with `javax.sound.sampled` (also JDK-only) into sample rate,
  * channel count, frame count, duration, RMS loudness and a normalized
  * 8-bin amplitude histogram. Only VIDEO decode remains STUBBED
  * (`StubDecoder`): no video codec libraries exist in this container.
  * Everything around the decoders — schema, batching, partition-local
  * processing, deterministic feature output — is identical for all three
  * paths, so swapping the video stub for an FFI codec changes no
  * plumbing.
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

  /** STUB (video, plus images/audio whose bytes are not decodable
    * PNG/JPEG/WAV): a real implementation decodes payload → frames and
    * runs feature extraction. This deterministic fake preserves the
    * interface: bounded memory, pure function of the bytes. */
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

  /** REAL image decode via `javax.imageio` (JDK-only): PNG/JPEG bytes →
    * pixels → an 8-bin LUMA HISTOGRAM feature (each bin the fraction of
    * pixels whose Rec.601 luma falls in [32·b, 32·(b+1))) plus a
    * pixel-content checksum (a perceptual-hash stand-in: identical pixel
    * content ⇒ identical checksum regardless of how the file was
    * encoded). Bounded memory: one decoded image per task at a time —
    * the same contract as the stub. */
  object ImageDecoder {
    val FeatureDim: Int = StubDecoder.FeatureDim

    // in-memory ImageInputStreams: skip ImageIO's temp-file cache (one
    // file create/delete per decoded row otherwise — pure overhead for
    // byte-array payloads)
    javax.imageio.ImageIO.setUseCache(false)

    /** Cheap magic-byte sniff so obviously-non-image payloads skip the
      * ImageIO reader search. PNG: 89 50 4E 47; JPEG: FF D8 FF. */
    def looksLikeImage(b: Array[Byte]): Boolean =
      (b.length >= 4 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b.length >= 3 &&
        (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff)

    /** None when the bytes are not a decodable image — caller falls back
      * to the stub, so a corrupt file degrades instead of failing the
      * task (the behavior a 100 TB ingest needs: quarantine, not crash).
      * Catches ALL non-fatal throwables, not just IOException: the JDK
      * readers throw RuntimeExceptions on malformed input (CMMException
      * for bad ICC profiles, ArrayIndexOutOfBounds/NegativeArraySize in
      * the JPEG reader) and any of them escaping kills the task. */
    def decode(r: MediaRow): Option[MediaFeatures] = {
      if (!looksLikeImage(r.payload)) None
      else try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val hist = new Array[Float](FeatureDim)
          var crc = 1125899906842597L
          // one row per getRGB call, not one pixel: the per-pixel form
          // pays a ColorModel conversion round-trip per call (~10-50×
          // slower) — this loop is the decode kernel at ingest scale.
          // Memory stays bounded: one int row (4·w bytes) per task.
          val rowBuf = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, rowBuf, 0, w)
            var x = 0
            while (x < w) {
              val rgb = rowBuf(x)
              val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000
              hist(math.min(lum >> 5, FeatureDim - 1)) += 1f
              crc = crc * 31 + lum
              x += 1
            }
            y += 1
          }
          val n = math.max(1, w * h).toFloat
          var b = 0
          while (b < FeatureDim) { hist(b) /= n; b += 1 }
          Some(MediaFeatures(r.media_id, r.modality, r.payload.length, crc, hist))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Full decoded-audio description — what [[AudioDecoder.describe]]
    * extracts from real WAV bytes. `feature` is the normalized 8-bin
    * amplitude histogram (bin b = fraction of samples with |amplitude|
    * in [b/8, (b+1)/8)), which sums to 1 exactly like the image luma
    * histogram — so the same in-query "histogram normalizes" certificate
    * proves real samples were decoded. */
  case class AudioFeatures(
      media_id: Long,
      n_bytes: Int,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,           // PCM frames per channel
      duration_ms: Long,         // n_samples · 1000 / sample_rate, exact int
      rms_milli: Long,           // round(RMS amplitude · 1000), RMS ∈ [0,1]
      checksum: Long,            // over decoded sample VALUES, not file bytes
      feature: Array[Float])

  /** REAL audio decode via `javax.sound.sampled` (JDK-only — the same
    * zero-dependency move that made image decode real): RIFF/WAVE bytes
    * → 16-bit PCM samples → rate/channels/frames/duration plus RMS
    * loudness and the normalized amplitude histogram. Bounded memory:
    * one decoded clip per task at a time, same contract as the other
    * decoders. Undecodable or non-PCM16 payloads return None and the
    * caller quarantines to the stub — degrade, don't crash, the 100 TB
    * ingest contract. */
  object AudioDecoder {
    val FeatureDim: Int = StubDecoder.FeatureDim

    /** Magic sniff: RIFF....WAVE. */
    def looksLikeWav(b: Array[Byte]): Boolean =
      b.length >= 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    def describe(r: MediaRow): Option[AudioFeatures] = {
      if (!looksLikeWav(r.payload)) None
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        try {
          val fmt = in.getFormat
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            || fmt.getSampleSizeInBits != 16 || fmt.getChannels < 1) None
          else {
            val pcm = in.readAllBytes()
            val big = fmt.isBigEndian
            val nSamp = pcm.length / 2 // 16-bit samples across all channels
            val hist = new Array[Float](FeatureDim)
            var crc = 1125899906842597L
            var sumSq = 0.0
            var i = 0
            while (i < nSamp) {
              val s: Int =
                if (big) ((pcm(2 * i) << 8) | (pcm(2 * i + 1) & 0xff)).toShort.toInt
                else ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort.toInt
              val a = math.abs(s / 32768.0)
              hist(math.min((a * FeatureDim).toInt, FeatureDim - 1)) += 1f
              sumSq += (s / 32768.0) * (s / 32768.0)
              crc = crc * 31 + (s & 0xffff)
              i += 1
            }
            if (nSamp == 0) None
            else {
              var b = 0
              while (b < FeatureDim) { hist(b) /= nSamp.toFloat; b += 1 }
              val frames = nSamp.toLong / fmt.getChannels
              val rate = fmt.getSampleRate.toInt
              Some(AudioFeatures(r.media_id, r.payload.length, rate,
                fmt.getChannels, frames, frames * 1000L / rate,
                math.round(math.sqrt(sumSq / nSamp) * 1000.0), crc, hist))
            }
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** The [[MediaFeatures]]-shaped view, for the shared routing path. */
    def decode(r: MediaRow): Option[MediaFeatures] =
      describe(r).map(a =>
        MediaFeatures(r.media_id, r.modality, r.payload.length, a.checksum, a.feature))
  }

  /** Per-row decode routing: images through the real `ImageDecoder`,
    * audio through the real `AudioDecoder` (stub fallback for
    * undecodable bytes on both), video through the stub. */
  def decodeRow(r: MediaRow): MediaFeatures =
    if (r.modality == "image") ImageDecoder.decode(r).getOrElse(StubDecoder.decode(r))
    else if (r.modality == "audio") AudioDecoder.decode(r).getOrElse(StubDecoder.decode(r))
    else StubDecoder.decode(r)

  /** Partition-local audio description over a media table — the typed
    * 1→≤1 shape (rows that fail the decode are quarantined out, the
    * per-row equivalent of a bad-records sink). */
  def describeAudio(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(AudioDecoder.describe))
  }

  /** The pipeline: partition-local decode in batches. Equivalent shape to
    * PySpark's mapInPandas(batch_fn) — here a typed mapPartitions with an
    * iterator (streaming, no partition materialization). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeRow))
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
    * the in-place map shape (decode → scale → re-encode). Decodable
    * PNG/JPEG payloads take the REAL path: ImageIO decode →
    * aspect-preserving area-averaged downscale → PNG re-encode, with
    * metadata updated from the actual output raster. Non-decodable image
    * payloads fall back to the byte-decimation stub so the schema
    * contract (payload and metadata move in lockstep) holds for every
    * row. Images already inside the target box pass through unchanged —
    * no decode, no re-encode. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.modality != "image" || r.width <= 0 || r.height <= 0) r
      else resizeReal(r, targetW, targetH).getOrElse {
        // stub fallback — non-image bytes AND corrupt/undecodable image
        // bytes land here, so every row keeps the contract: payload
        // shrinks, metadata clamps to the target box, the task never
        // dies on one bad file
        val scale = math.max(1, math.ceil(
          (r.width.toLong * r.height).toDouble /
            math.max(1.0, (targetW.toLong * targetH).toDouble)).toInt)
        val resampled = Array.range(0, r.payload.length, scale).map(r.payload)
        r.copy(payload = resampled, width = math.min(r.width, targetW),
          height = math.min(r.height, targetH))
      }
    }
  }

  /** None when the payload is not a decodable image (wrong magic, null
    * reader result, or any non-fatal decoder throw — the JDK readers
    * throw RuntimeExceptions on malformed bodies); the caller then takes
    * the stub-decimation branch, same quarantine contract as
    * [[ImageDecoder.decode]]. */
  private def resizeReal(r: MediaRow, targetW: Int, targetH: Int): Option[MediaRow] = {
    if (!ImageDecoder.looksLikeImage(r.payload)) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      if (img == null) None
      else if (img.getWidth <= targetW && img.getHeight <= targetH)
        Some(r.copy(width = img.getWidth, height = img.getHeight))
      else {
        val f = math.min(targetW.toDouble / img.getWidth, targetH.toDouble / img.getHeight)
        val nw = math.max(1, math.round(img.getWidth * f).toInt)
        val nh = math.max(1, math.round(img.getHeight * f).toInt)
        // area-averaging filter: deterministic pure-Java resample in the JDK
        val scaled = img.getScaledInstance(nw, nh, java.awt.Image.SCALE_AREA_AVERAGING)
        val out = new java.awt.image.BufferedImage(
          nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(scaled, 0, 0, null) finally g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        Some(r.copy(payload = baos.toByteArray, width = nw, height = nh))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic tiny PNG (16×12 RGB): pixel values from a 64-bit LCG
    * seeded by `seed`, encoded with the JDK PNG writer. A pure function
    * of the seed — re-runs produce identical pixel content. */
  def syntheticPng(seed: Long, w: Int = 16, h: Int = 12): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = seed
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        s = s * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, (s >>> 40).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Number of PCM frames in [[syntheticWav]] for a given seed — a pure
    * integer function shared with the q188 oracle, which recomputes the
    * expected byte/frame counts from doc_id alone. */
  def syntheticWavSamples(seed: Long): Int = (256 + math.floorMod(seed, 64)).toInt

  /** Deterministic mono 16-bit PCM WAV: `syntheticWavSamples(seed)`
    * frames from a 64-bit LCG, wrapped in a minimal 44-byte RIFF/WAVE
    * header. A pure function of the seed — re-runs produce identical
    * samples — so the decoded frame count, byte count and duration are
    * all oracle-computable from doc_id. */
  def syntheticWav(seed: Long, sampleRate: Int = 16000): Array[Byte] = {
    val n = syntheticWavSamples(seed)
    val data = new Array[Byte](n * 2)
    var s = seed
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val v = (s >>> 48).toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                       // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)     // byte rate
      .putShort(2).putShort(16)                      // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    bb.array()
  }

  /** Synthesizes a media table from the documents fixture — the test
    * harness for the plumbing above. IMAGE rows carry REAL PNG payloads
    * (deterministic 16×12 pixels seeded by doc_id, encoded with the JDK
    * PNG writer on the executor), so the q62 feature path decodes actual
    * pixels; AUDIO rows carry REAL WAV payloads (deterministic 16 kHz
    * mono PCM seeded by doc_id) for the q188 audio path; video rows
    * carry the document's text bytes as an opaque stand-in payload for
    * the stub path. */
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
      .map { r =>
        if (r.modality == "image")
          r.copy(payload = syntheticPng(r.media_id), width = 16, height = 12)
        else if (r.modality == "audio")
          r.copy(payload = syntheticWav(r.media_id))
        else r
      }
  }
}
