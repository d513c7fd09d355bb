package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The multimodal plumbing contract: deterministic features, 1→N frame
  * sampling with iterator discipline, and resize keeping metadata and
  * payload in lockstep. Image (javax.imageio) and audio
  * (javax.sound.sampled) decode are REAL and pinned at the pixel/sample
  * level; only video decode is a documented stub (no codecs offline) —
  * those tests pin the Spark-side shapes a real decoder slots into. */
class MultimodalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def media = Multimodal.mediaFromDocuments(spark, sf)

  test("ImageDecoder decodes a REAL PNG: dims, histogram and checksum come from pixels") {
    // known pixel content: 8×8, left half black (luma 0 -> bin 0), right
    // half white (luma 255 -> bin 7)
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    Multimodal.ImageDecoder.looksLikeImage(png) shouldBe true
    val f = Multimodal.ImageDecoder
      .decode(Multimodal.MediaRow(1L, "image", png, 8, 8, 0)).get
    f.n_bytes shouldBe png.length
    f.feature(0) shouldBe 0.5f          // 32 black pixels of 64
    f.feature(7) shouldBe 0.5f          // 32 white pixels of 64
    (1 to 6).foreach(b => f.feature(b) shouldBe 0.0f)
    // checksum is a function of pixel CONTENT: identical pixels encoded
    // as a different byte stream must produce the same checksum
    val baos2 = new java.io.ByteArrayOutputStream()
    val img2 = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_ARGB) // different encoding
    for (y <- 0 until 8; x <- 0 until 8)
      img2.setRGB(x, y, 0xff000000 | (if (x < 4) 0x000000 else 0xffffff))
    javax.imageio.ImageIO.write(img2, "png", baos2)
    val f2 = Multimodal.ImageDecoder
      .decode(Multimodal.MediaRow(2L, "image", baos2.toByteArray, 8, 8, 0)).get
    f2.checksum shouldBe f.checksum
    // garbage bytes are rejected, not thrown
    Multimodal.ImageDecoder
      .decode(Multimodal.MediaRow(3L, "image", Array[Byte](1, 2, 3, 4, 5), 0, 0, 0)) shouldBe None
  }

  test("image rows carry decodable PNGs; their features are pixel histograms") {
    val feats = Multimodal.extractFeatures(media).collect()
      .filter(_.modality == "image")
    feats should not be empty
    feats.foreach { f =>
      // a luma histogram sums to 1 over the 8 bins — the stub's byte-sum
      // features do not; this pins that the REAL decode path ran
      f.feature.sum shouldBe 1.0f +- 1e-4f
    }
    // and the payloads really are PNGs with the declared dimensions
    media.collect().filter(_.modality == "image").take(5).foreach { r =>
      Multimodal.ImageDecoder.looksLikeImage(r.payload) shouldBe true
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      img.getWidth shouldBe r.width
      img.getHeight shouldBe r.height
    }
  }

  test("AudioDecoder decodes a REAL WAV: pinned values from known samples") {
    // hand-built WAV (independent of syntheticWav's builder): 16 kHz mono
    // 16-bit PCM, 100 frames of constant amplitude +16384 (= 0.5 full
    // scale) → every sample lands in histogram bin 4, RMS = exactly 0.5
    val n = 100
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(32000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(2 * n)
    (0 until n).foreach(_ => bb.putShort(16384))
    val wav = bb.array()
    Multimodal.AudioDecoder.looksLikeWav(wav) shouldBe true
    val a = Multimodal.AudioDecoder
      .describe(Multimodal.MediaRow(1L, "audio", wav, 0, 0, 16000)).get
    a.n_bytes shouldBe wav.length
    a.sample_rate shouldBe 16000
    a.channels shouldBe 1
    a.n_samples shouldBe 100L
    a.duration_ms shouldBe 6L           // 100·1000/16000 = 6 (integer)
    a.rms_milli shouldBe 500L           // |16384/32768| = 0.5 exactly
    a.feature(4) shouldBe 1.0f          // 0.5·8 = bin 4, all 100 samples
    (0 to 7).filter(_ != 4).foreach(b => a.feature(b) shouldBe 0.0f)
    // full-scale negative lands in the top bin (|−32768|/32768 = 1 clamps)
    val bb2 = java.nio.ByteBuffer.allocate(44 + 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.put("RIFF".getBytes("US-ASCII")).putInt(38)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(32000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(2)
    bb2.putShort(Short.MinValue)
    val a2 = Multimodal.AudioDecoder
      .describe(Multimodal.MediaRow(2L, "audio", bb2.array(), 0, 0, 16000)).get
    a2.feature(7) shouldBe 1.0f
    a2.rms_milli shouldBe 1000L
  }

  test("syntheticWav round-trips through the decoder with oracle-computable facts") {
    val seed = 5L
    val wav = Multimodal.syntheticWav(seed)
    // decoded facts match the pure-integer functions q188's oracle uses
    val a = Multimodal.AudioDecoder
      .describe(Multimodal.MediaRow(seed, "audio", wav, 0, 0, 16000)).get
    val expSamples = Multimodal.syntheticWavSamples(seed) // 256 + 5 = 261
    expSamples shouldBe 261
    a.n_samples shouldBe expSamples.toLong
    a.n_bytes shouldBe 44 + 2 * expSamples
    a.sample_rate shouldBe 16000
    a.duration_ms shouldBe expSamples * 1000L / 16000
    a.feature.sum shouldBe 1.0f +- 1e-4f // normalized histogram ⇒ real samples
    a.rms_milli should (be >= 1L and be <= 999L)
    // deterministic: same seed, same bytes, same checksum
    Multimodal.syntheticWav(seed).toSeq shouldBe wav.toSeq
    val b = Multimodal.AudioDecoder
      .describe(Multimodal.MediaRow(seed, "audio", wav, 0, 0, 16000)).get
    b.checksum shouldBe a.checksum
  }

  test("corrupt WAV bodies degrade to the stub, not a task failure") {
    import spark.implicits._
    // valid RIFF/WAVE magic, garbage chunk body — passes the sniff,
    // fails the javax.sound parser
    val corrupt = "RIFFxxxxWAVE".getBytes("US-ASCII") ++ Array.fill[Byte](32)(0x5a)
    Multimodal.AudioDecoder.looksLikeWav(corrupt) shouldBe true
    Multimodal.AudioDecoder.describe(
      Multimodal.MediaRow(9L, "audio", corrupt, 0, 0, 16000)) shouldBe None
    val ds = spark.createDataset(Seq(Multimodal.MediaRow(9L, "audio", corrupt, 0, 0, 16000)))
    val f = Multimodal.extractFeatures(ds).collect().head
    f.n_bytes shouldBe corrupt.length   // stub fallback ran
    // describeAudio quarantines the row instead of dying
    Multimodal.describeAudio(ds).collect() shouldBe empty
  }

  test("audio rows carry decodable WAVs; their features are sample histograms") {
    val feats = Multimodal.extractFeatures(media).collect()
      .filter(_.modality == "audio")
    feats should not be empty
    // an amplitude histogram sums to 1 over the 8 bins — the stub's
    // byte-fold features do not; this pins that the REAL decode path ran
    feats.foreach(f => f.feature.sum shouldBe 1.0f +- 1e-4f)
  }

  test("corrupt image bodies degrade to the stub on BOTH decode and resize paths") {
    import spark.implicits._
    // valid PNG magic, garbage body — passes the sniff, fails the reader
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++
      Array.fill[Byte](64)(0x5a)
    Multimodal.ImageDecoder.looksLikeImage(corrupt) shouldBe true
    Multimodal.ImageDecoder.decode(
      Multimodal.MediaRow(9L, "image", corrupt, 100, 80, 0)) shouldBe None
    // extractFeatures falls back to the stub instead of failing the task
    val ds = spark.createDataset(Seq(Multimodal.MediaRow(9L, "image", corrupt, 100, 80, 0)))
    val f = Multimodal.extractFeatures(ds).collect().head
    f.n_bytes shouldBe corrupt.length
    // resize falls back to byte decimation WITH clamped metadata — the
    // target-box contract holds even for undecodable bytes
    val out = Multimodal.resize(ds, targetW = 16, targetH = 16).collect().head
    out.width should be <= 16
    out.height should be <= 16
    out.payload.length should be <= corrupt.length
  }

  test("resize REALLY downscales a decodable PNG and metadata tracks the raster") {
    import spark.implicits._
    val big = Multimodal.syntheticPng(seed = 42L, w = 64, h = 48)
    val ds = spark.createDataset(Seq(Multimodal.MediaRow(7L, "image", big, 64, 48, 0)))
    val out = Multimodal.resize(ds, targetW = 16, targetH = 16).collect().head
    out.width shouldBe 16               // aspect preserved: 64×48 -> 16×12
    out.height shouldBe 12
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.payload))
    decoded.getWidth shouldBe 16
    decoded.getHeight shouldBe 12
    out.payload.length should be < big.length
    // already-in-box images pass through without re-encoding
    val small = Multimodal.resize(ds, targetW = 128, targetH = 128).collect().head
    small.payload shouldBe big
  }

  test("feature extraction is deterministic and never moves bytes to the driver plan") {
    val a = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    a.map(_.checksum).toSeq shouldBe b.map(_.checksum).toSeq
    a.foreach(f => f.feature.length shouldBe Multimodal.StubDecoder.FeatureDim)
  }

  test("sampleFrames: 1→N cardinality, only videos, every-nth selection") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(media, everyNth = 3)
    val byId = frames.collect().groupBy(_.media_id)
    // only video rows emit frames
    val videoIds = media.filter(_.modality == "video").map(_.media_id).collect().toSet
    byId.keySet.subsetOf(videoIds) shouldBe true
    byId.nonEmpty shouldBe true
    byId.values.foreach { fs =>
      // indices are 0, 3, 6, ... (every 3rd), each with 40 ms spacing
      fs.map(_.frame_index).sorted.toSeq shouldBe
        fs.map(_.frame_index).sorted.toSeq.indices.map(_ * 3)
      fs.foreach(f => f.ts_millis shouldBe f.frame_index * 40L)
    }
    // expected total frame count from the stub's bytes→frames rule
    val expected = media.filter(_.modality == "video").collect()
      .filter(_.payload.nonEmpty)
      .map(r => (r.payload.length / 100 + 1 + 2) / 3).sum
    frames.count() shouldBe expected
  }

  test("resize: payload shrinks with the target box and metadata follows") {
    import spark.implicits._
    val resized = Multimodal.resize(media, targetW = 64, targetH = 64)
    val before = media.filter(_.modality == "image").collect().map(r => r.media_id -> r).toMap
    resized.filter(_.modality == "image").collect().foreach { r =>
      val orig = before(r.media_id)
      r.width should be <= 64
      r.height should be <= 64
      r.payload.length should be <= orig.payload.length
      if (orig.width > 0 && orig.height > 0 && orig.width.toLong * orig.height > 64L * 64)
        r.payload.length should be < orig.payload.length
    }
    // non-images pass through untouched
    val audioBefore = media.filter(_.modality == "audio").collect().map(_.payload.length).sorted
    val audioAfter = resized.filter(_.modality == "audio").collect().map(_.payload.length).sorted
    audioAfter.toSeq shouldBe audioBefore.toSeq
  }
}
