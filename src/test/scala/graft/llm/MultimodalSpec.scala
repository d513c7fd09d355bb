package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The multimodal plumbing contract: deterministic features, 1→N frame
  * sampling with iterator discipline, and resize keeping metadata and
  * payload in lockstep. The decode itself is a documented stub (no media
  * libs offline); these tests pin the Spark-side shapes a real decoder
  * would slot into. */
class MultimodalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def media = Multimodal.mediaFromDocuments(spark, sf)

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
