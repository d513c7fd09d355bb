package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The anisotropic demonstration family (q242–q245): round 8 proved the
  * FIXTURE is near-isotropic (q238 explained_share 0.0219 ≈ the 1/64
  * floor) and that residual encoding / rotation therefore cannot lift
  * recall there — an honest negative. These rows supply the positive
  * case on a deterministic low-rank corpus, and this spec pins the
  * STRICT inequalities that make it a demonstration rather than a
  * measurement that happened to go the right way. The corpus is
  * sf-independent (generated from range()), so these values are
  * constants of the build, not of the fixture scale. */
class AnisoSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q242: the demonstration corpus measures strongly anisotropic (explained_share near 1)") {
    val r = SparkEntry.queries("q242_aniso_pca")(spark, sf).head()
    val share = r.getAs[Double]("explained_share")
    info(s"explained_share = $share (fixture: 0.0219, isotropy floor 1/64 = 0.0156)")
    share should be > 0.9
  }

  test("q243: residual encoding lifts recall STRICTLY above the raw floor at the identical scan set") {
    val r = SparkEntry.queries("q243_aniso_residual_lift")(spark, sf).head()
    val raw = r.getAs[Double]("recall_raw")
    val res = r.getAs[Double]("recall_residual")
    info(s"raw IVFADC recall@10 = $raw, residual = $res, scan_frac = ${r.getAs[Double]("scan_frac")}")
    res should be > raw
    // and the lift is substantial, not a one-vector fluke
    res - raw should be >= 0.1
  }

  test("q245 vs q244: whiten-then-quantize (ABTT → PQ) lifts search recall STRICTLY above the raw-space floor") {
    val raw = SparkEntry.queries("q244_aniso_pq_raw_recall")(spark, sf).head().getAs[Double]("recall")
    val abtt = SparkEntry.queries("q245_aniso_pq_abtt_recall")(spark, sf).head().getAs[Double]("recall")
    info(s"raw-space ADC recall@10 = $raw, ABTT-space = $abtt")
    abtt should be > raw
  }

  test("determinism: both lift rows reproduce bit-identically on a rerun") {
    val a = SparkEntry.queries("q243_aniso_residual_lift")(spark, sf).head().toString
    val b = SparkEntry.queries("q243_aniso_residual_lift")(spark, sf).head().toString
    a shouldBe b
  }
}
