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

  test("q250 vs q245 vs q252: the learned ROTATION lifts strictly above the ABTT floor; a second PROJECTION pass falls strictly below it") {
    val abtt = SparkEntry.queries("q245_aniso_pq_abtt_recall")(spark, sf).head().getAs[Double]("recall")
    val align = SparkEntry.queries("q250_aniso_align_recall")(spark, sf).head().getAs[Double]("recall")
    val defl = SparkEntry.queries("q252_aniso_topr_recall")(spark, sf).head().getAs[Double]("recall")
    info(s"ABTT recall@10 = $abtt, ABTT+align (q250) = $align, ABTT+deflate2 (q252) = $defl")
    align should be > abtt   // rotating the class subspace into one PQ subspace gains
    defl should be < abtt    // projecting the same direction OUT loses ranking signal
    align should be > defl
  }

  test("q257 vs q250: one codebook-aware OPQ alternation step falls STRICTLY below the one-shot alignment (the graded negative)") {
    val align = SparkEntry.queries("q250_aniso_align_recall")(spark, sf).head().getAs[Double]("recall")
    val opq = SparkEntry.queries("q257_aniso_opq_recall")(spark, sf).head().getAs[Double]("recall")
    val abtt = SparkEntry.queries("q245_aniso_pq_abtt_recall")(spark, sf).head().getAs[Double]("recall")
    info(s"ABTT = $abtt, align (q250) = $align, align+OPQ-step (q257) = $opq")
    opq should be < align     // the error-driven reflection loses what alignment gained
    opq should be > 0.7       // ...but stays a working operating point, not a collapse
    // the trajectory bounces INSIDE the drop (0.81/0.83/0.81 at 1/2/3
    // steps — BASELINE.md); deeper stacks never re-reach the one-shot
    // optimum, which is the whole finding
    val opq2 = graft.queries.VectorQuant.opqProbeCert(spark, 2).head().getAs[Double]("recall")
    opq2 should be < align
  }

  test("q251: the identical rotation pipeline on the near-isotropic FIXTURE does not lift (honest no-lift twin)") {
    val raw = SparkEntry.queries("q219_adc_recall")(spark, sf).head().getAs[Double]("recall")
    val aligned = SparkEntry.queries("q251_fixture_align_recall")(spark, sf).head().getAs[Double]("recall")
    info(s"fixture raw ADC recall@10 = $raw, ABTT+align = $aligned")
    aligned should be <= raw          // no class subspace to concentrate — nothing to gain
    (raw - aligned) should be <= 0.1  // ...and the 9 integer re-rounds cost at most noise
  }

  test("the 8 Householder alignment passes are an isometry up to re-rounding (oracle-independent pin)") {
    // a wrong reflector (bad sign, bad norm, un-masked fit) would scale
    // or shear the corpus; a correct composition of reflections changes
    // NO pairwise distance beyond the per-pass integer re-round (±0.5
    // per coordinate per pass). Compare all pairwise squared distances
    // among 40 sampled vectors in the ABTT'd space vs the fully aligned
    // space: relative drift must be tiny for well-separated pairs.
    import org.apache.spark.sql.functions.col
    val emt1 = VectorQuant.abttEmStep(spark, "aniso",
      VectorQuant.microEmtOf(VectorQuant.anisoSrc(spark))).localCheckpoint()
    val aligned = VectorQuant.eigenAlignCorpusOf(spark, "aniso", VectorQuant.anisoSrc(spark), 8)
    def pairDists(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] = {
      val s = df.filter(col("vec_id") % 50 === 0)
        .selectExpr("vec_id", "transform(em, x -> cast(x as double)) AS em")
      val a = s.select(col("vec_id").as("ia"), col("em").as("ea"))
      val b = s.select(col("vec_id").as("ib"), col("em").as("eb"))
      a.join(b, col("ia") < col("ib"))
        .selectExpr("ia", "ib",
          "aggregate(zip_with(ea, eb, (x, y) -> (x - y) * (x - y)), 0D, (acc, z) -> acc + z) AS d")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    val before = pairDists(emt1)
    val after = pairDists(aligned)
    after.keySet shouldBe before.keySet
    val drifts = before.keys.toSeq.filter(k => before(k) > 1e6).map { k =>
      math.abs(after(k) - before(k)) / before(k)
    }
    drifts.nonEmpty shouldBe true
    info(f"pairs = ${before.size}, max relative squared-distance drift = ${drifts.max}%.2e")
    // rounding-only bound: per-coordinate drift ≤ ±0.5/pass × 8 passes;
    // for the smallest admitted pairs (d = 1e6 micro²) the relative
    // squared-distance drift bound is (2·√(d/64)·4·64 + 64·16)/d ≈ 0.065.
    // Measured max: 1.7e-3. A wrong reflector (bad sign/norm/unmasked
    // fit) scales or shears — O(1) relative. 0.02 sits >10× above the
    // measured rounding drift and >30× below a real defect.
    drifts.max should be < 0.02
  }

  /** ×100 scale pins (spark.graft.aniso.n — the corpus is generated, so
    * this is a true 100× of the graded row, measured not asserted):
    * the spectrum diagnosis is scale-invariant and the residual lift
    * survives strictly. The ABTT-family ABSOLUTE recalls saturate at
    * scale BY DESIGN — the corpus is a fixed discrete design whose
    * post-ABTT alphabet is 10 classes × 21 jitter phases = 210
    * patterns, so at n=200000 every residual pattern recurs ~950× and
    * the transformed-space top-10 needs resolution below the quantizer
    * cell (BASELINE.md records the full decade table + the boundary
    * math); the ORDERING demonstrations survive — pinned at ×10 below
    * and at ×100 for rotation-vs-ABTT here. */
  test("x100 (n=200000): spectrum scale-invariant, residual lift strict, rotation ordering preserved") {
    graft.GraftConf.scoped(spark) {
      spark.conf.set("spark.graft.aniso.n", "200000")
      val share = SparkEntry.queries("q242_aniso_pca")(spark, sf).head().getAs[Double]("explained_share")
      val r = SparkEntry.queries("q243_aniso_residual_lift")(spark, sf).head()
      val raw = r.getAs[Double]("recall_raw")
      val res = r.getAs[Double]("recall_residual")
      info(s"x100: explained_share = $share, raw = $raw, residual = $res, scan_frac = ${r.getAs[Double]("scan_frac")}")
      share should be > 0.9
      res should be > raw
    }
  }

  test("x10 (n=20000): raw floor unchanged below saturation; transform-family ordering preserved") {
    graft.GraftConf.scoped(spark) {
      spark.conf.set("spark.graft.aniso.n", "20000")
      val raw = SparkEntry.queries("q244_aniso_pq_raw_recall")(spark, sf).head().getAs[Double]("recall")
      val abtt = SparkEntry.queries("q245_aniso_pq_abtt_recall")(spark, sf).head().getAs[Double]("recall")
      val align = SparkEntry.queries("q250_aniso_align_recall")(spark, sf).head().getAs[Double]("recall")
      info(s"x10: raw = $raw (graded-size value 0.76 — 50610 raw patterns > 20000, no duplication yet), " +
        s"ABTT = $abtt, ABTT+align = $align (saturated regime: 210 residual patterns x ~95 copies)")
      raw should be > 0.7      // the raw task is NOT yet saturated at x10
      align should be > abtt   // the rotation demonstration survives saturation
    }
  }
}
