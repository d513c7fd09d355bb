package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q238 embedding spectral diagnostics — a full driver-side
  * reimplementation of the integer-domain power iteration (covariance
  * from exact micro sufficient statistics, 3 max-abs-normalized
  * iterations, left-to-right Rayleigh fold), plus the Rayleigh-quotient
  * range invariants.
  */
class PcaSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val D = 64

  private lazy val got = graft.SparkEntry.queries("q238_embedding_pca")(spark, sf)
    .collect().head

  /** Brute q238: identical arithmetic, plain Scala. */
  private lazy val brute: (Double, Double, Double) = {
    val em = graft.Tables.embeddings(spark, sf)
      .filter("embedding IS NOT NULL").select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(f =>
        BigDecimal(f.toDouble * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val n = em.length
    val sx = Array.tabulate(D)(i => em.map(_(i)).sum)
    val sxy = Array.tabulate(D, D)((i, j) =>
      em.map(v => BigInt(v(i)) * BigInt(v(j))).sum)
    val cv = Array.tabulate(D, D) { (i, j) =>
      val raw = sxy(i)(j).toDouble / n - (sx(i).toDouble / n) * (sx(j).toDouble / n)
      BigDecimal(raw / 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    def tzDiv(x: Long, s: Long): Long = if (x >= 0) x / s else -((-x) / s)
    // two normalized iterations give v2; the third multiply gives w3 —
    // the query's (v2, w3) Rayleigh pairing
    var v2 = Array.fill(D)(1000000L)
    for (_ <- 1 to 2) {
      val wi = Array.tabulate(D)(i => (0 until D).map(j => cv(i)(j) * v2(j)).sum)
      val s = math.max(1L, wi.map(math.abs).max / 1000000L)
      v2 = wi.map(tzDiv(_, s))
    }
    val w3 = Array.tabulate(D)(i => (0 until D).map(j => cv(i)(j) * v2(j)).sum)
    val va = v2.map(_.toDouble); val wa = w3.map(_.toDouble)
    def fold(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < D) { acc += a(i) * b(i); i += 1 }; acc
    }
    val trc = (0 until D).map(i => cv(i)(i)).sum
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (r6(fold(va, wa) / fold(va, va) / 1000000),
      r6(fold(va, wa) / fold(va, va) / trc.toDouble),
      r6(trc.toDouble / 1000000))
  }

  test("q238 equals the driver-side reimplementation bit-for-bit") {
    got.getDouble(0) shouldBe brute._1
    got.getDouble(1) shouldBe brute._2
    got.getDouble(2) shouldBe brute._3
  }

  test("q238 Rayleigh invariants: 0 < lambda1 <= trace; share in (1/d, 1]") {
    val (l, s, t) = (got.getDouble(0), got.getDouble(1), got.getDouble(2))
    l should be > 0.0
    l should be <= t
    s should be > 0.0
    s should be <= 1.0
    // power iteration from the ones vector cannot undershoot the mean
    // eigenvalue by much; the graded fixture is near-isotropic, so the
    // share should sit just above the 1/64 isotropy floor
    s should be > 1.0 / D
  }
}
