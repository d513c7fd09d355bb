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

  test("q239 ABTT equals the driver-side reimplementation bit-for-bit (first 20 vectors)") {
    // rebuild cv + v2 exactly as bruteTop does, then the per-row
    // transform: mc = n*em - sx, cn = fold(mc*v2), residual elements
    val em = graft.Tables.embeddings(spark, sf)
      .filter("embedding IS NOT NULL").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(f =>
        BigDecimal(f.toDouble * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .sortBy(_._1)
    val n = em.length
    val sx = Array.tabulate(D)(i => em.map(_._2(i)).sum)
    val sxy = Array.tabulate(D, D)((i, j) => em.map(v => BigInt(v._2(i)) * BigInt(v._2(j))).sum)
    val cv = Array.tabulate(D, D) { (i, j) =>
      val raw = sxy(i)(j).toDouble / n - (sx(i).toDouble / n) * (sx(j).toDouble / n)
      BigDecimal(raw / 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    def tzDiv(x: Long, s: Long): Long = if (x >= 0) x / s else -((-x) / s)
    var v2 = Array.fill(D)(1000000L)
    for (_ <- 1 to 2) {
      val wi = Array.tabulate(D)(i => (0 until D).map(j => cv(i)(j) * v2(j)).sum)
      val s = math.max(1L, wi.map(math.abs).max / 1000000L)
      v2 = wi.map(tzDiv(_, s))
    }
    val va = v2.map(_.toDouble)
    def r6(x: Double) = {
      val r = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      r + 0.0 // signed-zero normalization, as in the query
    }
    val want = em.take(20).map { case (id, e) =>
      val mc = Array.tabulate(D)(j => e(j).toDouble * n - sx(j).toDouble)
      var cn = 0.0; var dn = 0.0; var k = 0
      while (k < D) { cn += mc(k) * va(k); dn += va(k) * va(k); k += 1 }
      (id, r6(cn / dn / n / 1e6),
        r6((mc(0) - cn / dn * va(0)) / n / 1e6),
        r6((mc(1) - cn / dn * va(1)) / n / 1e6))
    }.toSeq
    val gotAbtt = graft.SparkEntry.queries("q239_embedding_abtt")(spark, sf)
      .limit(20).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    gotAbtt shouldBe want
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
