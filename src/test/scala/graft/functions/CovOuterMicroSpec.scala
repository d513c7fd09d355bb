package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** CovOuterMicro — the fused covariance sufficient-statistics aggregate
  * behind the spectral family (q238/q239/q242/q245). Pins:
  *  - the 128-bit limb arithmetic against BigInt, INCLUDING sums that
  *    cross the long boundary (the reason the aggregate isn't a plain
  *    SUM(long): per-partition sums overflow past ~5·10⁵ rows);
  *  - end-to-end dataframe parity with the grouped decimal-sum shape it
  *    replaced, on a corpus with signed values and mixed dims. */
class CovOuterMicroSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("add128 equals BigInt across the long boundary (positive and negative drift)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 20) {
      val b = new Array[Long](2)
      var ref = BigInt(0)
      // bias per trial so some accumulators drift up past Long.MaxValue
      // and others down past Long.MinValue
      val bias = if (trial % 2 == 0) 1L else -1L
      for (_ <- 0 until 2000) {
        val p = bias * math.abs(rnd.nextLong() % (1L << 53)) + rnd.nextLong() % (1L << 40)
        CovOuterMicro.add128(b, 0, p)
        ref += p
      }
      (BigInt(b(0)) << 64) + BigInt(java.lang.Long.toUnsignedString(b(1))) shouldBe ref
    }
  }

  test("merge128 equals BigInt addition of two drifted accumulators") {
    val rnd = new scala.util.Random(11)
    val a = new Array[Long](2)
    val c = new Array[Long](2)
    var ra = BigInt(0); var rc = BigInt(0)
    for (_ <- 0 until 3000) {
      val p = rnd.nextLong() % (1L << 53)
      val q = (1L << 52) + math.abs(rnd.nextLong() % (1L << 52))
      CovOuterMicro.add128(a, 0, p); ra += p
      CovOuterMicro.add128(c, 0, q); rc += q
    }
    CovOuterMicro.merge128(a, c)
    (BigInt(a(0)) << 64) + BigInt(java.lang.Long.toUnsignedString(a(1))) shouldBe (ra + rc)
  }

  test("dataframe aggregate equals the grouped decimal-sum reference it replaced") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = Seq.tabulate(200)(_ =>
      Seq.tabulate(64)(_ => (rnd.nextInt(8000001) - 4000000).toLong))
    val df = rows.toDF("em").repartition(7) // exercise merge across partitions
    val buf = df.agg(CovOuterMicro($"em").as("b")).head().getSeq[Long](0)
    // reference: exact BigInt outer-product sums
    val ref = Array.fill(64, 64)(BigInt(0))
    rows.foreach { em =>
      for (i <- 0 until 64; j <- i until 64) ref(i)(j) += BigInt(em(i)) * BigInt(em(j))
    }
    for (i <- 0 until 64; j <- i until 64) {
      val idx = 2 * (i * 64 + j)
      val got = (BigInt(buf(idx)) << 64) + BigInt(java.lang.Long.toUnsignedString(buf(idx + 1)))
      got shouldBe ref(i)(j)
    }
    // cells below the diagonal stay zero (dropped by the triangle filter)
    for (i <- 1 until 64; j <- 0 until i) {
      buf(2 * (i * 64 + j)) shouldBe 0L
      buf(2 * (i * 64 + j) + 1) shouldBe 0L
    }
  }
}
