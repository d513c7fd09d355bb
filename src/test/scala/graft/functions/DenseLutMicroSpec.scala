package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** DenseLutMicro parity with the shape it replaced (round 9): the dense
  * LUT used to be built as `transform(sequence(0, w−1), p ->
  * coalesce(element_at(map, p), +∞))` over a map_from_arrays map —
  * O(w²) per row through ArrayBasedMapData's linear key scan, measured
  * as ~5.5 s of EVERY ADC-family query's broadcast build at sf0.1. The
  * scatter must agree slot-for-slot with that reference form. */
class DenseLutMicroSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("scatter equals the map-based reference fill, missing slots stay +Infinity") {
    DenseLutMicro.register(spark)
    val rows = spark.sql(
      """SELECT
        |  dense_lut_micro(collect_list(struct(pos, d)), 8) AS fast,
        |  transform(sequence(0, 7), p -> coalesce(
        |    element_at(map_from_arrays(collect_list(pos), collect_list(d)), p),
        |    cast('Infinity' as double))) AS ref
        |FROM VALUES (0, 1.5D), (3, -2.0D), (7, 9.25D) AS t(pos, d)
        |""".stripMargin).collect()
    val fast = rows(0).getSeq[Double](0)
    val ref = rows(0).getSeq[Double](1)
    fast shouldBe ref
    fast(1).isPosInfinity shouldBe true
    fast(3) shouldBe -2.0
  }

  test("an absurd width fails loudly instead of allocating executor-killing arrays") {
    DenseLutMicro.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT dense_lut_micro(array(struct(0, 1.0D)), 1073741824)").collect()
    }
    e.getMessage should include("outside [0,")
    val neg = intercept[Exception] {
      spark.sql("SELECT dense_lut_micro(array(struct(0, 1.0D)), -8)").collect()
    }
    neg.getMessage should include("outside [0,")
  }

  test("out-of-range positions are ignored; width 0 yields an empty array") {
    DenseLutMicro.register(spark)
    val r = spark.sql(
      """SELECT dense_lut_micro(array(struct(-1, 5.0D), struct(4, 6.0D), struct(1, 2.0D)), 3) AS a,
        |       dense_lut_micro(array(struct(0, 1.0D)), 0) AS b""".stripMargin).collect()(0)
    val a = r.getSeq[Double](0)
    a.length shouldBe 3
    a(0).isPosInfinity shouldBe true
    a(1) shouldBe 2.0
    a(2).isPosInfinity shouldBe true
    r.getSeq[Double](1) shouldBe Seq.empty
  }
}
