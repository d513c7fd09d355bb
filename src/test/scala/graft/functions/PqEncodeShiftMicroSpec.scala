package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** PqEncodeShiftMicro ≡ the composed form it fuses (round 9): micro-
  * scale, subtract the coarse centroid, PQ-encode — previously spelled
  * `pq_encode_micro(zip_with(micro(em), shift, (a, b) -> a - b), cbs)`
  * with two array allocations and two interpreted lambdas per corpus
  * row. The fused expression must agree code-for-code and
  * reconstruction-for-reconstruction on both input arms. */
class PqEncodeShiftMicroSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  // 2 subspaces of 2 dims, 2 codewords each — ties land on the smaller
  // code in both forms by the shared argmin discipline.
  private val cbs =
    """array(
      |  struct(0, 0, array(0D, 0D)),       struct(0, 1, array(1000000D, -2000000D)),
      |  struct(1, 0, array(500000D, 500000D)), struct(1, 1, array(-500000D, 0D)))
      |""".stripMargin.replace("\n", " ")

  test("float arm: fused shift-encode equals zip_with-composed encode") {
    PqEncodeMicro.register(spark)
    val rows = spark.sql(
      s"""SELECT
         |  pq_encode_shift_micro(emb, shift, $cbs) AS fused,
         |  pq_encode_micro(zip_with(
         |    transform(emb, x -> cast(round(cast(x as double) * 1000000D, 0) as double)),
         |    shift, (a, b) -> a - b), $cbs) AS composed
         |FROM VALUES
         |  (array(cast(1.25 as float), cast(-2.0 as float), cast(0.5 as float), cast(0.49 as float)),
         |   array(300000D, -100000D, 0D, 250000D)),
         |  (array(cast(0.0 as float), cast(0.0 as float), cast(0.0 as float), cast(0.0 as float)),
         |   array(0D, 0D, 0D, 0D)),
         |  (array(cast(-0.7 as float), cast(2.2 as float), cast(-1.1 as float), cast(0.0 as float)),
         |   array(-700000D, 2200000D, -1100000D, 0D))
         |AS t(emb, shift)""".stripMargin).collect()
    rows.foreach { r => r.getStruct(0) shouldBe r.getStruct(1) }
  }

  test("double (pre-scaled micro) arm agrees too") {
    PqEncodeMicro.register(spark)
    val r = spark.sql(
      s"""SELECT
         |  pq_encode_shift_micro(array(1250000D, -2000000D, 500000D, 490000D),
         |    array(300000D, -100000D, 0D, 250000D), $cbs) AS fused,
         |  pq_encode_micro(zip_with(array(1250000D, -2000000D, 500000D, 490000D),
         |    array(300000D, -100000D, 0D, 250000D), (a, b) -> a - b), $cbs) AS composed
         |""".stripMargin).collect()(0)
    r.getStruct(0) shouldBe r.getStruct(1)
  }

  test("out-of-contract shifts fail LOUDLY: null element, shift longer than vector") {
    PqEncodeMicro.register(spark)
    val nullEl = intercept[Exception] {
      spark.sql(
        s"""SELECT pq_encode_shift_micro(array(1250000D, -2000000D, 500000D, 490000D),
           |  array(300000D, CAST(NULL AS DOUBLE), 0D, 250000D), $cbs)""".stripMargin).collect()
    }
    nullEl.getMessage should include("null shift element")
    val longer = intercept[Exception] {
      spark.sql(
        s"""SELECT pq_encode_shift_micro(array(1250000D, -2000000D, 500000D, 490000D),
           |  array(0D, 0D, 0D, 0D, 0D), $cbs)""".stripMargin).collect()
    }
    longer.getMessage should include("exceeds vector length")
  }

  test("shift shorter than the vector leaves the tail unshifted (documented contract)") {
    PqEncodeMicro.register(spark)
    val r = spark.sql(
      s"""SELECT
         |  pq_encode_shift_micro(array(1250000D, -2000000D, 500000D, 490000D),
         |    array(300000D, -100000D), $cbs) AS short_shift,
         |  pq_encode_shift_micro(array(1250000D, -2000000D, 500000D, 490000D),
         |    array(300000D, -100000D, 0D, 0D), $cbs) AS zero_padded
         |""".stripMargin).collect()(0)
    r.getStruct(0) shouldBe r.getStruct(1)
  }
}
