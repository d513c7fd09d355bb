package graft.functions

import graft.TestSpark
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** PqAdcMicro input hardening (round-7 advisory, low): the in-contract
  * code domain is 0..255, but q222 feeds the expression codes read back
  * from an on-disk parquet index and the function is registered
  * session-wide — a negative or ≥256 code must yield a loud +∞, never
  * an unchecked read before the LUT base (garbage) or into the next
  * subspace's slot (plausible-but-wrong distance). Covers BOTH the
  * interpreted eval and the codegen'd SQL path. */
class PqAdcMicroSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private val ex = PqAdcMicro(
    BoundReference(0, ArrayType(IntegerType), nullable = true),
    BoundReference(1, ArrayType(DoubleType), nullable = true))

  // m=2 subspaces, dense 512-slot LUT: slot j*256+c holds j*1000+c
  private val lut = new GenericArrayData(
    Array.tabulate(512)(p => (p / 256) * 1000.0 + (p % 256)))

  private def adc(codes: Int*): Any =
    ex.eval(InternalRow(new GenericArrayData(codes.toArray), lut))

  test("interpreted: in-range codes sum their LUT slots") {
    adc(3, 7) shouldBe (3.0 + 1007.0)
    adc(0, 255) shouldBe (0.0 + 1255.0)
  }

  test("interpreted: negative and >=256 codes yield +Infinity, not a mis-slotted read") {
    adc(-1, 7) shouldBe Double.PositiveInfinity
    adc(3, 256) shouldBe Double.PositiveInfinity // would alias slot 2*256+0 unguarded
    adc(3, -256) shouldBe Double.PositiveInfinity // would alias slot 0 unguarded
  }

  test("codegen path agrees: out-of-range codes are +Infinity") {
    PqAdcMicro.register(spark)
    val rows = spark.sql(
      """SELECT pq_adc_micro(codes, lut) AS d FROM (
        |  SELECT a.codes, transform(sequence(0, 511),
        |    p -> cast(p div 256 as double) * 1000D + cast(p % 256 as double)) AS lut
        |  FROM VALUES (array(3, 7)), (array(-1, 7)), (array(3, 256)) AS a(codes))
        |""".stripMargin).collect().map(_.getDouble(0))
    rows(0) shouldBe 1010.0
    rows(1) shouldBe Double.PositiveInfinity
    rows(2) shouldBe Double.PositiveInfinity
  }
}
