package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Bit-level correctness of the Morton interleave, parity between the
  * interpreted and codegen paths, and the locality property that makes
  * Z-order a useful clustering key. Raw scalacheck generators with a
  * fixed seed schedule (the scalatest bridge artifact is not in the
  * offline cache).
  */
class ZOrder2Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  /** Bit-by-bit reference: bit i of a → bit 2i, bit i of b → bit 2i+1. */
  private def reference(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 32) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave matches the bit-by-bit reference on random longs") {
    val pairs = samples(for {
      a <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      b <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield (a, b), 200)
    pairs.foreach { case (a, b) =>
      ZOrder2.interleave(a, b) shouldBe reference(a, b)
    }
  }

  test("interleave round-trips small coordinates exactly") {
    ZOrder2.interleave(0, 0) shouldBe 0L
    ZOrder2.interleave(1, 0) shouldBe 1L
    ZOrder2.interleave(0, 1) shouldBe 2L
    ZOrder2.interleave(3, 3) shouldBe 15L
    ZOrder2.interleave(0xFFFFFFFFL, 0xFFFFFFFFL) shouldBe -1L // all 64 bits set
  }

  test("codegen path equals interpreted path (and the Scala helper)") {
    import spark.implicits._
    ZOrder2.register(spark)
    val rows = Seq((5L, 9L), (0L, 0L), (0xFFFFFFFFL, 1L), (123456789L, 987654321L))
    val df = rows.toDF("a", "b")
    // codegen (expression inside a projection over a local relation)
    val cg = df.select(expr("zorder2(a, b)")).collect().map(_.getLong(0))
    cg shouldBe rows.map { case (a, b) => ZOrder2.interleave(a, b) }.toArray
    // interpreted: direct eval
    rows.foreach { case (a, b) =>
      ZOrder2(org.apache.spark.sql.catalyst.expressions.Literal(a),
        org.apache.spark.sql.catalyst.expressions.Literal(b))
        .eval(null) shouldBe ZOrder2.interleave(a, b)
    }
  }

  test("z-sort clusters quadrants: all (lo,lo) points precede all (hi,hi) points") {
    // points in [0,2^16) vs [2^16, 2^17): the high quadrant's z has bit 33
    // set, every low-quadrant z fits in 32 bits — locality by construction
    val lo = for (x <- 0L until 100L; y <- 0L until 100L if (x + y) % 13 == 0) yield (x, y)
    val hi = lo.map { case (x, y) => (x + 65536L, y + 65536L) }
    val zLoMax = lo.map { case (x, y) => ZOrder2.interleave(x, y) }.max
    val zHiMin = hi.map { case (x, y) => ZOrder2.interleave(x, y) }.min
    zLoMax should be < zHiMin
  }

  test("null in → null out") {
    import spark.implicits._
    ZOrder2.register(spark)
    val df = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
    df.select(expr("zorder2(a, b)")).collect()(0).isNullAt(0) shouldBe true
  }
}
