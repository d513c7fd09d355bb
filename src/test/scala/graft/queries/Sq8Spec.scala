package graft.queries

import graft.{GraftConf, SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SQ8 scalar quantization invariants (q214/q215): the integer-ceiling
  * scale keeps every quantized component inside a signed byte with NO
  * clamp, reconstruction error is bounded by half a scale step per
  * component, and the certificate behaves (recall ≤ 1, high on the
  * fixture geometry; exact values are oracle-gated). */
class Sq8Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("every quantized component fits a signed byte — the ceil-scale bound, no clamp") {
    val r = VectorQuant.sq8Quantized(spark, sf)
      .select(expr("aggregate(q8, 0, (a, x) -> greatest(a, abs(x)))").as("mx"))
      .agg(max("mx")).head().getInt(0)
    r should be <= 127
  }

  test("reconstruction error is bounded by s/2 per component") {
    // |em − q·s| ≤ s/2 by the half-away-from-zero rounding; an off-by-one
    // in either engine's div arm would break this on negative components
    val bad = VectorQuant.sq8Quantized(spark, sf)
      .select(expr(
        "aggregate(zip_with(em, deq, (e, v) -> abs(e - cast(v as long))), 0L, (a, x) -> greatest(a, x))").as("err"),
        col("s8"))
      .filter(col("err") * 2 > col("s8"))
      .count()
    bad shouldBe 0L
  }

  test("certificate: SQ8 recall is high on the fixture and never exceeds exact") {
    val r = GraftConf.scoped(spark) {
      SparkEntry.queries("q215_sq8_recall")(spark, sf).head()
    }
    r.getAs[Double]("recall") should be <= 1.0
    r.getAs[Double]("recall") should be > 0.9
    r.getAs[Double]("geo_recall") should be >= r.getAs[Double]("recall")
  }
}
