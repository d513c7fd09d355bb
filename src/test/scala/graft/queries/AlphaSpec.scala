package graft.queries

import graft.{GraftConf, SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The re-rank shortlist multiplier α (`spark.graft.rerank.alpha`,
  * q225–q227/q241): recall@10 of (stage-1 top-(10·α) → exact re-rank →
  * top-10) is MONOTONE in α by construction — a wider shortlist is a
  * superset, and the exact re-rank of a superset can only keep or add
  * true top-10 members (at most 9 others can out-rank one). Two exact
  * endpoints pin the algebra:
  *  - α = 1: the re-rank permutes the stage-1 top-10 SET, so recall
  *    equals the stage-1 floor exactly (q219's ADC recall / q224's
  *    residual recall);
  *  - the default α = 10 equals the knob-free graded row. */
class AlphaSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def recallAt(name: String, alpha: Option[Int]): Double = GraftConf.scoped(spark) {
    alpha.foreach(a => spark.conf.set("spark.graft.rerank.alpha", a.toString))
    SparkEntry.queries(name)(spark, sf).head().getAs[Double]("recall")
  }

  test("q226 recall@10 is monotone in α, and the default equals α=10") {
    val r1 = recallAt("q226_adc_rerank_recall", Some(1))
    val r2 = recallAt("q226_adc_rerank_recall", Some(2))
    val r10 = recallAt("q226_adc_rerank_recall", Some(10))
    val dflt = recallAt("q226_adc_rerank_recall", None)
    info(s"alpha 1/2/10 -> $r1 / $r2 / $r10 (default $dflt)")
    r1 should be <= r2
    r2 should be <= r10
    dflt shouldBe r10
  }

  test("α=1 re-rank recall equals the stage-1 floor EXACTLY (set-permutation identity)") {
    val floor = SparkEntry.queries("q219_adc_recall")(spark, sf).head().getAs[Double]("recall")
    recallAt("q226_adc_rerank_recall", Some(1)) shouldBe floor
  }

  test("q227 (residual IVFADC + re-rank): α=1 equals the q224 residual floor; default dominates it") {
    val floor = SparkEntry.queries("q224_ivfadc_residual_recall")(spark, sf).head().getAs[Double]("recall")
    recallAt("q227_ivfadc_rerank_recall", Some(1)) shouldBe floor
    recallAt("q227_ivfadc_rerank_recall", None) should be >= floor
  }
}
