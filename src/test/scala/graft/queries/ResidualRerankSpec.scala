package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-8 ANN quality rung: residual IVFADC (q223/q224) and two-stage
  * exact re-rank (q225–q227). The graded values live in the oracle
  * rows; this spec pins the STRUCTURAL claims the docs make —
  * re-rank dominance is a theorem (any exact-top-10 member in the
  * shortlist re-ranks in), residual search never pays extra scan, and
  * at sf0.001 the re-ranked IVFADC recall equals the coarse membership
  * ceiling exactly (the shortlist is wider than any probed cell pair,
  * so the ONLY remaining loss is pruning). */
class ResidualRerankSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def exactTop10 = {
    graft.functions.L2Micro.register(spark)
    val qs = VectorQuant.adcQueries(spark, sf)
    graft.Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull)
      .crossJoin(broadcast(qs))
      .select(col("qid"), col("vec_id"), expr("l2_micro(embedding, em)").as("dist"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("dist"), col("vec_id"))))
      .filter(col("rnk") <= 10)
      .select("qid", "vec_id")
  }

  test("q223 shape: 10 contiguous ranks per query, non-decreasing integer distances") {
    val rows = SparkEntry.queries("q223_ivfadc_residual_topk")(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, g) =>
      g.map(_.getAs[Int]("rnk")).sorted.toSeq shouldBe (1 to g.length)
      val byRank = g.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("dist"))
      byRank.zip(byRank.tail).foreach { case (a, b) => a should be <= b }
      byRank.foreach { d => d shouldBe math.rint(d) } // exact micro integers
    }
  }

  test("re-rank recall dominates its ADC stage (monotone by construction)") {
    val adc = SparkEntry.queries("q219_adc_recall")(spark, sf).head().getAs[Double]("recall")
    val rr = SparkEntry.queries("q226_adc_rerank_recall")(spark, sf).head().getAs[Double]("recall")
    info(s"adc recall@10 = $adc, reranked = $rr")
    rr should be >= adc
  }

  test("residual IVFADC: recall >= raw at an IDENTICAL scan fraction") {
    val raw = SparkEntry.queries("q221_ivfadc_recall")(spark, sf).head()
    val res = SparkEntry.queries("q224_ivfadc_residual_recall")(spark, sf).head()
    info(s"raw recall = ${raw.getAs[Double]("recall")}, residual = ${res.getAs[Double]("recall")}")
    res.getAs[Long]("n_scanned") shouldBe raw.getAs[Long]("n_scanned")
    res.getAs[Double]("recall") should be >= raw.getAs[Double]("recall")
  }

  test("re-ranked IVFADC recall == coarse membership ceiling at sf0.001, above the raw floor") {
    // ceiling: exact-top-10 members that live in probed cells. At this
    // SF every probed cell pair holds < 100 members, so the ADC top-100
    // shortlist is ALL of them and the exact re-rank recovers each one.
    val (enc, probe, _) = VectorQuant.ivfadcResidualParts(spark, sf)
    val ceiling = exactTop10
      .join(enc.select(col("vec_id"), col("cell")), "vec_id")
      .join(broadcast(probe), Seq("qid"))
      .filter(col("cell") === col("pcell"))
      .count() / 100.0
    val r = SparkEntry.queries("q227_ivfadc_rerank_recall")(spark, sf).head()
    val raw = SparkEntry.queries("q221_ivfadc_recall")(spark, sf).head().getAs[Double]("recall")
    info(s"ceiling = $ceiling, reranked = ${r.getAs[Double]("recall")}, raw floor = $raw")
    r.getAs[Double]("recall") shouldBe ceiling
    r.getAs[Double]("recall") should be > raw
  }

  test("deterministic rerun: identical q223 result sets") {
    val a = SparkEntry.queries("q223_ivfadc_residual_topk")(spark, sf).collect().map(_.toString).sorted
    val b = SparkEntry.queries("q223_ivfadc_residual_topk")(spark, sf).collect().map(_.toString).sorted
    a.toSeq shouldBe b.toSeq
  }
}
