package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** PQ-ADC top-k search invariants (q218/q219): result shape (exactly
  * k ranks per query, contiguous from 1), distance monotonicity within
  * a query, bit-parity of the fused LUT expression against an
  * independent decode-and-measure arm, determinism across reruns, and
  * the certificate contract (recall in (0, 1]; the exact arm ranks
  * each query's own vector first at distance 0). */
class AdcSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("exactly 10 ranks per query, contiguous from 1, dist non-decreasing") {
    val rows = SparkEntry.queries("q218_adc_topk")(spark, sf).collect()
    rows.length shouldBe 100 // 10 queries x k=10
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, g) =>
      g.map(_.getAs[Int]("rnk")).sorted.toSeq shouldBe (1 to 10)
      val byRank = g.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("dist"))
      byRank.zip(byRank.tail).foreach { case (a, b) => a should be <= b }
      byRank.foreach { d => d shouldBe math.rint(d) } // exact micro integers
    }
  }

  test("fused ADC distance matches decode-then-L2 against the reconstruction") {
    // ADC dist(q, x) over codes MUST equal the L2 micro distance between
    // the query vector and x's PQ reconstruction dv — the LUT is just
    // that distance regrouped per subspace. Any drift in LUT layout,
    // position arithmetic, or accumulation shows here.
    val qs = VectorQuant.adcQueries(spark, sf)
    val viaDv = VectorQuant.pqQuantized(spark, sf).select(col("vec_id"), col("dv"))
      .crossJoin(broadcast(qs))
      .select(col("qid"), col("vec_id"),
        expr("aggregate(zip_with(em, dv, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x)").as("dist"))
    val viaAdc = VectorQuant.adcTopkDf(spark, sf).select("qid", "vec_id", "dist")
    val drift = viaAdc.alias("a")
      .join(viaDv.alias("r"), Seq("qid", "vec_id"))
      .filter(col("a.dist") =!= col("r.dist"))
      .count()
    drift shouldBe 0L
  }

  test("deterministic rerun: identical top-k sets") {
    val a = SparkEntry.queries("q218_adc_topk")(spark, sf).collect().map(_.toString).sorted
    val b = SparkEntry.queries("q218_adc_topk")(spark, sf).collect().map(_.toString).sorted
    a.toSeq shouldBe b.toSeq
  }

  test("recall certificate: recall in (0, 1], self-hit at rank 1 in the exact arm") {
    val r = SparkEntry.queries("q219_adc_recall")(spark, sf).head()
    r.getAs[Long]("n_queries") shouldBe 10L
    r.getAs[Int]("k") shouldBe 10
    val recall = r.getAs[Double]("recall")
    info(s"adc recall@10 = $recall")
    recall should be > 0.0
    recall should be <= 1.0
    recall shouldBe r.getAs[Long]("n_matched").toDouble / 100.0
    // exact arm: each query's own vector is its rank-1 neighbor (dist 0)
    graft.functions.L2Micro.register(spark)
    val qs = VectorQuant.adcQueries(spark, sf)
    val selfTop = graft.Tables.embeddings(spark, sf)
      .crossJoin(broadcast(qs))
      .select(col("qid"), col("vec_id"), expr("l2_micro(embedding, em)").as("dist"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("dist"), col("vec_id"))))
      .filter(col("rnk") === 1)
    selfTop.filter(col("qid") =!= col("vec_id")).count() shouldBe 0L
  }
}
