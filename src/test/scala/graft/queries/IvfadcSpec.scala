package graft.queries

import graft.{GraftConf, SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** IVFADC invariants (q220/q221): ranks contiguous from 1 within each
  * query, every result vector actually lives in one of its query's
  * probed cells (the pruning is real, not decorative), deterministic
  * rerun, and the certificate contract — recall and scanned fraction
  * both in range, with the scan genuinely pruned (2 of 16 cells). */
class IvfadcSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("per-query ranks are contiguous from 1; dist non-decreasing; exact micro integers") {
    val rows = SparkEntry.queries("q220_ivfadc_topk")(spark, sf).collect()
    rows.nonEmpty shouldBe true
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, g) =>
      g.map(_.getAs[Int]("rnk")).sorted.toSeq shouldBe (1 to g.length)
      val byRank = g.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("dist"))
      byRank.zip(byRank.tail).foreach { case (a, b) => a should be <= b }
      byRank.foreach { x => x shouldBe math.rint(x) }
    }
  }

  test("every result vector is a member of one of its query's probed cells") {
    // Rebuild the cell/probe relations and anti-join: a q220 row whose
    // vector sits outside the query's probed cells means the pruning
    // join leaked (or the cell assignment drifted from the book).
    val top = VectorQuant.ivfadcTopkDf(spark, sf).select("qid", "vec_id")
    val leaks = top.except(VectorQuant.ivfadcMembershipForTest(spark, sf)).count()
    leaks shouldBe 0L
  }

  test("deterministic rerun: identical result sets") {
    val a = SparkEntry.queries("q220_ivfadc_topk")(spark, sf).collect().map(_.toString).sorted
    val b = SparkEntry.queries("q220_ivfadc_topk")(spark, sf).collect().map(_.toString).sorted
    a.toSeq shouldBe b.toSeq
  }

  test("persisted index (q222): byte-identical rankings to the inline path, DPP on cell") {
    val inline = SparkEntry.queries("q220_ivfadc_topk")(spark, sf).collect().map(_.toString).sorted
    val idxDf = SparkEntry.queries("q222_ivfadc_index")(spark, sf)
    val persisted = idxDf.collect().map(_.toString).sorted
    persisted.toSeq shouldBe inline.toSeq
    // the probe scan must read only the probed cell partitions: the
    // partition-column join injects dynamic partition pruning
    val plan = idxDf.queryExecution.executedPlan.toString
    plan.toLowerCase should include("dynamicpruning")
  }

  test("spark.graft.ivfadc.nprobe knob: monotone recall; nprobe=16 equals full-scan ADC") {
    def at(n: Int): (Double, Double) = GraftConf.scoped(spark) {
      spark.conf.set("spark.graft.ivfadc.nprobe", n.toString)
      val r = SparkEntry.queries("q221_ivfadc_recall")(spark, sf).head()
      (r.getAs[Double]("recall"), r.getAs[Double]("scan_frac"))
    }
    val (r1, f1) = at(1)
    val (r2, f2) = at(2)
    val (r16, f16) = at(16)
    info(s"nprobe curve: 1=($r1, $f1) 2=($r2, $f2) 16=($r16, $f16)")
    r1 should be <= r2
    r2 should be <= r16
    f1 should be < f2
    f16 shouldBe 1.0 // every cell probed = the whole corpus scanned
    // probing every cell IS the full-scan ADC ranking
    val full = SparkEntry.queries("q219_adc_recall")(spark, sf).head().getAs[Double]("recall")
    r16 shouldBe full
  }

  test("certificate: recall and scan_frac in range, scan genuinely pruned") {
    val r = SparkEntry.queries("q221_ivfadc_recall")(spark, sf).head()
    r.getAs[Long]("n_queries") shouldBe 10L
    r.getAs[Int]("k") shouldBe 10
    val recall = r.getAs[Double]("recall")
    val frac = r.getAs[Double]("scan_frac")
    info(s"ivfadc recall@10 = $recall, scan_frac = $frac")
    recall should be >= 0.0
    recall should be <= 1.0
    frac should be > 0.0
    frac should be < 0.5 // 2 of 16 cells — pruning must actually prune
    r.getAs[Long]("n_scanned") should be > 0L
  }
}
