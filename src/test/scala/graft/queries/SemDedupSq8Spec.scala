package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q234/q235 compressed-domain semantic dedup — invariants beyond the
  * DuckDB oracle: consistency between the pair list, the agreement
  * certificate, and the exact-domain q177 baseline.
  */
class SemDedupSq8Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private lazy val sq8Pairs =
    run("q234_semdedup_sq8").collect().map(r => (r.getLong(1), r.getLong(2))).toSet
  private lazy val exactPairs =
    run("q177_semantic_dedup").collect().map(r => (r.getLong(1), r.getLong(2))).toSet
  private lazy val cert = run("q235_semdedup_sq8_agreement").collect().head

  test("q235 counts tie out against the q234 and q177 pair sets exactly") {
    cert.getLong(0) shouldBe exactPairs.size.toLong // n_exact
    cert.getLong(1) shouldBe sq8Pairs.size.toLong   // n_sq8
    cert.getLong(2) shouldBe (exactPairs intersect sq8Pairs).size.toLong // n_both
  }

  test("q235 precision/recall are the in-band ratios of its own counts") {
    val (ne, ns, nb) = (cert.getLong(0), cert.getLong(1), cert.getLong(2))
    nb should be <= math.min(ne, ns)
    cert.getDouble(3) shouldBe BigDecimal(nb.toDouble / ns)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    cert.getDouble(4) shouldBe BigDecimal(nb.toDouble / ne)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("q234 pairs stay within one assigned cluster (same cells as q177)") {
    val cluster = run("q234_semdedup_sq8").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2)))
    val cellOf = Llm.centroidAssignments(spark, sf).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](2).longValue).toMap
    cluster should not be empty
    cluster.foreach { case (c, a, b) =>
      cellOf(a) shouldBe c
      cellOf(b) shouldBe c
      a should be < b
    }
  }
}
