package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** PrefixSum must equal the single-partition window SUM ... ROWS BETWEEN
  * UNBOUNDED PRECEDING AND 1 PRECEDING exactly, for any partition count,
  * while never funnelling data through one task.
  */
class PrefixSumSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("withPrefixSum == exclusive window sum for several partition counts") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "n_chars")
    val expected = docs
      .withColumn("prefix", coalesce(
        sum("n_chars").over(Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    for (p <- Seq(1, 3, 32)) {
      val got = PrefixSum.withPrefixSum(
        docs, Seq(col("doc_id")), "n_chars", "prefix", partitions = p)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      got shouldBe expected
    }
  }

  test("first row's prefix is 0 and last prefix + last weight == total") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "n_chars")
    val got = PrefixSum.withPrefixSum(
      docs, Seq(col("doc_id")), "n_chars", "prefix", partitions = 8)
      .orderBy("doc_id").collect()
    got.head.getLong(2) shouldBe 0L
    val total = docs.agg(sum("n_chars")).collect().head.getLong(0)
    got.last.getLong(2) + got.last.getLong(1) shouldBe total
  }

  test("reliable mode returns identical prefixes with recomputable lineage") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "n_chars")
    val fast = PrefixSum.withPrefixSum(
      docs, Seq(col("doc_id")), "n_chars", "prefix", partitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val rel = PrefixSum.withPrefixSum(
      docs, Seq(col("doc_id")), "n_chars", "prefix", partitions = 8,
      reliable = true)
    rel.collect().map(r => (r.getLong(0), r.getLong(2))).toMap shouldBe fast
    // the reliable frame survives a second traversal (persist, not a
    // consumed one-shot) and is still exact
    rel.agg(min("prefix")).collect().head.getLong(0) shouldBe 0L
  }

  test("non-Long weight column is rejected up front") {
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    an[IllegalArgumentException] should be thrownBy
      PrefixSum.withPrefixSum(docs, Seq(col("doc_id")), "lang", "p", partitions = 4)
  }
}
