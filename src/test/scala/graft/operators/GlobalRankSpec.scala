package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** GlobalRank must equal the single-partition window row_number exactly,
  * for any partition count, while never funnelling data through one task.
  */
class GlobalRankSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("withRowNumber == row_number() OVER (ORDER BY ...) for several partition counts") {
    val o = graft.Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val expected = o
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("o_totalprice"), col("o_orderkey"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    for (p <- Seq(1, 3, 32)) {
      val got = GlobalRank.withRowNumber(
        o, Seq(col("o_totalprice"), col("o_orderkey")), "rnk", partitions = p)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      got shouldBe expected
    }
  }

  test("ranks are a permutation of 1..n (dense, no gaps, no dupes)") {
    val ev = graft.Tables.events(spark, sf).select("event_id", "value")
    val ranked = GlobalRank.withRowNumber(
      ev, Seq(col("value"), col("event_id")), "r", partitions = 8)
    val rs = ranked.select("r").collect().map(_.getLong(0)).sorted
    rs shouldBe (1L to rs.length).toArray
  }

  test("reliable=true (lineage kept, fault-tolerant) ranks identically to the default") {
    // the default path truncates lineage with a LOCAL checkpoint (fast,
    // but a lost executor makes the frame unrecoverable); reliable=true
    // persists without truncation so lost blocks recompute. Both must
    // stamp the exact same ranks.
    val o = graft.Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val key = Seq(col("o_totalprice"), col("o_orderkey"))
    val fast = GlobalRank.withRowNumber(o, key, "rnk", partitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val safe = GlobalRank.withRowNumber(o, key, "rnk", partitions = 8, reliable = true)
    safe.collect().map(r => (r.getLong(0), r.getLong(2))).toMap shouldBe fast
  }

  test("data stays distributed: the ranked output keeps all requested partitions") {
    // A plan-string assertion on the OUTPUT frame is vacuous here: the
    // ranking runs inside an RDD lineage (createDataFrame over stamped
    // partitions), so even a single-partition-Window reimplementation
    // would print only an ExistingRDD scan. The observable that actually
    // distinguishes the distributed shape is the PARTITIONING of the
    // materialized result: range-exchange + stamping preserves the
    // requested partition count with rows spread across them, while the
    // anti-pattern (Window.orderBy with no partitionBy) funnels all rows
    // into ONE partition.
    val o = graft.Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val ranked = GlobalRank.withRowNumber(
      o, Seq(col("o_totalprice"), col("o_orderkey")), "rnk", partitions = 32)
    ranked.rdd.getNumPartitions shouldBe 32
    val perPart = ranked.rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    perPart.count(_ > 0) should be > 1 // rows genuinely spread, not funnelled
    perPart.max.toLong should be < o.count() // no partition holds everything
  }
}
