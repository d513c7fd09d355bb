package graft.plans

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The rewrite's result-identity contract under hostile inputs: sentinel
  * open bounds (Long.MinValue/MaxValue), NULL bounds, inverted
  * intervals, negative domains — every case must match the naive θ-join
  * exactly, with wide rows degrading to the fallback branch instead of
  * failing the query. */
class BandedRangeJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Conf = "spark.graft.rangeJoin.binSize"

  private def points: DataFrame =
    Seq(-5000L, -1L, 0L, 1L, 999L, 1000L, 123456L, Long.MaxValue - 3, Long.MinValue + 3)
      .toDF("p").withColumn("pid", monotonically_increasing_id())

  private def intervals: DataFrame = Seq(
    (1L, Option(-10000L), Option(0L)),            // negative domain
    (2L, Option(0L), Option(2000L)),              // plain narrow
    (3L, Option(500L), Option(400L)),             // inverted → no matches
    (4L, Option(Long.MinValue), Option(1000L)),   // open lower sentinel → WIDE
    (5L, Option(100L), Option(Long.MaxValue)),    // open upper sentinel → WIDE
    (6L, None, Option(1000L)),                    // NULL bound → no matches
    (7L, Option(Long.MaxValue - 10), Option(Long.MaxValue)), // narrow at the top edge
    (8L, Option(Long.MinValue), Option(Long.MinValue + 10))  // narrow at the bottom edge
  ).toDF("iid", "lo", "hi")

  private def join(): Array[(Long, Long)] =
    points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted

  test("banded == naive over sentinels, NULLs, inversions and negative domains") {
    BandedRangeJoin.install(spark)
    spark.conf.unset(Conf)
    val naive = join()
    naive.nonEmpty shouldBe true // the fixture must actually exercise matches
    try {
      spark.conf.set(Conf, "1000")
      join() shouldBe naive
      spark.conf.set(Conf, "1") // worst-case bin: everything near the span cap
      join() shouldBe naive
      spark.conf.set(Conf, "1000000000000") // huge bin: everything one bucket
      join() shouldBe naive
    } finally spark.conf.unset(Conf)
  }

  test("fallback skip survives tag loss: structural guard stops re-wrapping") {
    // the fixed-point skip is primarily a TreeNodeTag on the θ-join
    // fallback branch, but rules in other batches that rebuild a Join via
    // case-class copy() DROP tags. Simulate exactly that and re-apply the
    // rule: the structural guard (wide-row Filter detection) must keep
    // the plan stable instead of wrapping the fallback again each batch
    // iteration until maxIterations.
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
    BandedRangeJoin.install(spark)
    try {
      spark.conf.set(Conf, "1000")
      val optimized = points
        .join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid").queryExecution.optimizedPlan
      def count(p: LogicalPlan, f: LogicalPlan => Boolean): Int =
        p.collect { case n if f(n) => n }.size
      val joins = count(optimized, _.isInstanceOf[Join])
      val unions = count(optimized, _.isInstanceOf[Union])
      unions should be >= 1 // the rewrite fired: banded ∪ fallback
      // drop ALL tags the way a copy()-rebuilding rule would
      val untagged = optimized.transform { case j: Join => j.copy() }
      val again = BandedRangeJoin(spark)(untagged)
      count(again, _.isInstanceOf[Join]) shouldBe joins
      count(again, _.isInstanceOf[Union]) shouldBe unions
    } finally spark.conf.unset(Conf)
  }

  test("GraftConf.scoped reverts spark.graft.* keys set or changed inside the block") {
    val bin = Conf
    val mb = "spark.graft.rangeJoin.maxBuckets"
    spark.conf.set(mb, "1234")          // pre-existing: must be RESTORED
    try {
      graft.GraftConf.scoped(spark) {
        spark.conf.set(bin, "100000")   // new inside scope: must be UNSET
        spark.conf.set(mb, "9999")      // changed inside scope: must revert
        spark.conf.get(bin) shouldBe "100000"
      }
      spark.conf.getOption(bin) shouldBe None
      spark.conf.get(mb) shouldBe "1234"
      // and the conf reverts even when the block throws
      intercept[RuntimeException] {
        graft.GraftConf.scoped(spark) {
          spark.conf.set(bin, "7"); throw new RuntimeException("boom")
        }
      }
      spark.conf.getOption(bin) shouldBe None
    } finally spark.conf.unset(mb)
  }

  test("wide sentinel rows take the fallback branch; narrow rows are banded") {
    BandedRangeJoin.install(spark)
    try {
      spark.conf.set(Conf, "1000")
      val df = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid")
      val plan = df.queryExecution.optimizedPlan.toString
      plan should include("__graft_bucket") // banded branch present
      plan should include("Union")          // plus the fallback branch
      df.count() shouldBe join().length.toLong
    } finally spark.conf.unset(Conf)
  }
}
