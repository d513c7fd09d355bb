package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Cost-based-optimizer demonstration: with ANALYZE'd statistics and
  * `spark.sql.cbo.*` on, Catalyst REORDERS a deliberately mis-ordered
  * star join so the selective dimension applies first — the stats-driven
  * defense AQE cannot provide (AQE re-plans shuffle boundaries at
  * runtime, but the logical join ORDER is fixed before any stage runs;
  * only table/column statistics can fix it pre-execution). At 100 TB the
  * difference is an intermediate the size of the fact table vs one the
  * size of the filtered slice. See DESIGN_SCALE.md §CBO.
  */
class CboSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Leaf catalog-relation names in plan-tree traversal order; the
    * innermost (first-applied) join reads the earliest leaves. */
  private def leafOrder(p: LogicalPlan): Seq[String] =
    p.collectLeaves().map(_.toString)
      .map(s => "cbo_(lineitem|orders|supplier)".r.findFirstIn(s).getOrElse("?"))

  private def joinCount(p: LogicalPlan): Int = p.collect { case j: Join => j }.size

  test("ANALYZE'd stats + cbo.joinReorder move the selective dim into the first join") {
    val c = spark.conf
    val overrides = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      // the point is the LOGICAL order, so keep physical strategy out of
      // the assertion's way (broadcast would hide the intermediate size
      // difference at this fixture scale — at 100 TB none of these
      // relations broadcast)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = overrides.map { case (k, _) => k -> c.getOption(k) }
    try {
      Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey", "l_quantity")
        .write.mode("overwrite").saveAsTable("cbo_lineitem")
      Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").saveAsTable("cbo_orders")
      Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
        .write.mode("overwrite").saveAsTable("cbo_supplier")
      spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS FOR COLUMNS l_orderkey, l_suppkey")
      spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS o_orderkey")
      spark.sql("ANALYZE TABLE cbo_supplier COMPUTE STATISTICS FOR COLUMNS s_suppkey, s_nationkey")

      // deliberately mis-ordered: the fact⋈orders join is declared FIRST
      // (intermediate = every fact row), the 1-nation supplier filter —
      // which kills ~96% of the fact table — is declared LAST
      val q = """SELECT sum(l.l_quantity) AS q
                |FROM cbo_lineitem l
                |JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
                |JOIN cbo_supplier s ON l.l_suppkey = s.s_suppkey
                |WHERE s.s_nationkey = 3""".stripMargin

      overrides.foreach { case (k, v) => c.set(k, v) }
      val withCbo = spark.sql(q)
      val optimized = withCbo.queryExecution.optimizedPlan
      // stats actually flowed: the analyzed row count is visible to costing
      spark.table("cbo_supplier").queryExecution.optimizedPlan
        .stats.rowCount shouldBe defined
      joinCount(optimized) shouldBe 2
      val order = leafOrder(optimized)
      withClue(s"leaf order $order: ") {
        // the REORDERED plan applies lineitem⋈supplier first — supplier
        // must appear before orders in traversal order
        order.indexOf("cbo_supplier") should be < order.indexOf("cbo_orders")
      }

      // control: same query, CBO off → the declared (bad) order survives
      c.set("spark.sql.cbo.enabled", "false")
      c.set("spark.sql.cbo.joinReorder.enabled", "false")
      val noCbo = leafOrder(spark.sql(q).queryExecution.optimizedPlan)
      withClue(s"no-CBO leaf order $noCbo: ") {
        noCbo.indexOf("cbo_orders") should be < noCbo.indexOf("cbo_supplier")
      }

      // and the reorder is semantics-preserving
      overrides.foreach { case (k, v) => c.set(k, v) }
      val a = withCbo.collect().head.getDouble(0)
      c.set("spark.sql.cbo.enabled", "false")
      val b = spark.sql(q).collect().head.getDouble(0)
      a shouldBe b
    } finally {
      saved.foreach { case (k, v) =>
        v match { case Some(x) => c.set(k, x); case None => c.unset(k) } }
      Seq("cbo_lineitem", "cbo_orders", "cbo_supplier")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
