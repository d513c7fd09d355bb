package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Physical-plan pins for the manifest probe path: zone maps prune at
  * PLANNING (the scan's input is the kept file list), and the residual
  * range predicate still reaches the parquet reader as a pushed filter
  * — both layers of the pruning story, asserted on the actual plan. */
class ManifestPlanSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val dir = "/tmp/graft_llm/manifest_plan_spec/index"

  private def batch(id0: Long, n: Int) =
    spark.range(id0, id0 + n).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 7), j -> cast((id * 7 + j) % 256 as int)) AS codes",
      "cast(id % 4 as int) AS cell")

  test("readRange plans ONLY zone-map-kept files and pushes the residual vec_id predicate to the scan") {
    import graft.operators.IndexManifest
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    IndexManifest.publishBase(spark, batch(0, 40), dir)
    IndexManifest.appendBatch(spark, batch(1000, 12), dir, "day1")
    val df = IndexManifest.readRange(spark, dir, 0L, 50L)
    val plan = df.queryExecution.executedPlan.toString
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // planning-level: the day1 files never reach Spark's file index
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    scans should have size 1
    val files = scans.head.relation.location.inputFiles
    files.length should be > 0
    files.foreach(f => f should not include "ingest-day1-")
    // scan-level: the residual BETWEEN predicate is pushed to parquet
    formatted should include("PushedFilters")
    formatted should (include("GreaterThanOrEqual(vec_id,0)") or include("IsNotNull(vec_id)"))
    plan should not include "ingest-day1-"
    // and the rows are right
    df.count() shouldBe 40L
  }
}
