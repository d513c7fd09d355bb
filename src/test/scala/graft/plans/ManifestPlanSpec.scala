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

  test("corpus table: lang partition pruning composes with doc_id zone-map skipping; the scan plans with the MANIFEST schema") {
    import graft.operators.IndexManifest
    val cdir = "/tmp/graft_llm/manifest_plan_spec/corpus"
    val root = new org.apache.hadoop.fs.Path(cdir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    def docs(id0: Long, n: Int) = spark.range(id0, id0 + n).selectExpr(
      "id AS doc_id",
      "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END AS lang",
      "id * 3 AS n_chars")
    IndexManifest.publishBase(spark, docs(0, 40), cdir,
      IndexManifest.TableSpec(partCol = "lang", statCols = Seq("doc_id", "n_chars")))
    IndexManifest.appendBatch(spark, docs(1000, 12), cdir, "feed_1")
    val df = IndexManifest.readRange(spark, cdir, 0L, 50L).filter(col("lang") === "en")
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    scans should have size 1
    // zone maps: feed_1's files never reach the file index (doc_id skip)
    scans.head.relation.location.inputFiles.foreach(f => f should not include "ingest-feed_1-")
    // hive layer: the lang predicate is a PARTITION filter, not a row filter
    scans.head.partitionFilters.map(_.toString).mkString should include("lang")
    // planning schema is the manifest's (no footer merge): exact columns
    scans.head.relation.dataSchema.fieldNames.toSeq should contain allOf ("doc_id", "n_chars")
    df.count() shouldBe 20L
  }

  test("BUCKETED LAYOUT: a join of two same-bucketed manifest tables plans with ZERO shuffle exchange (the round-12 stretch ask)") {
    import graft.operators.IndexManifest
    val d1 = "/tmp/graft_llm/manifest_plan_spec/bt1"
    val d2 = "/tmp/graft_llm/manifest_plan_spec/bt2"
    Seq(d1, d2).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    def left(id0: Long, n: Int) = spark.range(id0, id0 + n).selectExpr(
      "id AS vec_id", "id * 3 AS w", "cast(id % 4 as int) AS cell")
    val right = spark.range(0, 200).selectExpr(
      "id AS vec_id", "id * 7 AS v", "cast(id % 4 as int) AS cell")
    val spec = IndexManifest.TableSpec(partCol = "cell", statCols = Seq("vec_id"),
      buckets = 8, bucketCols = Seq("vec_id"))
    IndexManifest.publishBase(spark, left(0, 40), d1, spec)
    IndexManifest.appendBatch(spark, left(100, 20), d1, "day1") // 2 files/bucket: grouping, not 1:1
    IndexManifest.publishBase(spark, right, d2, spec)
    val thresholdBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join path
      val a = IndexManifest.readBucketed(spark, d1)
      val b = IndexManifest.readBucketed(spark, d2).select(col("vec_id"), col("v"))
      val joined = a.join(b, Seq("vec_id"))
      joined.count() shouldBe 60L // right covers 0..199: every left id matches
      val plan = joined.queryExecution.executedPlan.toString
      // the whole point: a sort-merge join with NO exchange on either side
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"
      plan.toLowerCase should include("bucketed: true")
      // and the rows are exactly the plain join's
      val expected = left(0, 40).union(left(100, 20))
        .join(right.select(col("vec_id"), col("v")), Seq("vec_id"))
        .agg(sum(expr("w + v"))).head().getLong(0)
      joined.agg(sum(expr("w + v"))).head().getLong(0) shouldBe expected
      // BUCKET PRUNING rides along for free: an equality probe on the
      // bucket key scans ONE bucket's files, not 8 — Spark's own
      // bucket-pruning rule consuming the manifest-declared layout.
      // (autoBucketedScan turns bucketed scans OFF for plans with no
      // distribution-requiring operator — a bare filter is one — so pin
      // the capability with it scoped off, the way a bucket-heavy
      // deployment runs.)
      val autoBefore = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      try {
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        val probe = IndexManifest.readBucketed(spark, d1).filter(col("vec_id") === 7L)
        probe.count() shouldBe 1L
        probe.queryExecution.executedPlan.toString should
          include regex "SelectedBucketsCount: 1 out of 8"
      } finally
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", autoBefore)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdBefore)
  }

  test("deletion vectors read as ONE anti-join over the scan; the probe's residual predicate still reaches parquet") {
    import graft.operators.IndexManifest
    val ddir = "/tmp/graft_llm/manifest_plan_spec/dv"
    val root = new org.apache.hadoop.fs.Path(ddir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    IndexManifest.publishBase(spark, batch(0, 40), ddir)
    IndexManifest.deleteWhere(spark, ddir, col("vec_id") % 5 === 0, "purge1")
    val df = IndexManifest.readRange(spark, ddir, 0L, 30L)
    df.count() shouldBe 31L - 7L // ids 0..30 minus multiples of 5 (0,5,...,30)
    // the join query runs under AQE: assert on the FINALIZED plan
    val plan = df.queryExecution.executedPlan.toString
    // merge-on-read = one anti-join, not a rewrite and not N joins
    plan should include("LeftAnti")
    plan.sliding("LeftAnti".length).count(_ == "LeftAnti") shouldBe 1
    // two scans: the data files and the DV sidecar
    plan.sliding("Scan parquet".length).count(_ == "Scan parquet") shouldBe 2
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    formatted should include("PushedFilters")
  }
}
