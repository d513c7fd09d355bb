package graft.queries

import graft.{SparkEntry, TestSpark}
import graft.operators.IndexIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Incremental IVFADC index ingest (q228): the graded row proves the
  * maintained index's rankings against the DuckDB oracle; this spec
  * proves the MAINTENANCE itself —
  *  - batch-appended index ≡ full republish, byte-for-byte (same rows,
  *    same codes, same cells), so probes cannot tell the difference;
  *  - a crash BETWEEN staging write and commit leaves the live index
  *    byte-identical (day-0 state, no torn or partial files visible);
  *  - replaying the same batchId after any crash converges to
  *    exactly-once contents (idempotent recovery, staging cleaned). */
class IngestSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def indexRows(path: String): Seq[String] =
    spark.read.parquet(path)
      .select(col("vec_id"), col("codes").cast("string"), col("cell"))
      .collect().map(_.toString).sorted.toSeq

  /** Runs q228 once (stages books + day-0 publish + day-1 append on
    * first call per JVM) and returns its index dir. */
  private def stagedDir(): String = {
    SparkEntry.queries("q228_ivfadc_ingest")(spark, sf).collect()
    VectorQuant.ivfadcIngestDir(spark, sf)
  }

  test("batch-maintained index is byte-identical to a frozen-book full republish") {
    val dir = stagedDir()
    val book = spark.read.parquet(s"$dir/book")
    val coarse = spark.read.parquet(s"$dir/coarse")
    graft.functions.PqEncodeMicro.register(spark)
    val republish = VectorQuant.ivfadcEncodeWith(
      graft.Tables.embeddings(spark, sf), book, coarse)
      .select(col("vec_id"), col("codes").cast("string"), col("cell"))
      .collect().map(_.toString).sorted.toSeq
    indexRows(s"$dir/codes") shouldBe republish
  }

  test("crash between staging write and commit: live index untouched; replay converges; staging cleaned") {
    val dir = stagedDir()
    val before = indexRows(s"$dir/codes")
    val book = spark.read.parquet(s"$dir/book")
    val coarse = spark.read.parquet(s"$dir/coarse")
    graft.functions.PqEncodeMicro.register(spark)
    // a second injected batch: re-encode a small deterministic slice
    // under fresh vec_ids so the append is observable
    val batch2 = VectorQuant.ivfadcEncodeWith(
      graft.Tables.embeddings(spark, sf).filter(col("vec_id") % 97 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L), book, coarse)
    IndexIngest.interruptAfterStage =
      () => throw new RuntimeException("simulated crash before commit")
    try {
      intercept[RuntimeException] {
        IndexIngest.appendBatch(spark, batch2, s"$dir/codes", "crashtest")
      }
    } finally IndexIngest.interruptAfterStage = () => ()
    // (1) nothing visible: readers see the exact day-1 state
    indexRows(s"$dir/codes") shouldBe before
    // (2) disarmed replay of the SAME batchId converges
    IndexIngest.appendBatch(spark, batch2, s"$dir/codes", "crashtest")
    val after = indexRows(s"$dir/codes")
    after.size shouldBe before.size + batch2.count().toInt
    // (3) staging dropped, and replaying AGAIN is idempotent
    val fs = new org.apache.hadoop.fs.Path(s"$dir/codes")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(s"$dir/codes/.staging-crashtest")) shouldBe false
    IndexIngest.appendBatch(spark, batch2, s"$dir/codes", "crashtest")
    indexRows(s"$dir/codes") shouldBe after
    // cleanup: remove the test batch so later q228 runs in this JVM see
    // the graded day-1 state
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/codes"))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .foreach { cd =>
        fs.listStatus(cd.getPath)
          .filter(_.getPath.getName.startsWith("ingest-crashtest-"))
          .foreach(f => fs.delete(f.getPath, false))
      }
    indexRows(s"$dir/codes") shouldBe before
  }

  test("q240: compaction is row-invisible (ingested ≡ compacted) and bounds small files to one per cell") {
    SparkEntry.queries("q240_ivfadc_compacted")(spark, sf).collect()
    val dir = VectorQuant.ivfadcCompactDir(spark, sf)
    // (1) content identical through the rewrite — probes cannot tell
    indexRows(s"$dir/compacted") shouldBe indexRows(s"$dir/codes")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def filesPerCell(sub: String): Map[String, Int] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$sub"))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
        .map { cd =>
          cd.getPath.getName ->
            fs.listStatus(cd.getPath).count { f =>
              val n = f.getPath.getName
              f.isFile && !n.startsWith("_") && !n.startsWith(".")
            }
        }.toMap
    // (2) the ingested dir really accumulated small files (day-0 + 3
    // batches land ≥2 files in at least one cell)...
    filesPerCell("codes").values.max should be >= 2
    // (3) ...and compaction collapses every cell to exactly one file
    val compacted = filesPerCell("compacted")
    compacted.keySet shouldBe filesPerCell("codes").keySet
    all(compacted.values) shouldBe 1
  }

  test("q228 shape: ranks contiguous, distances non-decreasing integers; deterministic rerun") {
    val a = SparkEntry.queries("q228_ivfadc_ingest")(spark, sf).collect()
    a.groupBy(_.getAs[Long]("qid")).foreach { case (_, g) =>
      g.map(_.getAs[Int]("rnk")).sorted.toSeq shouldBe (1 to g.length)
      val byRank = g.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("dist"))
      byRank.zip(byRank.tail).foreach { case (x, y) => x should be <= y }
      byRank.foreach { v => v shouldBe math.rint(v) }
    }
    val b = SparkEntry.queries("q228_ivfadc_ingest")(spark, sf).collect()
    a.map(_.toString).sorted.toSeq shouldBe b.map(_.toString).sorted.toSeq
  }
}
