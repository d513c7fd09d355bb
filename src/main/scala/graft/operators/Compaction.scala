package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet datasets — the standing hygiene job
  * of any long-lived 100 TB table: streaming ingestion and fine-grained
  * partitioning accumulate thousands of KB-scale files, and scan cost
  * degrades toward per-file overhead (footer reads, task scheduling,
  * no intra-file parallelism). Compaction rewrites the data into files
  * sized for the scan path.
  *
  * Shape: one read → `repartition(n)` → one write, with `n` derived from
  * the CURRENT on-disk bytes over the target file size (Hadoop
  * FileSystem listing — no data read to plan the job). The round-robin
  * repartition balances output sizes regardless of input skew. Content
  * is preserved exactly (row-identical, schema-identical) — which is why
  * the operator is oracle-able as a round-trip (q127).
  *
  * The rewrite lands in `outDir` (copy-compact): compact-in-place on
  * object storage is a rename dance best left to table formats;
  * copy-then-swap is the portable form.
  */
object Compaction {

  case class Stats(inFiles: Long, inBytes: Long, outFiles: Long, outBytes: Long)

  private def list(spark: SparkSession, dir: String, suffix: String): (Long, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0L
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(suffix)) { n += 1; bytes += f.getLen }
    }
    (n, bytes)
  }

  /** Compact a HIVE-PARTITIONED parquet dataset, preserving its
    * partition layout — the incremental-index hygiene job (q240): daily
    * [[IndexIngest]] appends accumulate one file per (batch × cell),
    * and this rewrite collapses each partition directory to one
    * scan-sized file while keeping the directory scheme (so dynamic
    * partition pruning on the probe path is untouched) and the
    * within-partition sort (row-group stats stay selective). Content is
    * row-identical — the q240 oracle proves probe rankings byte-equal
    * through the rewrite. `repartition(col(partitionCol))` hashes every
    * row of a partition value into the SAME task (several values may
    * share a task, and AQE may coalesce), so a partition value never
    * splits across tasks and the output is at most one file per
    * partition directory regardless of how many ingest batches fed it. */
  def compactPartitioned(spark: SparkSession, inDir: String, outDir: String,
                         partitionCol: String, sortCol: String): Stats = {
    import org.apache.spark.sql.functions.col
    val (inFiles, inBytes) = list(spark, inDir, ".parquet")
    require(inFiles > 0, s"no parquet files under $inDir")
    // sort by (partitionCol, sortCol): partitionBy's writer REQUIRES an
    // ordering on the partition column and would insert its own sort
    // above a sortCol-only sort — the within-cell order would then
    // survive only via sort stability, which a spilling sort does not
    // guarantee. Sorting on both keys satisfies the writer's requirement
    // (no second sort) and makes the within-cell order unconditional.
    spark.read.parquet(inDir)
      .repartition(col(partitionCol))
      .sortWithinPartitions(col(partitionCol), col(sortCol))
      .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(outDir)
    val (outFiles, outBytes) = list(spark, outDir, ".parquet")
    Stats(inFiles, inBytes, outFiles, outBytes)
  }

  /** Compact `inDir` (parquet) into `outDir` targeting `targetBytes` per
    * output file. Returns before/after stats. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): Stats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val (inFiles, inBytes) = list(spark, inDir, ".parquet")
    require(inFiles > 0, s"no parquet files under $inDir")
    // clamp before the Long→Int narrowing: a tiny targetBytes against a
    // big dataset would otherwise wrap negative and fail repartition
    // AFTER the listing pass. 2^20 output files is far beyond any sane
    // compaction (whose goal is FEWER files) and keeps the quotient safe.
    val nOut = math.min(math.max(1L, (inBytes + targetBytes - 1) / targetBytes), 1L << 20).toInt
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    val (outFiles, outBytes) = list(spark, outDir, ".parquet")
    Stats(inFiles, inBytes, outFiles, outBytes)
  }
}
