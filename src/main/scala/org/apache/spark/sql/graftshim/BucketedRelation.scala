package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.BucketSpec
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation, NoopCache}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** The ONE compile-time seam into Spark's `private[sql]` plan
  * constructors, and the reason it exists: a CLUSTERED (bucketed) table
  * layout only eliminates join exchanges if the SCAN reports
  * `HashPartitioning(bucketCols, n)` as its output partitioning, and
  * the only v1 path that reports it is a `HadoopFsRelation` carrying a
  * `BucketSpec` — which the public `spark.read` API attaches ONLY via
  * the session catalog (`saveAsTable`/metastore bucketing). A manifest
  * table deliberately has no metastore: its file list, schema, AND
  * layout contract live in the transaction log. This object rebuilds
  * the exact relation the catalog would have built — same
  * InMemoryFileIndex, same ParquetFileFormat, same BucketSpec — from
  * the manifest's explicit file list, so Catalyst's bucketing machinery
  * (bucket-id file grouping, exchange elimination, bucket pruning)
  * works unchanged on a log-planned table.
  *
  * Kept to construction only — no physical-plan or analyzer behavior is
  * overridden — and isolated in this package so the graft codebase has
  * exactly one PACKAGE with access wider than the public API (the only
  * other seam is [[StreamingFrame]], the one-call streaming re-tag the
  * CDC source needs). */
object BucketedRelation {

  def parquetWithBuckets(spark: SparkSession, basePath: String, files: Seq[Path],
      fullSchema: StructType, numBuckets: Int, bucketCols: Seq[String]): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val index = new InMemoryFileIndex(
      classic, files, Map("basePath" -> basePath), None, NoopCache, None, None)
    val partNames = index.partitionSchema.fieldNames.toSet
    val dataSchema = StructType(fullSchema.filterNot(f => partNames(f.name)))
    val rel = HadoopFsRelation(index, index.partitionSchema, dataSchema,
      Some(BucketSpec(numBuckets, bucketCols, Nil)),
      new ParquetFileFormat(), Map("basePath" -> basePath))(classic)
    org.apache.spark.sql.classic.Dataset.ofRows(classic, LogicalRelation(rel))
  }
}
