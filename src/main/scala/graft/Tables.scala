package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated fixture tables (TESTDATA.md).
  *
  * All tables are single parquet files per scale factor; at 100 TB the same
  * call sites work unchanged because `spark.read.parquet` accepts
  * directories/globs of many files and plans one partition per row-group
  * split ([SPK] ParquetFileFormat). Nothing here pins partition counts.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** events.ts has shipped as two physical types across fixture
    * generations: TIMESTAMP(NANOS) (which Spark 4 refuses to map to
    * TimestampType — read as raw nanos via the legacy conf and truncate to
    * microseconds, the same truncation DuckDB applies) and TIMESTAMP(MICROS)
    * without UTC adjustment (which Spark reads as TIMESTAMP_NTZ). Both are
    * normalized here to session-local TimestampType so every downstream
    * query sees one canonical type; sessions run with
    * spark.sql.session.timeZone=UTC, making the NTZ→LTZ cast
    * value-preserving and oracle-comparable (DuckDB reads the same file as
    * a naive timestamp).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
