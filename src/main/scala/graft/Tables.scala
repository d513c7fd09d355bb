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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to TimestampType. Read it as raw nanos (legacy conf) and truncate to
    * microseconds with exact integer division — the same truncation DuckDB
    * applies, so `ts` stays oracle-comparable.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
