package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Differential-fuzzing runner (VERDICT r4 directive #2).
  *
  * Generates [[graft.fuzz.QueryGen]] cases for a seed, executes each SQL
  * text in Spark over the fixture temp views, and dumps results in the
  * EXACT layout `Verify` uses (parquet part-files under `outDir/<name>/` +
  * `outDir/oracle_sql.json`, where the "oracle" SQL is the same text) —
  * so `scripts/oracle_check.py` performs the DuckDB differential compare
  * unchanged. Any schema/row/value mismatch it reports is a real dialect
  * divergence between Spark and DuckDB on that SQL.
  *
  * Usage: runMain graft.FuzzVerify <sfDir> <outDir> [nCases] [seed]
  */
object FuzzVerify {
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    Tables.region(spark, sfDir).createOrReplaceTempView("region")
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val n = if (args.length > 2) args(2).toInt else 250
    val seed = if (args.length > 3) args(3).toLong else 42L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    registerViews(spark, sfDir)

    val cases = fuzz.QueryGen.cases(seed, n)
    var failed = 0
    cases.foreach { c =>
      try
        spark.sql(c.sql).coalesce(1).write.mode("overwrite").parquet(s"$outDir/${c.name}")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[fuzz] ${c.name} FAILED IN SPARK: ${e.getMessage}\n${c.sql}")
      }
    }
    val json = JsonStr.obj(cases.map(c => c.name -> c.sql))
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[fuzz] ${cases.size} cases generated (seed=$seed), $failed failed in Spark")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
