package graft.etl
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.util.Properties
object JdbcPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    DuckDbDialect.registered
    val df = spark.range(25000).repartition(4).select(
      col("id"), (col("id") % 997).as("b"), concat(lit("x"), col("id")).as("s"),
      (col("id") / 7.0).as("d"))
    df.count()
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"PROBE $tag ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val p1 = new Properties()
    t("default-batch")(df.write.mode(SaveMode.Overwrite).jdbc("jdbc:duckdb:/tmp/probe1.duckdb", "t1", p1))
    val p2 = new Properties(); p2.setProperty("batchsize", "10000")
    t("batch-10k")(df.write.mode(SaveMode.Overwrite).jdbc("jdbc:duckdb:/tmp/probe2.duckdb", "t2", p2))
    t("again-default")(df.write.mode(SaveMode.Overwrite).jdbc("jdbc:duckdb:/tmp/probe3.duckdb", "t3", p1))
    spark.stop()
  }
}
