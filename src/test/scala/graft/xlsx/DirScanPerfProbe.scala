package graft.xlsx
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DirScanPerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $tag n=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.read.format("xlsx").load(dir).count() // warm
    t("dir-count") { spark.read.format("xlsx").load(dir).count() }
    val df = spark.read.format("xlsx").load(dir)
    t("dir-agg") { df.agg(count(lit(1)), sum("checksum"), max("price")).head(); 1L }
    t("dir-partitions") { df.rdd.getNumPartitions.toLong }
    spark.stop()
  }
}
