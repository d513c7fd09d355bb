package graft.xlsx
import org.apache.spark.sql.SparkSession
object ScanPerfProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.sql.shuffle.partitions", 1)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $tag n=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.read.format("xlsx").load(path).count() // warm + infer
    t("infer-schema") { spark.read.format("xlsx").load(path).schema.size.toLong }
    val df = spark.read.format("xlsx").load(path)
    t("scan-count") { df.count() }
    t("scan-count2") { spark.read.format("xlsx").load(path).count() }
    t("scan-allcols") { df.groupBy().max("checksum").count() }
    spark.stop()
  }
}
