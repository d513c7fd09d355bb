package graft.etl
object ArgminPerfProbe {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $tag n=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val q = graft.QueryRegistry.all.find(_._1 == "q99_centroid_assign").get._2
    q.build(spark, sf).count() // warm
    t("q99-codegen-on") { q.build(spark, sf).count() }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    t("q99-codegen-off") { q.build(spark, sf).count() }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.stop()
  }
}
