package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: the OPQ alternation recall trajectory on the aniso
  * corpus (extra = 0 is q250's one-shot 0.86 operating point; the
  * graded q257 is extra = 1). `runMain graft.OpqProbe 0 1 2 3` prints
  * one line per depth; `runMain graft.OpqProbe err` prints the round-1
  * quantization-error magnitudes — the measurement that exposed the
  * covariance scale artifact [[graft.queries.VectorQuant]] documents at
  * OpqErrScale (an unscaled error fit rounds the integer covariance to
  * zero and the alternation silently no-ops at a bit-identical 0.86). */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("opq-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    args.find(_.startsWith("n=")).foreach(a =>
      spark.conf.set("spark.graft.aniso.n", a.stripPrefix("n=")))
    if (args.contains("err")) {
      graft.queries.VectorQuant.opqErrStats(spark).show(false)
      spark.stop(); return
    }
    if (args.contains("moved")) {
      graft.queries.VectorQuant.opqMoveStats(spark).show(false)
      spark.stop(); return
    }
    val extras = {
      val nums = args.filterNot(_.startsWith("n=")).toSeq
      if (nums.nonEmpty) nums.map(_.toInt) else Seq(0, 1, 2, 3)
    }
    extras.foreach { e =>
      val t0 = System.nanoTime()
      val df = graft.queries.VectorQuant.opqProbeCert(spark, e)
      val row = df.collect().head
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"OPQPROBE extra=$e recall=${row.getDouble(row.fieldIndex("recall"))}%.4f n_matched=${row.getLong(row.fieldIndex("n_matched"))} (${sec}%.1f s)")
    }
    spark.stop()
  }
}
