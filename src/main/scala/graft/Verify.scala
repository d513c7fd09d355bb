package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // shared session builder (r14): the graded correctness pass executes
    // exactly the session config the bench times — see GraftSession
    val spark = GraftSession.build()
    // Grading-consistency guard (round-6 advisory): the IVF operating
    // knobs (spark.graft.ivf.* conf / SPARK_GRAFT_IVF_* env) change the
    // Spark-side q201/q202/q206/q207 assignments while their oracle SQL
    // is pinned to the default setting — a knob that is live while this
    // harness grades would mismatch BY CONSTRUCTION, not by bug. The
    // env path is process-global (GraftConf.scoped can't revert it), so
    // refuse to grade under it; stray session confs are simply cleared.
    val liveKnobs = sys.env.keys.filter(_.startsWith("SPARK_GRAFT_IVF"))
    require(liveKnobs.isEmpty,
      s"refusing to grade with IVF knob env set: ${liveKnobs.mkString(", ")} " +
        "(oracle SQL is pinned to the default operating point)")
    spark.conf.getAll.keys.filter(_.startsWith("spark.graft.")).foreach(spark.conf.unset)
    new java.io.File(outDir).mkdirs()
    // optional comma-separated name-prefix filter for local iteration
    // (e.g. SPARK_GRAFT_VERIFY_ONLY=q154); the driver runs unfiltered.
    // The oracle_sql.json dump below is filtered identically so
    // oracle_check.py sees a consistent subset.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    val selected = only match {
      case Some(ps) => QueryRegistry.all.filter { case (n, _) => ps.exists(n.startsWith) }
      case None => QueryRegistry.all
    }
    // Declaration order (QueryRegistry.all), not Map hash order — stable,
    // comparable logs across refactors that touch the key set.
    selected.foreach { case (name, qq) =>
      try GraftConf.scoped(spark) {
        qq.build(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val json = JsonStr.obj(selected.collect {
      case (k, qq) if qq.oracle.isDefined => k -> qq.oracle.get
    })
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
