package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for declared queries to text files —
  * the optimization round's before/after plan evidence
  * (`plans/r13/<query>_<suffix>.txt`). Usage:
  *
  *   runMain graft.PlanDump <suffix> [prefix,prefix,...]
  *
  * No prefix list = every declared query. Plans are built against
  * `$SPARK_GRAFT_SF_DIR` (default sf0.1) on `local[$SPARK_GRAFT_CPUS]`,
  * the bench contract, so the dumped plan (join strategy choices,
  * PushedFilters, Exchange count) is the one the bench actually runs —
  * modulo AQE re-optimization, which `explain` shows as the initial
  * plan (`isFinalPlan=false`).
  *
  * Planning only — nothing is executed, so dumping is cheap and safe
  * to run for all queries. Queries whose BUILD stages fixture state
  * (manifest tables, xlsx exports) do run that staging, same as any
  * Verify pass.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val prefixes = args.drop(1).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // shared session builder (r14): dumped plans come from the same
    // session config the bench runs — see GraftSession
    val spark = GraftSession.build()
    val outDir = Paths.get(sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r14"))
    Files.createDirectories(outDir)
    val selected = prefixes match {
      case Some(ps) => QueryRegistry.all.filter { case (n, _) => ps.exists(n.startsWith) }
      case None => QueryRegistry.all
    }
    val mode = ExplainMode.fromString("formatted")
    selected.foreach { case (name, qq) =>
      try GraftConf.scoped(spark) {
        val df = qq.build(spark, sfDir)
        val txt = df.queryExecution.explainString(mode)
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
