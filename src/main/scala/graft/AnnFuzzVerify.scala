package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** ANN-family differential-fuzzing runner (round-8, VERDICT r7 #5).
  *
  * Executes each [[graft.fuzz.AnnGen]] case's SPARK-dialect SQL (with
  * the fused argmin expression registered — the production hot path)
  * and dumps results in the exact `Verify` layout, with the case's
  * DUCKDB-dialect twin as the oracle SQL — `scripts/oracle_check.py`
  * performs the differential compare unchanged. The corpora are
  * self-contained (deterministic integer vectors from range()), so no
  * fixture dir is read; the sfDir argument is accepted and ignored for
  * interface uniformity with FuzzVerify.
  *
  * Usage: runMain graft.AnnFuzzVerify <sfDir> <outDir> [nCases] [seed]
  */
object AnnFuzzVerify {
  def main(args: Array[String]): Unit = {
    val outDir = args(1)
    val n = if (args.length > 2) args(2).toInt else 300
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
    graft.functions.ArgminL2Micro.register(spark)
    graft.functions.PqAdcMicro.register(spark) // + dense_lut_micro (v8)
    graft.functions.PqEncodeMicro.register(spark) // + pq_encode_shift_micro (v8)
    graft.functions.CovOuterMicro.register(spark) // v8 covariance shape
    val cases = fuzz.AnnGen.cases(seed, n)
    var failed = 0
    cases.foreach { c =>
      try
        spark.sql(c.sparkSql).coalesce(1).write.mode("overwrite").parquet(s"$outDir/${c.name}")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[annfuzz] ${c.name} FAILED IN SPARK: ${e.getMessage}\n${c.sparkSql}")
      }
    }
    val json = JsonStr.obj(cases.map(c => c.name -> c.duckSql))
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[annfuzz] ${cases.size} cases generated (seed=$seed), $failed failed in Spark")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
