package graft

import graft.operators.IndexManifest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BLOOM-PROBE PLANNING COST, measured (the readPoints scale claim:
  * "O(candidate files) bounded footer reads at planning, cached").
  * Builds a real manifest table whose layout defeats zone maps on the
  * probe column (mod-split appends, files sorted by another column),
  * with footer blooms declared — then times [[IndexManifest.planPoint]]
  * COLD (first probe: every candidate's footer read once) and WARM
  * (the LRU holds the blooms; planning is pure hashing). Local file://
  * understates the cold cost vs an object store exactly like the
  * listing comparison does — the honest statement is reads-per-probe,
  * which this also prints.
  *
  * Usage: `runMain graft.BloomProbeBench [filesTarget]` (default ~256).
  */
object BloomProbeBench {
  def main(args: Array[String]): Unit = {
    val target = if (args.length > 0) args(0).toInt else 256
    val spark = SparkSession.builder()
      .appName("bloom-probe-bench").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    val dir = s"/tmp/graft_llm/bloom_probe_bench_$target"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)

    // 16 partitions × (target/16) commits ⇒ ~target files; vec_id is a
    // modular permutation so every file spans the whole domain (zone
    // maps keep everything; only blooms prune)
    val n = 200000L
    // slice on (id div 16) so every commit carries ALL 16 partition
    // values (16 files per commit), while vec_id stays a whole-domain
    // permutation inside every file (zone maps keep everything)
    def slice(k: Int, of: Int) = spark.range(0, n)
      .selectExpr(s"(id * 7919) % $n AS vec_id", "id AS w", "cast(id % 16 as int) AS cell")
      .filter((col("w") / 16).cast("long") % of === k)
    val commits = math.max(1, target / 16)
    IndexManifest.publishBase(spark, slice(0, commits), dir,
      IndexManifest.TableSpec("cell", Seq("w"), bloomCols = Seq("vec_id")))
    (1 until commits).foreach(k =>
      IndexManifest.appendBatch(spark, slice(k, commits), dir, s"feed_$k"))
    val st = IndexManifest.currentState(spark, dir).get

    def wallMs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    val probe = Seq(7919L % n)
    val cold = wallMs {
      val (scan, _, skipped) = IndexManifest.planPoint(spark, dir, st, "vec_id", probe)
      require(skipped > 0 && scan.nonEmpty)
    }
    val warms = (1 to 5).map(_ => wallMs {
      IndexManifest.planPoint(spark, dir, st, "vec_id", probe): Unit
    })
    val (scan, zs, bs) = IndexManifest.planPoint(spark, dir, st, "vec_id", probe)
    println(s"""{"metric":"bloom_probe_bench","files":${st.files.size},""" +
      s""""cold_plan_ms":$cold,"warm_plan_ms":${warms.min},""" +
      s""""footer_reads_cold":${st.files.size},"scan_files":${scan.size},""" +
      s""""zone_skipped":$zs,"bloom_skipped":$bs}""")
    spark.stop()
  }
}
