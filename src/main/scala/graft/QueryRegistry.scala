package graft

import graft.queries._

/** Aggregates every QueryModule into the flat maps SparkEntry exposes.
  * Keys are stable driver-contract identifiers — never rename, only add.
  */
object QueryRegistry {
  private val modules: Seq[QueryModule] = Seq(
    Relational,
    Windows,
    Aggregates,
    AdvancedJoins,
    Scalars,
    Llm,
    VectorQuant,
    TableFormat,
    StreamingBatch,
    Sources,
    Extras,
    Analytics,
    TextScoring,
    ScalePatterns,
    Fuzzed
  )

  val all: Seq[(String, Q)] = modules.flatMap(_.queries)

  require(all.map(_._1).distinct.size == all.size,
    s"duplicate query keys: ${all.map(_._1).diff(all.map(_._1).distinct)}")
}

/** Scopes `spark.graft.*` session confs to one block. A query builder that
  * sets engine confs (q125 sets `spark.graft.rangeJoin.binSize` so the
  * BandedRangeJoin rule fires at ITS OWN optimization time) would otherwise
  * leak the setting into every later query on the shared session — plans
  * and timings of unrelated queries silently change. Verify and Bench wrap
  * each query's build+execute in this scope, so the conf is live exactly
  * while that query optimizes and runs, then reverts. (The optimizer reads
  * the conf at action time, which is why the RESTORE must happen after the
  * action, not after the build — hence harness-level scoping rather than
  * builder-level.) */
object GraftConf {
  private val Prefix = "spark.graft."
  def scoped[T](spark: org.apache.spark.sql.SparkSession)(f: => T): T = {
    val before = spark.conf.getAll.filter { case (k, _) => k.startsWith(Prefix) }
    try f
    finally {
      spark.conf.getAll.keys.filter(_.startsWith(Prefix))
        .filterNot(before.contains).foreach(spark.conf.unset)
      before.foreach { case (k, v) => spark.conf.set(k, v) }
    }
  }
}
