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
    StreamingBatch,
    Sources,
    Extras,
    Analytics,
    TextScoring,
    ScalePatterns
  )

  val all: Seq[(String, Q)] = modules.flatMap(_.queries)

  require(all.map(_._1).distinct.size == all.size,
    s"duplicate query keys: ${all.map(_._1).diff(all.map(_._1).distinct)}")
}
