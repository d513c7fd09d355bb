package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected pair list, by
  * iterative min-label propagation with pointer jumping — the missing
  * last mile of a dedup pipeline (near-dup PAIRS → duplicate CLUSTERS →
  * one survivor each).
  *
  * Every node starts labeled with itself; each round every node takes
  * (1) the minimum label among itself and its neighbors — the self-loop
  * edges make "itself" part of the same aggregate, so this is ONE join +
  * ONE groupBy — then (2) a pointer-jumping step (label := label of
  * label) that halves remaining path lengths, giving O(log n) rounds on
  * chains instead of O(diameter).
  *
  * Scale shape: each round is two equi-joins and a groupBy-min, all
  * shuffled on node id; nothing is ever collected to the driver (the
  * only driver-side value is the scalar convergence count). The input
  * pair pipeline is materialized once, and lineage is truncated with
  * localCheckpoint every round so the plan size stays constant across
  * iterations (the standard device for iterative DataFrame algorithms,
  * cf. GraphFrames' CC).
  */
object ConnectedComponents {

  /** @param pairs undirected edges, one per row
    * @param a,b   the two endpoint columns (same orderable type)
    * @return one row per node appearing in `pairs`: (id, label) where
    *         label = min node id of the node's component */
  def apply(pairs: DataFrame, a: String, b: String, maxRounds: Int = 50): DataFrame = {
    // materialize the (possibly expensive) pair pipeline ONCE before the
    // two-direction union — otherwise each union branch recomputes it
    val p = pairs.select(col(a).as("src"), col(b).as("dst")).localCheckpoint()
    val nodes = p.select(col("src")).union(p.select(col("dst").as("src"))).distinct()
    // both directions + a self-loop per node: the self-loop feeds the
    // node's own label into the neighborhood-min aggregate. No distinct:
    // duplicate edges are harmless under min (idempotent) and deduping
    // would cost a full extra shuffle every bit as large as the input.
    val edges = p
      .union(p.select(col("dst").as("src"), col("src").as("dst")))
      .union(nodes.select(col("src"), col("src").as("dst")))
      .localCheckpoint()
    // in-loop checkpoints are LAZY: the round's single count() action
    // materializes the whole round pipeline once — eager checkpoints
    // would cost two extra jobs per round for the same result
    var labels = nodes.select(col("src").as("id"), col("src").as("label"))
      .localCheckpoint(false)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      // (1) min over {self} ∪ neighbors; the self-loop row doubles as the
      // carrier of the round-start label for the convergence check
      // shuffle-hash, not sort-merge: label tables are re-joined every
      // round, and hashing skips the per-round sort of both sides (the
      // strategy GraphX-style iterative joins use); checkpointed RDDs
      // have no stats, so Spark would otherwise default to SMJ
      val next = edges
        .join(labels.select(col("id").as("did"), col("label")).hint("shuffle_hash"),
          col("dst") === col("did"))
        .groupBy("src")
        .agg(min("label").as("lbl"),
          min(when(col("dst") === col("src"), col("label"))).as("prev"))
        .localCheckpoint(false)
      // (2) pointer jump: label := label(label) — halves path lengths
      val fin = next
        .join(next.select(col("src").as("jid"), col("lbl").as("jlbl")),
          col("lbl") === col("jid"), "left")
        .select(col("src").as("id"), coalesce(col("jlbl"), col("lbl")).as("label"),
          col("prev"))
        .localCheckpoint(false)
      changed = fin.filter(col("label") < col("prev")).count()
      labels = fin.select(col("id"), col("label"))
      round += 1
    }
    require(changed == 0, s"connected components did not converge in $maxRounds rounds")
    labels
  }
}

/** End of the dedup pipeline: apply a pair list to a corpus. */
object Dedup {
  import org.apache.spark.sql.functions.col

  /** Keep one row per duplicate cluster: resolve the candidate `pairs`
    * to components ([[ConnectedComponents]]) and anti-join away every
    * non-survivor (survivor = minimum id of its cluster). Rows that
    * appear in no pair pass through untouched — so the output is the
    * cleaned corpus, ready to feed the next pipeline stage. */
  def keepSurvivors(df: DataFrame, idCol: String,
                    pairs: DataFrame, a: String, b: String): DataFrame = {
    val losers = ConnectedComponents(pairs, a, b)
      .filter(col("id") =!= col("label"))
      .select(col("id").as("__dup_id"))
    df.join(losers, df(idCol) === col("__dup_id"), "left_anti")
  }
}
