package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected pair list, by
  * iterative min-label propagation — the missing last mile of a dedup
  * pipeline (near-dup PAIRS → duplicate CLUSTERS → one survivor each).
  *
  * Every node starts labeled with itself; each round every node takes the
  * minimum of its own label and its neighbors' labels, until no label
  * changes. Converges to label = min node id reachable, in at most
  * diameter rounds (near-dup graphs are small and flat, so a handful).
  *
  * Scale shape: each round is one equi-join plus one groupBy-min — both
  * shuffle on node id, nothing is ever collected to the driver (the only
  * driver-side value is the scalar convergence count). Lineage is
  * truncated with localCheckpoint every round so the plan size stays
  * constant across iterations (the standard device for iterative
  * DataFrame algorithms, cf. GraphFrames' CC).
  */
object ConnectedComponents {

  /** @param pairs undirected edges, one per row
    * @param a,b   the two endpoint columns (same orderable type)
    * @return one row per node appearing in `pairs`: (id, label) where
    *         label = min node id of the node's component */
  def apply(pairs: DataFrame, a: String, b: String, maxRounds: Int = 50): DataFrame = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val nbrMin = edges
        .join(labels.select(col("id").as("did"), col("label")), col("dst") === col("did"))
        .groupBy("src").agg(min("label").as("nbr_min"))
        .withColumnRenamed("src", "nid")
      val next = labels.join(nbrMin, col("id") === col("nid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("next_label"),
          col("label").as("prev_label"))
        .localCheckpoint()
      changed = next.filter(col("next_label") < col("prev_label")).count()
      labels = next.select(col("id"), col("next_label").as("label"))
      round += 1
    }
    require(changed == 0, s"connected components did not converge in $maxRounds rounds")
    labels
  }
}
