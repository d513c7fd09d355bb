package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected pair list, by
  * iterative edge CONTRACTION — the missing last mile of a dedup
  * pipeline (near-dup PAIRS → duplicate CLUSTERS → one survivor each).
  *
  * Each round: every node of the current (contracted) graph points to
  * the minimum of itself and its neighbors; the pointer map is composed
  * with itself once (flattens two-level trees); every edge is rewritten
  * into pointer-target space and self-edges are dropped. Components
  * therefore merge along ALL their internal edges simultaneously and
  * the edge set shrinks geometrically; the loop ends when no edges
  * remain, i.e. every component has collapsed to one representative.
  * This is the contraction scheme of the published MapReduce CC
  * algorithms (Kiveris et al., "Connected Components in MapReduce and
  * Beyond"-family), chosen over pure label propagation whose round
  * count is bounded below by graph DIAMETER (measured on the fixture
  * near-dup graph: 15 propagation rounds vs 4 contraction rounds).
  *
  * Nodes are ordered by `(xxhash64(id), id)` rather than raw id: a
  * chain whose ids increase monotonically along the chain makes raw
  * min-contraction shrink by O(1) nodes per round (every node's min
  * neighbor is distinct), while under a hashed order roughly half the
  * nodes are local minima and every component halves w.h.p. per round.
  * The hash only randomizes the ORDER — ties are broken by the id
  * itself, so hash collisions cannot merge distinct nodes.
  *
  * Scale shape: round 0 shuffles the full edge list once (grouped
  * min + relabel); every later round touches only the contracted
  * graph, which is at most half the previous round's size — the full
  * per-node label table is updated by a join against the SMALL pointer
  * map (broadcast below a size threshold — which does stage the map
  * through the driver, the standard broadcast cost, bounded by that
  * threshold — shuffle-hash otherwise). Row data never reaches the
  * driver by any other path (the only other driver-side values are
  * scalar counts); lineage is truncated with EAGER
  * localCheckpoints so plan size stays constant across rounds, and
  * superseded label/edge/pointer generations are unpersisted as soon
  * as their successor is materialized, so cache use is O(1) in rounds
  * (cf. GraphFrames' iterative-algorithm housekeeping).
  */
object ConnectedComponents {

  /** Below this many pointer-map rows the relabel joins use a broadcast
    * hint (checkpointed RDDs carry no stats, so Spark would otherwise
    * default every one of these joins to sort-merge). */
  private val BroadcastRows = 1000000L

  /** Above this many pointer-map rows the relabel joins fall back to
    * sort-merge: a shuffled-hash build holds one partition of the map
    * PER CONCURRENT TASK in execution memory, so its safe ceiling is
    * (heap × fraction) / concurrency — NOT a constant. Measured at the
    * ×1000 entity-resolution decade (19.6M-node / 78.7M-directed-edge
    * fuzzy graph): 32 concurrent ~600k-row builds exhausted the 8g
    * probe JVM ("not enough memory to build hash map"), while
    * sort-merge spills and finishes. Between the two bounds
    * shuffle-hash wins (no sort, bounded build); above, spillability
    * beats the sort savings — the same policy AQE applies when stats
    * exist, pinned here because checkpointed RDDs have none. */
  private val ShuffleHashRows = 8000000L

  /** Once the contracted graph has at most this many (directed) edges it
    * is finished in ONE executor task by a plain union-find instead of
    * paying several more scheduler rounds — each distributed round costs
    * a fixed number of jobs + plan compiles, which dominates end-game
    * cost (the contracted graph shrinks geometrically, so the tail
    * rounds process trivial data). 2^20 edges ≈ tens of MB in one task:
    * bounded executor memory for the union-find itself; the resulting
    * pointer map (≤ 2·2^20 rows) relabels via a shuffle-hash join unless
    * it fits the BroadcastRows bound. At 100 TB the loop stays
    * distributed until contraction brings the graph under the
    * threshold, which it must (or the require below fires). */
  private val LocalFinishEdges = 1L << 20

  /** @param pairs undirected edges, one per row
    * @param a,b   the two endpoint columns (same orderable type)
    * @return one row per node appearing in `pairs`: (id, label) where
    *         label = min node id of the node's component */
  def apply(pairs: DataFrame, a: String, b: String, maxRounds: Int = 50,
            localFinishEdges: Long = LocalFinishEdges): DataFrame = {
    // randomized total order; `v` carries the original value
    def key(c: Column) = struct(xxhash64(c).as("h"), c.as("v"))

    // raw pairs materialized ONCE (the pair pipeline feeding this
    // operator is typically the expensive part); self-pairs are kept
    // here so their nodes appear in the output, and dropped only from
    // the contraction edge set (they carry no connectivity)
    val raw = pairs.select(key(col(a)).as("src"), key(col(b)).as("dst"))
      .localCheckpoint()
    val p0 = raw.filter(col("src") =!= col("dst"))
    var e = p0.union(p0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()

    // per-ORIGINAL-node label, updated each round by composing the
    // round's pointer map. EAGER checkpoints throughout: each label
    // generation must be materialized before the edge generation it was
    // derived from is unpersisted below — local checkpoints truncate
    // lineage, so a lazy chain evaluated only at the end would try to
    // recompute through freed blocks (timing-dependent crash).
    var labels = raw.select(col("src")).union(raw.select(col("dst").as("src")))
      .distinct()
      .select(col("src").as("id"), col("src").as("label"))
      .localCheckpoint()
    freeCheckpoint(raw) // edge set and initial labels are materialized

    // the id column's external type must be Comparable for the one-task
    // union-find finish (every realistic id type is; binary/array ids
    // simply stay on the distributed path)
    val vComparable = {
      import org.apache.spark.sql.types._
      pairs.schema(a).dataType match {
        case BooleanType | ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType | StringType | DateType | TimestampType |
             TimestampNTZType => true
        case _: DecimalType => true
        case _ => false // binary/array/struct ids stay distributed
      }
    }

    // ONE hint policy for every small-map join in the loop: broadcast
    // COLLECTS the map to the driver to ship it, so it is gated on
    // BroadcastRows; larger maps shuffle-hash (checkpointed RDDs carry
    // no stats, so Spark would otherwise sort-merge all of these).
    def sized(map: DataFrame, mapRows: Long): DataFrame =
      if (mapRows <= BroadcastRows) broadcast(map)
      else if (mapRows <= ShuffleHashRows) map.hint("shuffle_hash")
      else map.hint("merge") // spillable — see ShuffleHashRows

    // compose labels with a pointer map (src → t), checkpoint the new
    // generation, free the old. Shared by both loop branches so their
    // join semantics can never drift.
    def relabel(current: DataFrame, ptr: DataFrame, mapRows: Long): DataFrame = {
      val next = current
        .join(sized(ptr, mapRows).select(col("src").as("ls"), col("t").as("lt")),
          col("label") === col("ls"), "left")
        .select(col("id"), coalesce(col("lt"), col("label")).as("label"))
        .localCheckpoint()
      freeCheckpoint(current)
      next
    }

    var n = e.count()
    var round = 0
    while (n > 0 && round < maxRounds) {
      if (n <= localFinishEdges && vComparable) {
        // end-game: the remaining graph fits one task — resolve every
        // contracted node to its component root (min hashed key, same
        // representative the distributed rounds would converge to) in a
        // single job, skipping the remaining O(log) scheduler rounds.
        // The pointer map has ≤ 2n rows (both endpoints of every edge).
        val ptr = localUnionFind(e).localCheckpoint()
        labels = relabel(labels, ptr, mapRows = 2 * n)
        freeCheckpoint(ptr)
        freeCheckpoint(e)
        n = 0
      } else {
        // pointer map over the current contracted graph: min of self and
        // neighbors, composed once so two-level trees flatten in-round.
        // EAGER checkpoints: both maps are referenced several times below
        // (compose, relabel, both edge endpoints) — lazy ones would be
        // raced into materialization by concurrent task sets.
        val rl0 = e.groupBy("src").agg(min(col("dst")).as("m"))
          .select(col("src"), least(col("src"), col("m")).as("t"))
          .localCheckpoint()
        val rl = rl0
          .join(rl0.select(col("src").as("s2"), col("t").as("t2")),
            col("t") === col("s2"), "left")
          .select(col("src"), coalesce(col("t2"), col("t")).as("t"))
          .localCheckpoint()
        val hinted = sized(rl, n)

        labels = relabel(labels, rl, mapRows = n)

        // contract: rewrite both endpoints into pointer-target space,
        // drop collapsed self-edges, dedupe the merged multi-edges
        val e2 = e
          .join(hinted.select(col("src").as("ss"), col("t").as("st")), col("src") === col("ss"))
          .join(hinted.select(col("src").as("ds"), col("t").as("dt")), col("dst") === col("ds"))
          .select(col("st").as("src"), col("dt").as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
          .localCheckpoint()
        n = e2.count()
        // e2, labels and this round's pointer maps are all materialized —
        // the previous edge generation and the pointer maps are dead
        freeCheckpoint(e)
        freeCheckpoint(rl0)
        freeCheckpoint(rl)
        e = e2
        round += 1
      }
    }
    require(n == 0, s"connected components did not converge in $maxRounds rounds")
    freeCheckpoint(e) // terminal (empty) edge generation

    // representatives were chosen under the HASHED order; the contract
    // is label = min ORIGINAL id per component, so re-minimize per
    // representative and map back. The giant-component hot key is
    // absorbed by partial aggregation (map-side combine).
    val mins = labels.groupBy("label").agg(min(col("id.v")).as("m"))
    labels.join(mins, "label").select(col("id.v").as("id"), col("m").as("label"))
  }

  /** One-task exact union-find over a bounded edge list: emits the
    * complete pointer map (node → component root) of the contracted
    * graph, root = min (hash, id) key — the same representative the
    * distributed contraction converges to. Runs as ONE executor task
    * via coalesce(1) (no shuffle, no driver collect); callers gate on
    * [[LocalFinishEdges]] so the hash map is bounded. */
  private def localUnionFind(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val keyType = e.schema("src").dataType
    val out = e.rdd.coalesce(1).mapPartitions { it =>
      import scala.collection.mutable
      // (h, v) total order, nulls first on v — mirrors Spark's asc
      // struct ordering used by the distributed min() rounds
      def cmp(x: Row, y: Row): Int = {
        val c = java.lang.Long.compare(x.getLong(0), y.getLong(0))
        if (c != 0) c
        else (x.get(1), y.get(1)) match {
          case (null, null) => 0
          case (null, _) => -1
          case (_, null) => 1
          case (p: Comparable[_], q) => p.asInstanceOf[Comparable[Any]].compareTo(q)
        }
      }
      val parent = mutable.HashMap.empty[Row, Row] // absent key = root
      val nodes = mutable.LinkedHashSet.empty[Row]
      def find(x0: Row): Row = {
        var x = x0
        var p = parent.getOrElse(x, x)
        while (p != x) { x = p; p = parent.getOrElse(x, x) }
        var y = x0 // path compression
        while (y != x) { val nx = parent(y); parent(y) = x; y = nx }
        x
      }
      it.foreach { r =>
        val (s, d) = (r.getStruct(0), r.getStruct(1))
        nodes += s; nodes += d
        val (rs, rd) = (find(s), find(d))
        if (rs != rd) {
          if (cmp(rs, rd) <= 0) parent(rd) = rs else parent(rs) = rd
        }
      }
      nodes.iterator.map(nd => Row(nd, find(nd)))
    }
    e.sparkSession.createDataFrame(out,
      StructType(Seq(StructField("src", keyType), StructField("t", keyType))))
  }

  /** The returned relation is backed by ONE cached node-size label
    * table (it cannot be freed inside apply — the result reads it).
    * Long-lived sessions running many CC invocations should release it
    * once the result is consumed: `ConnectedComponents.free(result)`. */
  def free(result: DataFrame): Unit = freeCheckpoint(result)

  /** Unpersist the RDD blocks behind a localCheckpoint'd DataFrame
    * (Dataset.unpersist only covers CacheManager entries, not
    * checkpoint storage). Non-blocking; safe on never-materialized or
    * already-freed checkpoints. */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(false))
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
