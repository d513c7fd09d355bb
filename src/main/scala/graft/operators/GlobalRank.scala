package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact global ranking WITHOUT the single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY funnels every
  * row through ONE task — the canonical scale cliff for exact ranking /
  * equi-depth binning at 100 TB. This operator computes the identical
  * rank distributed:
  *
  *   1. `repartitionByRange` on the sort key (parallel range exchange —
  *      the same machinery as a global ORDER BY, sampling determines
  *      deterministic bounds) + `sortWithinPartitions`;
  *   2. one cheap pass counts rows per partition (collects ONE long per
  *      partition to the driver — bounded by partition count, not data);
  *   3. cumulative offsets are broadcast back, and each partition stamps
  *      `offset + local position`.
  *
  * The sort key must be a TOTAL order (include a unique tiebreaker) or
  * equal keys straddling a range boundary would make ranks depend on the
  * sampled bounds. With a total order the result is exactly
  * `row_number() OVER (ORDER BY sortCols)`.
  *
  * The ranked data is cached (memory-and-disk) between the count pass
  * and the stamping pass so the heavy exchange runs once; callers should
  * trigger their terminal action and the cache is dropped with the RDD.
  */
object GlobalRank {

  def withRowNumber(df: DataFrame, sortCols: Seq[Column], rankName: String,
                    partitions: Int, reliable: Boolean = false): DataFrame =
    withRowNumberAndTotal(df, sortCols, rankName, partitions, reliable)._1

  /** As [[withRowNumber]], but also returns the TOTAL row count — already
    * known from the count pass, so callers needing a denominator (e.g.
    * equi-depth binning) don't re-scan the source for it.
    *
    * `reliable = false` (default) materializes the ranked frame with a
    * LOCAL checkpoint: lineage is truncated and the result blocks live
    * only on the executors that computed them. Fast (no re-traversal on
    * reuse), but a lost executor later makes the returned frame
    * UNRECOVERABLE — the job fails with a missing-checkpoint-block error
    * instead of recomputing. Right for the common case: rank, consume,
    * drop, all within one job wave.
    *
    * `reliable = true` persists the stamped RDD (memory-and-disk)
    * WITHOUT truncating lineage: a lost block recomputes from source —
    * the range exchange re-runs for that lineage, slower but never
    * fatal. Right for long-lived ranked frames on preemptible/spot
    * executors. Recompute is deterministic: the RangePartitioner keeps
    * its sampled bounds (no resampling on retry), the contract-required
    * total order fixes within-partition row order, and the stamping
    * closure captures only the offsets array (one Long per partition). */
  def withRowNumberAndTotal(df: DataFrame, sortCols: Seq[Column], rankName: String,
                            partitions: Int, reliable: Boolean = false): (DataFrame, Long) = {
    require(partitions > 0, "partitions must be positive")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = sorted.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: one Long per partition to the driver. Counted with an
    // explicit Long loop — Iterator.size returns Int and would wrap
    // negative past 2^31 rows per partition, exactly the scale this
    // operator exists for.
    val counts = rdd.mapPartitionsWithIndex { (i, it) =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single((i, n))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    // pass 2: stamp offset + local position (cache hit, no re-shuffle),
    // MATERIALIZED via an eager local checkpoint. This closes the
    // lifetime problem cleanly: the sorted cache is released as soon as
    // the stamping pass has consumed it (below, deterministically — not
    // "on the next invocation", which would silently re-run the range
    // exchange for a caller holding two live ranked frames), and the
    // checkpointed result blocks are freed by the ContextCleaner when
    // the returned frame is dropped. Costs one extra traversal of the
    // cached partitions; the heavy exchange still runs exactly once.
    val stampedBase = rdd.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    val stamped =
      if (reliable)
        stampedBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else stampedBase.localCheckpoint()
    stamped.count() // force materialization while the sorted cache is live
    rdd.unpersist(blocking = false)
    val schema = StructType(sorted.schema.fields :+ StructField(rankName, LongType, nullable = false))
    (spark.createDataFrame(stamped, schema), offsets.last)
  }
}
