package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact global EXCLUSIVE running sum WITHOUT the single-partition window.
  *
  * `SUM(w) OVER (ORDER BY ...)` with no PARTITION BY funnels every row
  * through one task — the same scale cliff GlobalRank removes for
  * row_number, here removed for the weighted prefix sum that powers
  * token-budget batch assignment, contiguous shard cutting, and
  * cumulative-quota delivery. Same two-pass shape as
  * [[GlobalRank.withRowNumberAndTotal]]:
  *
  *   1. `repartitionByRange` on the sort key + `sortWithinPartitions`;
  *   2. one cheap pass sums the weight per partition (ONE long per
  *      partition to the driver — bounded by partition count, not data);
  *   3. cumulative offsets broadcast back; each partition stamps
  *      `offset + running local sum` (exclusive: a row's prefix does NOT
  *      include its own weight, so `prefix DIV budget` is the batch the
  *      row STARTS in).
  *
  * The sort key must be a TOTAL order (unique tiebreaker), or rows with
  * equal keys straddling a range boundary would make prefixes depend on
  * the sampled bounds. Weights must be non-negative Longs; the Long
  * accumulator bounds the usable total at 2^63 (9.2e18 — ~9 exabytes of
  * char weight, not the constraint at 100 TB).
  *
  * Materialization discipline is GlobalRank's: the range-exchanged sort
  * is cached across the two passes, the stamped result is local-
  * checkpointed eagerly, and the sort cache is released deterministically
  * once stamping has consumed it.
  */
object PrefixSum {

  /** Appends `prefixName` = exclusive running sum of `weightCol` in
    * (sortCols) total order. `weightCol` must be LongType (cast first).
    *
    * `reliable` mirrors [[GlobalRank.withRowNumberAndTotal]] exactly:
    * `false` (default) truncates lineage with a LOCAL checkpoint — fast,
    * but a lost executor later makes the returned frame UNRECOVERABLE
    * (right for rank-consume-drop within one job wave); `true` persists
    * WITHOUT truncating lineage, so a lost block recomputes from source
    * — slower on loss, never fatal, right for long-lived prefixed frames
    * on preemptible/spot executors. Recompute is deterministic for the
    * same reasons as GlobalRank: the RangePartitioner keeps its sampled
    * bounds, the contract-required total order fixes row order, and the
    * stamping closure captures only the offsets array. */
  def withPrefixSum(df: DataFrame, sortCols: Seq[Column], weightCol: String,
                    prefixName: String, partitions: Int,
                    reliable: Boolean = false): DataFrame =
    withPrefixSums(df, sortCols, Seq(weightCol -> prefixName), partitions, reliable)

  /** [[withPrefixSum]] for SEVERAL weight columns in one pass: one
    * range exchange, one sort, one cached materialization, one
    * per-partition totals collect (an Array[Long] of size #weights per
    * partition) — instead of re-shuffling and re-collecting per weight
    * (q174 stamps both CDF numerators through this). `weights` maps
    * each LongType weight column to its new prefix column name. */
  def withPrefixSums(df: DataFrame, sortCols: Seq[Column],
                     weights: Seq[(String, String)], partitions: Int,
                     reliable: Boolean = false): DataFrame = {
    require(partitions > 0, "partitions must be positive")
    require(weights.nonEmpty, "at least one weight column required")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    weights.foreach { case (w, _) =>
      require(sorted.schema(w).dataType == LongType,
        s"$w must be LongType, got ${sorted.schema(w).dataType.sql}")
    }
    val wIdxs = weights.map { case (w, _) => sorted.schema.fieldIndex(w) }.toArray
    val nw = wIdxs.length
    val rdd = sorted.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: nw Longs (partition weight totals) per partition
    val sums = rdd.mapPartitionsWithIndex { (i, it) =>
      val s = new Array[Long](nw)
      while (it.hasNext) {
        val row = it.next()
        var k = 0
        while (k < nw) { s(k) += row.getLong(wIdxs(k)); k += 1 }
      }
      Iterator.single((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(new Array[Long](nw)) { (acc, p) =>
      Array.tabulate(nw)(k => acc(k) + p(k))
    }
    // pass 2: stamp offset + running local sum (cache hit, no re-shuffle)
    val stampedBase = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = offsets(i).clone()
      it.map { row =>
        val out = Row.fromSeq(row.toSeq ++ acc.toSeq)
        var k = 0
        while (k < nw) { acc(k) += row.getLong(wIdxs(k)); k += 1 }
        out
      }
    }
    val stamped =
      if (reliable)
        stampedBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else stampedBase.localCheckpoint()
    stamped.count() // force materialization while the sorted cache is live
    rdd.unpersist(blocking = false)
    val schema = StructType(sorted.schema.fields ++
      weights.map { case (_, p) => StructField(p, LongType, nullable = false) })
    spark.createDataFrame(stamped, schema)
  }
}
