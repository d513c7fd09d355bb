package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO as a reusable batch operator: apply a CDC batch of
  * inserts/updates/deletes to a base snapshot in ONE full-outer join on
  * the merge key — the incremental table-maintenance primitive (the
  * Delta/Iceberg merge inner loop without the table format).
  *
  * Verb semantics (op column values 'I' | 'U' | 'D'):
  *   - matched + U/I   → the CDC row's payload replaces the base row's
  *   - matched + D     → the row is dropped
  *   - unmatched + U/I → the CDC row is inserted (upsert on miss)
  *   - unmatched + D   → no-op
  * One op per key is assumed (standard CDC compaction); with duplicate
  * keys in the batch the join would fan out — compact first.
  *
  * The result carries every base column plus a `src` provenance column
  * ('keep' | 'update' | 'insert').
  *
  * Scale notes: the join shuffles both sides by the merge key — with
  * the base bucketed/partitioned by that key the base side needs no
  * shuffle, a small CDC batch broadcasts instead, and joining the CDC
  * batch's DISTINCT partition keys against the table layout first
  * restricts the rewrite to touched partitions. q138 is the graded,
  * oracle-checked face of this operator.
  */
object MergeInto {
  def apply(base: DataFrame, cdc: DataFrame, keys: Seq[String],
            op: String = "op", srcCol: String = "src"): DataFrame = {
    require(keys.nonEmpty, "at least one merge key")
    val payload = base.columns.filterNot(keys.contains).toSeq
    val missing = payload.filterNot(cdc.columns.contains)
    require(missing.isEmpty, s"cdc is missing payload columns: ${missing.mkString(", ")}")
    val b = base.select(keys.map(k => col(k).as(s"__mb_$k")) ++
      payload.map(c => col(c).as(s"__pb_$c")): _*)
    val c = cdc.select(keys.map(k => col(k).as(s"__mc_$k")) ++
      (col(op).as("__op") +: payload.map(p => col(p).as(s"__pc_$p"))): _*)
    val joinCond = keys.map(k => col(s"__mb_$k") === col(s"__mc_$k")).reduce(_ && _)
    b.join(c, joinCond, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(
        keys.map(k => coalesce(col(s"__mb_$k"), col(s"__mc_$k")).as(k)) ++
          payload.map(p =>
            when(col("__op").isNull, col(s"__pb_$p")).otherwise(col(s"__pc_$p")).as(p)) :+
          when(col("__op").isNull, lit("keep"))
            .when(col(s"__mb_${keys.head}").isNull, lit("insert"))
            .otherwise(lit("update")).as(srcCol): _*)
  }
}
