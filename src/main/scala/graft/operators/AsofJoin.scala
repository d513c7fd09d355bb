package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic as-of join: for each left row, attach the latest right row
  * (same key) whose timestamp is at or before the left row's timestamp.
  *
  * Spark-first shape: NO join at all. The two sides are unioned, sorted
  * within each key by (ts, side, tieBreak...), and the right payload is
  * carried forward with `last(..., ignoreNulls)` over an
  * unbounded-preceding rows frame. That is one shuffle on the key and
  * linear work — a naive theta join (`r.ts <= l.ts` + windowed pick)
  * degenerates to a per-key nested loop, and Spark has no native as-of
  * operator to fall back on. The payload travels as ONE struct column so
  * all attached fields always come from the SAME right row.
  *
  * Semantics:
  *  - `inclusive = true` (default): a right row at exactly the left ts
  *    matches (ties order the right side first).
  *  - `inclusive = false`: strictly-before semantics.
  *  - When several right rows share (key, ts), the one with the greatest
  *    `tieBreak` values wins — pass a unique tie-break column for
  *    deterministic output.
  *  - Left rows with no match get a NULL payload (left-outer flavor).
  *
  * Payload column names must not collide with left column names.
  */
object AsofJoin {

  /** Single-key convenience over the multi-key form. */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTs: String, rightTs: String,
            payload: Seq[String],
            tieBreak: Seq[String] = Nil,
            inclusive: Boolean = true): DataFrame =
    apply(left, right, Seq(leftKey), Seq(rightKey), leftTs, rightTs,
      payload, tieBreak, inclusive)

  /** Multi-key form: `leftKeys`/`rightKeys` are matched positionally and
    * ride in one struct key, so the shuffle stays a single exchange. */
  def apply(left: DataFrame, right: DataFrame,
            leftKeys: Seq[String], rightKeys: Seq[String],
            leftTs: String, rightTs: String,
            payload: Seq[String],
            tieBreak: Seq[String],
            inclusive: Boolean): DataFrame = {
    require(payload.nonEmpty, "asof join needs at least one payload column")
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"key lists must be non-empty and same-length, got $leftKeys vs $rightKeys")
    // enforce the documented precondition instead of silently emitting
    // duplicate output columns that break downstream resolution
    val collisions = payload.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"payload column(s) ${collisions.mkString(", ")} collide with left column names — " +
        "rename one side before the as-of join")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"column(s) ${reserved.mkString(", ")} use the operator-internal '__' prefix — rename them")
    val lCols = left.columns.toSeq
    val lStructT = StructType(left.schema.fields.map(_.copy(nullable = true)))
    val pStructT = StructType(payload.map(p =>
      right.schema(p).copy(nullable = true)))
    // side ordering controls whether an equal-ts right row is visible to
    // the left row (right first = inclusive)
    val (lSide, rSide) = if (inclusive) (1, 0) else (0, 1)

    // normalize key struct FIELD names so the two sides union cleanly
    def keyStruct(ks: Seq[String]) =
      struct(ks.zipWithIndex.map { case (c, i) => col(c).as(s"k$i") }: _*)

    val l = left.select(
      Seq(keyStruct(leftKeys).as("__k"), col(leftTs).as("__ts"), lit(lSide).as("__side"),
        struct(lCols.map(col): _*).as("__l"),
        lit(null).cast(pStructT).as("__p")) ++
        tieBreak.map(c => lit(null).cast(right.schema(c).dataType).as(s"__t_$c")): _*)
    val r = right.select(
      Seq(keyStruct(rightKeys).as("__k"), col(rightTs).as("__ts"), lit(rSide).as("__side"),
        lit(null).cast(lStructT).as("__l"),
        struct(payload.map(col): _*).as("__p")) ++
        tieBreak.map(c => col(c).as(s"__t_$c")): _*)

    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").asc +: col("__side").asc +:
        tieBreak.map(c => col(s"__t_$c").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__pv", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === lSide)
      .select(lCols.map(c => col(s"__l.$c").as(c)) ++
        payload.map(p => col(s"__pv.$p").as(p)): _*)
  }
}
