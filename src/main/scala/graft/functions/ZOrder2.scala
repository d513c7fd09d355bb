package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: two-dimensional Z-order (Morton) value —
  * the lower 32 bits of each long operand, bit-interleaved into one
  * 64-bit key (`a` on even bits, `b` on odd bits).
  *
  * Why it exists: at 100 TB the dominant cost is the SCAN, and the
  * standard lever is multi-dimensional data clustering — write parquet
  * range-partitioned + sorted by the Morton key and point/box predicates
  * on EITHER dimension prune most files via min/max stats (the classic
  * Z-order layout optimization). The interleave must run per row at
  * write time, so it is implemented as a codegen'd expression (stays
  * inside WholeStageCodegen; a Scala UDF would box every row).
  *
  * The bit-spread is the textbook mask sequence (x | x<<16, x | x<<8, …
  * with alternating masks), identical on the interpreted and codegen
  * paths, and exactly expressible in DuckDB BIGINT arithmetic — so
  * Z-values are oracle-checkable (q117).
  *
  * Operands are taken mod 2³² (callers bucket/offset negative domains
  * first); null in → null out.
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects (bigint, bigint), got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder2.interleave($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder2"
}

object ZOrder2 {

  /** Spread the low 32 bits of x across the even bit positions of a long. */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton key: a's bits on even positions, b's on odd. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** The identical computation spelled in DuckDB BIGINT arithmetic, for
    * oracle SQL. */
  def sqlSpread(e: String): String = {
    val m1 = 0x0000FFFF0000FFFFL; val m2 = 0x00FF00FF00FF00FFL
    val m3 = 0x0F0F0F0F0F0F0F0FL; val m4 = 0x3333333333333333L
    val m5 = 0x5555555555555555L
    val s0 = s"(($e) & 4294967295)"
    val s1 = s"(($s0 | ($s0 << 16)) & $m1)"
    val s2 = s"(($s1 | ($s1 << 8)) & $m2)"
    val s3 = s"(($s2 | ($s2 << 4)) & $m3)"
    val s4 = s"(($s3 | ($s3 << 2)) & $m4)"
    s"(($s4 | ($s4 << 1)) & $m5)"
  }

  /** `spread(b) << 1` must wrap into the sign bit (bit 62 → 63), but
    * DuckDB's `<<` is overflow-checked and ERRORS when bit 62 is set —
    * i.e. for any b with bit 31 set, half the documented mod-2^32
    * domain. Spell the wrap explicitly: shift the low 62 bits, then OR
    * the sign bit back in via a CASE on bit 62. (Java's << wraps
    * natively; the Scala side needs no guard.) */
  def sqlInterleave(a: String, b: String): String = {
    val sb = sqlSpread(b)
    val low62 = 0x3FFFFFFFFFFFFFFFL
    val bit62 = 0x4000000000000000L
    val shifted = s"((($sb & $low62) << 1) | " +
      s"(CASE WHEN ($sb & $bit62) != 0 THEN (-9223372036854775807 - 1) ELSE 0 END))"
    s"(${sqlSpread(a)} | $shifted)"
  }

  /** Idempotently registers `zorder2(a, b)` for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2", exprs => ZOrder2(exprs(0), exprs(1)), "built-in")
}
