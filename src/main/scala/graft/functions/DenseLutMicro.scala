package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense LUT scatter for the ADC family (q218–q228):
  *
  * `dense_lut_micro(pairs: array<struct<pos:int, d:double>>, width: int)
  * → array<double>` — a `width`-slot array initialized to +∞ with
  * `arr[pos] = d` for every in-range pair (positions the PQ trainer
  * never emitted stay +∞ and are never referenced by an encoded
  * vector; an out-of-range pos is ignored).
  *
  * Why an expression: the first shape built the dense array as
  * `transform(sequence(0, m·256−1), p -> element_at(map, p))` over a
  * `map_from_arrays` map — but Spark's ArrayBasedMapData `element_at`
  * is a LINEAR key scan, so each LUT row cost O((m·256)²) boxed
  * comparisons: ~5.5 s hidden inside the broadcast build of EVERY
  * ADC/IVFADC query at sf0.1 (measured round 9: the "trivial read of
  * lut col" probe at 5.2 s vs 0.8 s with the LUT pre-materialized —
  * the per-row ADC scan was never the cost). This scatter is one
  * O(width + pairs) pass per LUT row. Interpreted
  * ([[CodegenFallback]]): ≤ nprobe·queries rows ever flow through it.
  *
  * Duplicate positions cannot occur in contract (one (j, code) per
  * group); if fed one anyway, the last pair wins.
  */
case class DenseLutMicro(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StructType(Array(StructField(_, IntegerType, _, _),
                                     StructField(_, DoubleType, _, _))), _), IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dense_lut_micro expects (array<struct<pos:int, d:double>>, int), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullable: Boolean = true

  /** Hard ceiling on the dense width. The in-contract widths are
    * m·256 ≤ 16384; the function is registered session-wide, and an
    * absurd width must fail LOUDLY here rather than as an executor-
    * killing allocation (the PqAdcMicro input-hardening precedent).
    * 1<<16 = 4× the contract ceiling — headroom for a wider codebook,
    * but a 512 KB LUT row is the largest this will ever hand an
    * executor (the round-9 1<<24 bound still allowed 128 MB rows). */
  val MaxWidth: Int = 1 << 16

  override def nullSafeEval(a: Any, b: Any): Any = {
    val pairs = a.asInstanceOf[ArrayData]
    val width = b.asInstanceOf[Int]
    // negative widths fail LOUDLY too: a silently-returned NULL LUT
    // would turn every downstream pq_adc_micro distance NULL, and
    // Spark's default NULLS FIRST would rank those rows into the
    // top-k — the silent-wrong-ranking trap this codebase guards
    // against everywhere else
    require(width >= 0 && width <= MaxWidth,
      s"dense_lut_micro width $width outside [0, $MaxWidth]")
    val out = Array.fill(width)(Double.PositiveInfinity)
    val n = pairs.numElements()
    var i = 0
    while (i < n) {
      if (!pairs.isNullAt(i)) {
        val st = pairs.getStruct(i, 2)
        if (!st.isNullAt(0) && !st.isNullAt(1)) {
          val pos = st.getInt(0)
          if (pos >= 0 && pos < width) out(pos) = st.getDouble(1)
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dense_lut_micro"
}

object DenseLutMicro {
  /** Idempotently registers `dense_lut_micro(pairs, width)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dense_lut_micro", exprs => DenseLutMicro(exprs(0), exprs(1)), "built-in")
}
