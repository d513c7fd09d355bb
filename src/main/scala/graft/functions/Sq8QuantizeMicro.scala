package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Fused SQ8 scalar quantizer, the per-row hot path of q214/q215
  * (queries/Llm.scala).
  *
  * `sq8_quantize_micro(emb: array<float>) → struct<em: array<bigint>,
  * s8: bigint, q8: array<int>, deq: array<double>>`
  *
  * One primitive pass per row producing the whole SQ8 pipeline the
  * HOF formulation spelled as four chained transforms (micro-round →
  * max|em| scale → signed-byte quantize → dequantize). Arithmetic is
  * element-for-element the oracle's:
  *   - em  = ±0.5-explicit micro rounding of the float (the repo
  *     bridge — floor(x+0.5) / ceil(x-0.5));
  *   - s8  = max(1, (max|em| + 126) div 127) — integer ceiling, so
  *     every q lands in [−127, 127] with NO clamp;
  *   - q8  = (2x + s) div (2s) on the non-negative arm and its mirror
  *     on the negative one — both dividends non-negative BY
  *     CONSTRUCTION, which is what makes Spark's truncating div and
  *     DuckDB's flooring `//` agree;
  *   - deq = q·s as double (the micro domain the argmin consumes).
  *
  * Why an expression: the chained-HOF shape allocates ~4 arrays and
  * ~256 lambda frames per row; at the ×1000 self-bench (2M vectors)
  * that overhead measured ~3× the entire fused argmin. Interpreted
  * ([[CodegenFallback]]): a 64-element primitive loop per row; the
  * boxed call is noise next to it. Null input → null.
  */
case class Sq8QuantizeMicro(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("em", ArrayType(LongType)),
    StructField("s8", LongType),
    StructField("q8", ArrayType(IntegerType)),
    StructField("deq", ArrayType(DoubleType))))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_quantize_micro expects array<float>, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val emb = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = emb.numElements()
    val em = new Array[Long](n)
    var mx = 0L
    var i = 0
    while (i < n) {
      val m = emb.getFloat(i).toDouble * 1000000.0
      val r = (if (m >= 0) math.floor(m + 0.5) else math.ceil(m - 0.5)).toLong
      em(i) = r
      val ab = math.abs(r)
      if (ab > mx) mx = ab
      i += 1
    }
    val s = math.max(1L, (mx + 126L) / 127L)
    val q = new Array[Int](n)
    val dv = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = em(i)
      val qi = (if (x >= 0) (2 * x + s) / (2 * s) else -((-2 * x + s) / (2 * s))).toInt
      q(i) = qi
      dv(i) = (qi * s).toDouble
      i += 1
    }
    // UnsafeArrayData, not GenericArrayData: boxing 3×64 elements per
    // row measured as pure GC drag on the ×1000 self-bench, and the
    // unsafe layout lets the downstream argmin read primitives.
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    InternalRow(UnsafeArrayData.fromPrimitiveArray(em), s,
      UnsafeArrayData.fromPrimitiveArray(q), UnsafeArrayData.fromPrimitiveArray(dv))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sq8_quantize_micro"
}

object Sq8QuantizeMicro {
  /** Idempotently registers `sq8_quantize_micro(emb)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sq8_quantize_micro", exprs => Sq8QuantizeMicro(exprs(0)), "built-in")
}
