package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: squared L2 distance between an
  * `array<float>` embedding scaled to integer micro-units
  * (`round(x·10⁶)`) and an `array<double>` of already-micro-scaled
  * centroid components — the hot inner loop of nearest-centroid
  * assignment (q99), fused into whole-stage codegen.
  *
  * Replaces the `transform` + `zip_with` + `aggregate` composite, which
  * Spark evaluates on the interpreted path (higher-order functions don't
  * participate in codegen) and which materializes two intermediate
  * arrays per (vector, candidate) pair. Same accumulation order
  * (left-to-right, one `(e−c)²` term per element), so results are
  * bit-identical to the composite and to the DuckDB oracle formulation.
  *
  * Rounding: half away from zero — exactly Spark's `round(x, 0)`
  * (BigDecimal HALF_UP) and DuckDB's `ROUND(x, 0)`. Ties are reachable:
  * a coarse dyadic float like 1/128 lands on `7812.5` micro-units
  * (`odd·5⁶/2`), and `Math.rint`'s ties-to-even would diverge there —
  * L2MicroSpec's property test caught precisely that case. The
  * `±0.5`-then-truncate form is exact for every reachable input because
  * a float32 mantissa × 10⁶ is an exact dyadic double with denominator
  * ≤ 2⁸, so adding 0.5 never rounds.
  *
  * Null handling: null input array → null result; element nulls are not
  * expected (dense vectors) and read as 0.
  */
case class L2Micro(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"l2_micro expects (array<float>, array<double>), got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val m = x.getFloat(i).toDouble * 1000000.0
      val r = if (m >= 0) math.floor(m + 0.5) else math.ceil(m - 0.5)
      val d = r - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val r = ctx.freshName("r")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $m = ((double) $a.getFloat($i)) * 1000000.0;
         |  double $r = ($m >= 0) ? java.lang.Math.floor($m + 0.5) : java.lang.Math.ceil($m - 0.5);
         |  double $d = $r - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_micro"
}

object L2Micro {
  /** Idempotently registers `l2_micro(a, b)` for SQL/expr use in this
    * session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_micro", exprs => L2Micro(exprs(0), exprs(1)), "built-in")
}
