package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused ASYMMETRIC DISTANCE COMPUTATION (ADC) over PQ codes — the
  * search-time payoff of product quantization (q218/q219 in
  * queries/Llm.scala): the query stays full precision, the corpus is
  * 8 one-byte codes per vector, and a per-query lookup table turns
  * each distance into m array reads instead of 64 multiply-adds over
  * a decoded vector.
  *
  * `pq_adc_micro(codes: array<int>, lut: array<double>) → double`
  *
  * `lut` is ONE query's dense table, position `j·256 + code` holding
  * the exact micro-integer partial `‖q_subⱼ − cwⱼ,code‖²`
  * (integer-valued doubles throughout, so Spark and the DuckDB oracle
  * agree bit-for-bit; per-row totals stay < 2⁵³). The 10-query LUT
  * relation fans out over the codes scan through a broadcast
  * nested-loop join — Spark's codegen'd fan-out — and this expression
  * stays a plain scalar inside the same whole-stage-codegen span.
  *
  * Why this shape: the first cut returned all queries' distances from
  * one stateful expression (decode-cached multi-query LUT) and
  * `explode`d them — Generate over a CodegenFallback child forced the
  * whole 10n-row stage onto the interpreted path, which measured ~2×
  * the entire PQ encode at the ×100 self-bench. A dense per-query
  * array needs NO decode and NO cache-verify: `doGenCode` reads the
  * live broadcast bytes directly, m primitive reads per (vector,
  * query). Out-of-range CODES and positions contribute +∞, surfacing
  * malformed input as an un-rankable distance instead of silence: the
  * in-contract code domain is 0..255, but q222 feeds this expression
  * codes deserialized from an on-disk parquet index and the function
  * is registered session-wide, so a negative or ≥256 code must not
  * drive an unchecked array read (a negative position would read
  * before the LUT base; ≥256 would read the next subspace's slot —
  * both plausible-but-wrong distances, worse than a loud +∞).
  */
case class PqAdcMicro(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_micro expects (array<int>, array<double>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  // The LUT builders emit exactly m·256 slots, so `pos < w` is implied
  // by the code-domain test whenever w covers the codes' subspaces —
  // hoisting that width check out of the inner loop (validated ONCE per
  // row) leaves a single unsigned range test per element, `(c & ~255)
  // == 0` ≡ 0 ≤ c < 256. A short/torn LUT (out of contract but
  // registered session-wide) falls back to the fully-guarded loop.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val w = lut.numElements()
    var acc = 0.0
    var j = 0
    // both comparisons in LONG: `m * 256` wraps int past m = 2^23, which
    // would take the UNguarded fast path against a short LUT (and the
    // slow path's int pos would wrap negative past the same point —
    // UnsafeArrayData reads have no bounds check of their own)
    if (w >= m * 256L) {
      while (j < m) {
        val c = codes.getInt(j)
        acc += (if ((c & ~255) == 0) lut.getDouble(j * 256 + c)
                else Double.PositiveInfinity)
        j += 1
      }
    } else {
      while (j < m) {
        val c = codes.getInt(j)
        val pos = j * 256L + c
        acc += (if (c >= 0 && c < 256 && pos < w) lut.getDouble(pos.toInt)
                else Double.PositiveInfinity)
        j += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val w = ctx.freshName("w")
      val acc = ctx.freshName("acc")
      val c = ctx.freshName("c")
      val pos = ctx.freshName("pos")
      s"""
         |int $m = $a.numElements();
         |int $w = $b.numElements();
         |double $acc = 0.0;
         |if ($w >= $m * 256L) {
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $c = $a.getInt($j);
         |    $acc += (($c & ~255) == 0)
         |      ? $b.getDouble($j * 256 + $c) : Double.POSITIVE_INFINITY;
         |  }
         |} else {
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $c = $a.getInt($j);
         |    long $pos = $j * 256L + $c;
         |    $acc += ($c >= 0 && $c < 256 && $pos < $w)
         |      ? $b.getDouble((int) $pos) : Double.POSITIVE_INFINITY;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc_micro"
}

object PqAdcMicro {
  /** Idempotently registers `pq_adc_micro(codes, lut)` plus the LUT
    * builder `dense_lut_micro` every ADC call site feeds it from. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_adc_micro", exprs => PqAdcMicro(exprs(0), exprs(1)), "built-in")
    DenseLutMicro.register(spark)
  }
}
