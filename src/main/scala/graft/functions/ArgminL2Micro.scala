package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: nearest-centroid ARGMIN, fused.
  *
  * `argmin_l2_micro(emb: array<float>, cands: array<struct<cand:int,
  * cvec:array<double>>>) → int` returns the `cand` minimizing the
  * micro-scaled squared L2 distance [[L2Micro]] computes, with ties
  * broken toward the smaller `cand` — element-wise arithmetic identical
  * to `l2_micro` (same `±0.5`-truncate rounding, same left-to-right
  * accumulation), so the selected candidate matches the oracle's
  * `ORDER BY dist, cand LIMIT 1` bit-for-bit.
  *
  * Why an expression and not a plan: the straightforward shape —
  * crossJoin the broadcast centroid relation, compute k distances per
  * vector, reduce with an argmin aggregate — materializes n·k ROWS
  * through the whole-stage pipeline. The per-row machinery (~µs) costs
  * more than the 64 multiply-adds inside, and at the ×1000 self-bench
  * (2M×10k) those 2·10¹⁰ rows dominated q99/q177 wall-clock even after
  * the aggregation was made hash-based. Fusing the candidate loop into
  * ONE expression evaluates n rows total; per row it:
  *   - pre-rounds the embedding's micro units once (the fan-out re-rounds
  *     them k times), and
  *   - early-exits each candidate's accumulation once it exceeds the
  *     best-so-far (monotone partial sums — cannot change the argmin).
  *
  * Null: null inputs or an empty candidate array → null. The candidate
  * array is scan-order-independent (explicit tie handling), so callers
  * need not sort the collect_list.
  */
case class ArgminL2Micro(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private val candType = ArrayType(StructType(Seq(
    StructField("cand", IntegerType), StructField("cvec", ArrayType(DoubleType)))))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _),
          ArrayType(StructType(Array(StructField(_, IntegerType, _, _),
                                     StructField(_, ArrayType(DoubleType, _), _, _))), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"argmin_l2_micro expects (array<float>, ${candType.sql}), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullable: Boolean = true

  /** Candidate-side decode cache. The candidate array arrives from one
    * broadcast row; accessors hand out a FRESH UnsafeArrayData wrapper
    * per call, but every wrapper points at the SAME backing bytes — so
    * the cache is keyed on (baseObject, baseOffset) for Unsafe arrays
    * (bytes are immutable once written) and on object identity
    * otherwise. A key miss just re-decodes: still correct, merely the
    * un-memoized cost. One instance per task/codegen object —
    * single-threaded by construction, transient for the ser path. */
  @transient private var cachedBase: AnyRef = _
  @transient private var cachedOff: Long = _
  @transient private var cachedIds: Array[Int] = _
  @transient private var cachedVecs: Array[Array[Double]] = _

  private def decode(cands: ArrayData): Unit = {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    val (base: AnyRef, off: Long) = cands match {
      case u: UnsafeArrayData => (u.getBaseObject, u.getBaseOffset)
      case other => (other, 0L)
    }
    if ((base eq cachedBase) && off == cachedOff && cachedIds != null) return
    val k = cands.numElements()
    val ids = new Array[Int](k)
    val vecs = new Array[Array[Double]](k)
    var j = 0
    while (j < k) {
      val s = cands.getStruct(j, 2)
      ids(j) = s.getInt(0)
      vecs(j) = s.getArray(1).toDoubleArray()
      j += 1
    }
    cachedIds = ids; cachedVecs = vecs; cachedBase = base; cachedOff = off
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val cands = b.asInstanceOf[ArrayData]
    val k = cands.numElements()
    if (k == 0) return null
    decode(cands)
    val ids = cachedIds; val vecs = cachedVecs
    val n = emb.numElements()
    val ex = new Array[Double](n)
    var i = 0
    while (i < n) {
      val m = emb.getFloat(i).toDouble * 1000000.0
      ex(i) = if (m >= 0) math.floor(m + 0.5) else math.ceil(m - 0.5)
      i += 1
    }
    var bestD = Double.PositiveInfinity
    var bestC = Int.MaxValue
    var found = false
    var j = 0
    while (j < k) {
      val c = ids(j)
      val cv = vecs(j)
      val nn = math.min(n, cv.length)
      var acc = 0.0
      var i2 = 0
      while (i2 < nn && acc <= bestD) {
        val d = ex(i2) - cv(i2)
        acc += d * d
        i2 += 1
      }
      if (i2 == nn && (acc < bestD || (acc == bestD && c < bestC))) {
        bestD = acc; bestC = c; found = true
      }
      j += 1
    }
    if (found) bestC else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // identity-keyed decode cache + reusable micro buffer as codegen
      // object state (one per task — single-threaded): the candidate
      // broadcast row's ArrayData is the same object for every stream
      // row, so the struct/array accessor cost is paid once and the hot
      // loop runs on primitive arrays.
      val cachedBase = ctx.addMutableState("Object", "argminCachedBase")
      val cachedOff = ctx.addMutableState("long", "argminCachedOff")
      val ids = ctx.addMutableState("int[]", "argminIds")
      val vecs = ctx.addMutableState("double[][]", "argminVecs")
      val exBuf = ctx.addMutableState("double[]", "argminEx")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val i2 = ctx.freshName("i2")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val nn = ctx.freshName("nn")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val found = ctx.freshName("found")
      s"""
         |int $k = $b.numElements();
         |if ($k == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  Object $base = $b;
         |  long $off = 0L;
         |  if ($b instanceof org.apache.spark.sql.catalyst.expressions.UnsafeArrayData) {
         |    $base = ((org.apache.spark.sql.catalyst.expressions.UnsafeArrayData) $b).getBaseObject();
         |    $off = ((org.apache.spark.sql.catalyst.expressions.UnsafeArrayData) $b).getBaseOffset();
         |  }
         |  if ($base != $cachedBase || $off != $cachedOff || $ids == null) {
         |    $ids = new int[$k];
         |    $vecs = new double[$k][];
         |    for (int $j = 0; $j < $k; $j++) {
         |      org.apache.spark.sql.catalyst.InternalRow $s = $b.getStruct($j, 2);
         |      $ids[$j] = $s.getInt(0);
         |      $vecs[$j] = $s.getArray(1).toDoubleArray();
         |    }
         |    $cachedBase = $base;
         |    $cachedOff = $off;
         |  }
         |  int $n = $a.numElements();
         |  if ($exBuf == null || $exBuf.length < $n) $exBuf = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $m = ((double) $a.getFloat($i)) * 1000000.0;
         |    $exBuf[$i] = ($m >= 0) ? java.lang.Math.floor($m + 0.5) : java.lang.Math.ceil($m - 0.5);
         |  }
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  int $bestC = Integer.MAX_VALUE;
         |  boolean $found = false;
         |  for (int $j = 0; $j < $k; $j++) {
         |    int $c = $ids[$j];
         |    double[] $cv = $vecs[$j];
         |    int $nn = java.lang.Math.min($n, $cv.length);
         |    double $acc = 0.0;
         |    int $i2 = 0;
         |    for (; $i2 < $nn && $acc <= $bestD; $i2++) {
         |      double $d = $exBuf[$i2] - $cv[$i2];
         |      $acc += $d * $d;
         |    }
         |    if ($i2 == $nn && ($acc < $bestD || ($acc == $bestD && $c < $bestC))) {
         |      $bestD = $acc; $bestC = $c; $found = true;
         |    }
         |  }
         |  if ($found) { ${ev.value} = $bestC; } else { ${ev.isNull} = true; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "argmin_l2_micro"
}

object ArgminL2Micro {
  /** Idempotently registers `argmin_l2_micro(emb, cands)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "argmin_l2_micro", exprs => ArgminL2Micro(exprs(0), exprs(1)), "built-in")
}
