package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused ASYMMETRIC DISTANCE COMPUTATION (ADC) over PQ codes — the
  * search-time payoff of product quantization (q218/q219 in
  * queries/Llm.scala): the query stays full precision, the corpus is
  * 8 one-byte codes per vector, and a per-(query, subspace, code)
  * lookup table turns each distance into m table reads instead of
  * 64 multiply-adds over a decoded vector.
  *
  * `pq_adc_micro(codes: array<int>, qluts: array<struct<qid:bigint,
  * j:int, code:int, d:double>>) → array<struct<qid:bigint,
  * dist:double>>`
  *
  * `qluts` rides ONE broadcast row: for every query `qid`, subspace
  * `j` and codeword `code`, `d` is the exact micro-integer partial
  * `‖q_sub − cw‖²` (integer-valued doubles throughout, so Spark and
  * the DuckDB oracle agree bit-for-bit; per-row totals stay < 2⁵³).
  * The output lists every query's ADC distance for this row's codes,
  * in ascending `qid` order — `explode` it and top-k per query.
  *
  * Why an expression: the HOF formulation costs ~(queries × m) lambda
  * frames per row; here the LUT decodes ONCE per task into a dense
  * primitive `[query][j·256+code]` table (fingerprint-keyed cache,
  * full-region verify on hit — the [[ArgminL2Micro]] discipline) and
  * the per-row loop is queries × m primitive array reads. Positions
  * absent from the table (codes the trainer never emitted) hold +∞,
  * and are unreachable because the encoder only picks existing codes.
  * Null codes / empty LUT → null. Interpreted ([[CodegenFallback]]):
  * the table-read loop dominates; the boxed call is noise.
  */
case class PqAdcMicro(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qid", LongType), StructField("dist", DoubleType))))

  private val lutType = ArrayType(StructType(Seq(
    StructField("qid", LongType), StructField("j", IntegerType),
    StructField("code", IntegerType), StructField("d", DoubleType))))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _),
          ArrayType(StructType(Array(StructField(_, LongType, _, _),
                                     StructField(_, IntegerType, _, _),
                                     StructField(_, IntegerType, _, _),
                                     StructField(_, DoubleType, _, _))), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_micro expects (array<int>, ${lutType.sql}), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullable: Boolean = true

  // Decoded LUT: qids ascending; lut(g) is a dense m·256 table for
  // query g (position j*256+code). Single-slot fingerprint cache with
  // full-region verify on hit (the LUT rides one broadcast row).
  @transient private var cachedBase: AnyRef = _
  @transient private var cachedOff: Long = _
  @transient private var cachedK: Int = -1
  @transient private var cachedSize: Long = -1L
  @transient private var cachedWords: Array[Long] = _
  @transient private var qids: Array[Long] = _
  @transient private var luts: Array[Array[Double]] = _

  private def decode(entries: ArrayData): Unit = {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    val k = entries.numElements()
    val (base: AnyRef, off: Long, size: Long) = entries match {
      case u: UnsafeArrayData => (u.getBaseObject, u.getBaseOffset, u.getSizeInBytes.toLong)
      case other => (other, 0L, -1L)
    }
    if ((base eq cachedBase) && off == cachedOff && k == cachedK &&
        size == cachedSize && qids != null &&
        (size < 0 || MicroRegion.sameWords(base, off, size, cachedWords))) return
    val qv = new Array[Long](k)
    val jv = new Array[Int](k)
    val cv = new Array[Int](k)
    val dv = new Array[Double](k)
    var maxJ = -1
    var x = 0
    while (x < k) {
      val s = entries.getStruct(x, 4)
      qv(x) = s.getLong(0); jv(x) = s.getInt(1); cv(x) = s.getInt(2); dv(x) = s.getDouble(3)
      if (jv(x) > maxJ) maxJ = jv(x)
      x += 1
    }
    val qSorted = qv.distinct.sorted
    val qIdx = qSorted.zipWithIndex.toMap
    val width = (maxJ + 1) * 256
    val tab = Array.fill(qSorted.length)(Array.fill(width)(Double.PositiveInfinity))
    x = 0
    while (x < k) {
      tab(qIdx(qv(x)))(jv(x) * 256 + cv(x)) = dv(x)
      x += 1
    }
    qids = qSorted; luts = tab
    cachedBase = base; cachedOff = off; cachedK = k; cachedSize = size
    cachedWords = if (size >= 0) MicroRegion.snapshot(base, off, size) else null
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val entries = b.asInstanceOf[ArrayData]
    if (entries.numElements() == 0) return null
    decode(entries)
    val m = codes.numElements()
    val nq = qids.length
    val out = new Array[Any](nq)
    var g = 0
    while (g < nq) {
      val lut = luts(g)
      var acc = 0.0
      var j = 0
      while (j < m) {
        val pos = j * 256 + codes.getInt(j)
        if (pos < lut.length) acc += lut(pos)
        j += 1
      }
      out(g) = InternalRow(qids(g), acc)
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc_micro"
}

object PqAdcMicro {
  /** Idempotently registers `pq_adc_micro(codes, qluts)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_adc_micro", exprs => PqAdcMicro(exprs(0), exprs(1)), "built-in")
}
