package graft.functions

import org.apache.spark.sql.{Column, Encoder, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Fused covariance sufficient statistics for the spectral family
  * (q238/q239/q242/q245): ONE typed aggregate computes the full 64×64
  * outer-product sum Σ emᵢ·emⱼ per partition in a tight primitive loop
  * (upper triangle only — the matrix is symmetric), merged across
  * partitions, EXACTLY.
  *
  * Why: the first shape fanned each vector out through a DOUBLE
  * posexplode — ~64 + 4096 Generate rows per input row, the first
  * carrying the whole 64-element array, followed by 4096 hash-aggregate
  * probes per row (grouped SUM over (i, j)). Linear, but the constant
  * dominated the ×1000 decade row (the round-8 verdict's watch item).
  * Here the per-row cost is 2080 multiply-adds into a flat buffer — no
  * Generate, no hashing — and the shuffle carries ONE 8192-long buffer
  * per partition.
  *
  * Exactness (the reason this isn't a plain SUM(double)): per-row
  * products |emᵢ·emⱼ| < 2⁴⁵ fit a long, but per-partition sums overflow
  * past ~5·10⁵ max-magnitude rows. Each of the 4096 cells is therefore a
  * SIGNED 128-BIT accumulator held as (hi, lo) limb pairs — lo is the
  * unsigned low limb, carry propagation via the standard bit identity —
  * so the final value equals the BigInt sum bit-for-bit at any corpus
  * size (CovOuterMicroSpec drives the limbs across the long boundary).
  * The driver-facing value is reconstructed downstream as
  * hi·2⁶⁴ + unsigned(lo) in DECIMAL(38,0), matching the previous
  * decimal-sum semantics exactly — the oracle CTEs are unchanged.
  *
  * Buffer layout: index 2·(i·64 + j) holds hi, +1 holds lo, for
  * 0 ≤ i ≤ j < 64 (cells with i > j stay zero and are dropped by the
  * triangle filter downstream). Vectors shorter than 64 dims simply
  * leave the tail cells zero; longer inputs are truncated at 64 (out of
  * contract — the spectral family is fixed at d = 64).
  */
object CovOuterMicro {

  /** 128-bit add of the SIGNED value `p` into the (hi, lo) limb pair at
    * b(idx)/b(idx+1). lo is an unsigned limb; carry-out of the unsigned
    * low add is `((a & b) | ((a | b) & ~sum)) >>> 63`; p's high limb is
    * its sign extension. */
  @inline private[functions] def add128(b: Array[Long], idx: Int, p: Long): Unit = {
    val lo = b(idx + 1)
    val nLo = lo + p
    b(idx + 1) = nLo
    b(idx) += (p >> 63) + (((lo & p) | ((lo | p) & ~nLo)) >>> 63)
  }

  /** Element-wise 128-bit merge of `c` into `a` (same layout). */
  private[functions] def merge128(a: Array[Long], c: Array[Long]): Unit = {
    var k = 0
    while (k < a.length) {
      val lo = a(k + 1)
      val ol = c(k + 1)
      val nLo = lo + ol
      a(k + 1) = nLo
      a(k) += c(k) + (((lo & ol) | ((lo | ol) & ~nLo)) >>> 63)
      k += 2
    }
  }

  class Agg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](8192)

    override def reduce(b: Array[Long], em: Seq[Long]): Array[Long] = {
      if (em != null) {
        val a = em.toArray
        val d = math.min(a.length, 64)
        var i = 0
        while (i < d) {
          val ei = a(i)
          val rowOff = 2 * i * 64
          var j = i
          while (j < d) {
            add128(b, rowOff + 2 * j, ei * a(j))
            j += 1
          }
          i += 1
        }
      }
      b
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      merge128(x, y); x
    }

    override def finish(r: Array[Long]): Seq[Long] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(r)

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  private lazy val fn = F.udaf(new Agg)

  /** `cov_outer_micro(em: array<long>) → array<long>[8192]` — the flat
    * (hi, lo) triangle buffer; decode as hi·2⁶⁴ + unsigned(lo). */
  def apply(c: Column): Column = fn(c)

  /** Idempotently registers `cov_outer_micro` for SQL callers (the v8
    * fuzz differential drives it from generated SQL text). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("cov_outer_micro", fn)

  /** Spark-SQL decode of the buffer column `b` into (i, j, sxy
    * DECIMAL(38,0)) rows for the upper triangle: sxy = hi·2⁶⁴ +
    * unsigned(lo), exact in decimal. */
  val TwoPow64: String = "CAST('18446744073709551616' AS DECIMAL(38,0))"
}
