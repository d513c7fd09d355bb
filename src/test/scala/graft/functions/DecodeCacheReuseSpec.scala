package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeArrayData, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** ADVERSARIAL buffer-reuse test for the argmin decode caches (round-6
  * advisory, medium): Spark reuses UnsafeRow backing buffers
  * (UnsafeProjection's target row, shuffle-read serializers, sort
  * iterators), so the same (base, offset, size, numElements) can later
  * hold DIFFERENT candidate bytes. The caches' 3-word head/mid/tail
  * fingerprint is probabilistic — this spec CONSTRUCTS the collision the
  * advisory hypothesized (a rewrite that preserves all three sampled
  * words but changes an interior centroid) and asserts the round-7
  * verify compare (MicroRegion.sameWords — full for regions this small) forces a re-decode, so
  * the argmin follows the LIVE bytes, never a stale decode. */
class DecodeCacheReuseSpec extends AnyFunSuite with Matchers {

  private val cvecType = ArrayType(DoubleType)
  private val candType = ArrayType(StructType(Seq(
    StructField("cand", IntegerType), StructField("cvec", cvecType))))

  private def candsRow(cents: Seq[(Int, Seq[Double])]): InternalRow =
    InternalRow(new GenericArrayData(cents.map { case (c, v) =>
      InternalRow(c, new GenericArrayData(v.toArray))
    }.toArray))

  private def words(u: UnsafeArrayData): (Long, Long, Long) = {
    val b = u.getBaseObject; val o = u.getBaseOffset; val sz = u.getSizeInBytes.toLong
    (Platform.getLong(b, o),
      Platform.getLong(b, o + (sz / 16) * 8),
      Platform.getLong(b, o + sz - 8))
  }

  /** Two candidate sets, same shape, differing ONLY in one interior
    * double chosen so head/mid/tail words coincide — plus the dimension
    * index that was perturbed. The perturbed value flips the argmin for
    * an all-zeros query vector. */
  private def collidingPair(): (Seq[(Int, Seq[Double])], Seq[(Int, Seq[Double])]) = {
    val dims = 6
    // v1: cand 1 is NEAR the origin query (all 1000s), cand 2 far.
    val v1 = Seq(
      1 -> Seq.fill(dims)(1000.0),
      2 -> Seq.fill(dims)(500000.0))
    val proj = UnsafeProjection.create(Array[DataType](candType))
    val w1 = words(proj(candsRow(v1)).getArray(0).asInstanceOf[UnsafeArrayData])
    // perturb one interior dim of cand 1 to a HUGE value (argmin flips
    // to 2); search for a dim whose word is none of head/mid/tail
    (0 until dims).iterator.map { d =>
      val v2 = Seq(
        1 -> Seq.tabulate(dims)(i => if (i == d) 9.0e8 else 1000.0),
        2 -> Seq.fill(dims)(500000.0))
      (v2, words(proj(candsRow(v2)).getArray(0).asInstanceOf[UnsafeArrayData]))
    }.collectFirst { case (v2, w2) if w2 == w1 => (v1, v2) }
      .getOrElse(fail("no fingerprint-colliding perturbation found — layout changed?"))
  }

  test("CandDecodeCache re-decodes when a reused buffer changes bytes behind an identical fingerprint") {
    val (v1, v2) = collidingPair()
    val proj = UnsafeProjection.create(Array[DataType](candType))
    val cache = new MicroArgmin.CandDecodeCache
    val target = proj(candsRow(v1))
    val arr1 = target.getArray(0).asInstanceOf[UnsafeArrayData]
    val (_, vecs1) = cache.get(arr1)
    vecs1(0)(0) shouldBe 1000.0
    // overwrite the SAME projection target in place with v2's bytes
    val target2 = proj(candsRow(v2))
    val arr2 = target2.getArray(0).asInstanceOf[UnsafeArrayData]
    withClue("test premise: projection must reuse its backing buffer") {
      (arr2.getBaseObject eq arr1.getBaseObject) shouldBe true
      arr2.getBaseOffset shouldBe arr1.getBaseOffset
      arr2.getSizeInBytes shouldBe arr1.getSizeInBytes
    }
    val (_, vecs2) = cache.get(arr2)
    // without the MicroRegion verify this served the stale v1 decode
    vecs2(0).max shouldBe 9.0e8
  }

  private val cbType = ArrayType(StructType(Seq(
    StructField("j", IntegerType), StructField("code", IntegerType),
    StructField("cw", cvecType))))

  private def cbRow(entries: Seq[(Int, Int, Seq[Double])]): InternalRow =
    InternalRow(new GenericArrayData(entries.map { case (j, c, v) =>
      InternalRow(j, c, new GenericArrayData(v.toArray))
    }.toArray))

  test("PqEncodeMicro follows the LIVE bytes of a reused codebook buffer") {
    // 2 subspaces × 2 codewords of 2 dims; query = zeros. v1 picks code
    // 0 in both subspaces; v2 perturbs one interior double of (j=0,
    // code=0) to flip subspace 0's pick while preserving the 3-word
    // head/mid/tail fingerprint — only the MicroRegion verify makes
    // the second eval see the new bytes.
    val base = Seq(
      (0, 0, Seq(1000.0, 1000.0)), (0, 1, Seq(500000.0, 500000.0)),
      (1, 0, Seq(1000.0, 1000.0)), (1, 1, Seq(500000.0, 500000.0)))
    val proj = UnsafeProjection.create(Array[DataType](cbType))
    def words3(u: UnsafeArrayData): (Long, Long, Long) = {
      val b = u.getBaseObject; val o = u.getBaseOffset; val sz = u.getSizeInBytes.toLong
      (Platform.getLong(b, o),
        Platform.getLong(b, o + (sz / 16) * 8),
        Platform.getLong(b, o + sz - 8))
    }
    val w1 = words3(proj(cbRow(base)).getArray(0).asInstanceOf[UnsafeArrayData])
    val perturbed = (0 until 2).iterator.map { d =>
      val v2 = base.updated(0, (0, 0, Seq.tabulate(2)(i => if (i == d) 9.0e8 else 1000.0)))
      (v2, words3(proj(cbRow(v2)).getArray(0).asInstanceOf[UnsafeArrayData]))
    }.collectFirst { case (v2, w2) if w2 == w1 => v2 }
      .getOrElse(fail("no fingerprint-colliding perturbation found — layout changed?"))
    val ex = PqEncodeMicro(BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, cbType, nullable = true))
    val emb: ArrayData = new GenericArrayData(Array.fill(4)(0.0))
    def codesOf(r: Any): Seq[Int] = {
      val row = r.asInstanceOf[InternalRow]
      row.getArray(0).toIntArray().toSeq
    }
    val arr1 = proj(cbRow(base)).getArray(0)
    codesOf(ex.eval(InternalRow(emb, arr1))) shouldBe Seq(0, 0)
    val arr2 = proj(cbRow(perturbed)).getArray(0) // same buffer, new bytes
    codesOf(ex.eval(InternalRow(emb, arr2))) shouldBe Seq(1, 0)
  }

  test("ArgminL2Micro follows the LIVE bytes of a reused buffer, not a stale decode") {
    val (v1, v2) = collidingPair()
    val proj = UnsafeProjection.create(Array[DataType](candType))
    val embType = ArrayType(FloatType)
    val ex = ArgminL2Micro(BoundReference(0, embType, nullable = true),
      BoundReference(1, candType, nullable = true))
    val emb: ArrayData = new GenericArrayData(Array.fill(6)(0.0f))
    val arr1 = proj(candsRow(v1)).getArray(0)
    ex.eval(InternalRow(emb, arr1)) shouldBe 1 // cand 1 near the origin
    val arr2 = proj(candsRow(v2)).getArray(0) // same buffer, new bytes
    ex.eval(InternalRow(emb, arr2)) shouldBe 2 // perturbed cand 1 is now far
  }
}
