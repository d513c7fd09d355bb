package graft.functions

import org.apache.spark.unsafe.Platform
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** ADVERSARIAL spec for the MicroRegion verify tiers, in particular the
  * >FullCompareWords SAMPLED tier the round-7 advisory called out: its
  * per-hit guarantee is probabilistic (128 strided probes), and this
  * spec PINS both halves of the documented contract — a single-word
  * flip placed OFF the stride grid dodges the per-hit sample (the
  * honest residual), and the periodic full checksum still catches it
  * within FullEvery hits (the bounded-staleness guarantee). The small
  * tier stays deterministic: any flip is caught on the next hit. */
class MicroRegionSpec extends AnyFunSuite with Matchers {

  private def region(nWords: Int): (Array[Long], Long, Long) = {
    val arr = Array.tabulate(nWords)(i => 0x5DEECE66DL * i + 11L)
    (arr, Platform.LONG_ARRAY_OFFSET.toLong, nWords.toLong * 8L)
  }

  /** Word indexes the sampled tier probes on every hit (mirror of
    * MicroRegion.pos). */
  private def strideGrid(n: Int): Set[Int] =
    (0 until MicroRegion.SampleWords)
      .map(i => ((i.toLong * (n - 1)) / (MicroRegion.SampleWords - 1)).toInt).toSet

  test("full tier (≤FullCompareWords): any single-word flip is caught on the next hit") {
    val n = MicroRegion.FullCompareWords
    val (base, off, size) = region(n)
    val snap = MicroRegion.snapshot(base, off, size)
    snap.length shouldBe n
    MicroRegion.sameWords(base, off, size, snap) shouldBe true
    base(n / 3) += 1L
    MicroRegion.sameWords(base, off, size, snap) shouldBe false
  }

  test("sampled tier: a flip ON the stride grid is caught on the next hit") {
    val n = 4 * MicroRegion.FullCompareWords
    val (base, off, size) = region(n)
    val snap = MicroRegion.snapshot(base, off, size)
    snap.length shouldBe MicroRegion.SampleWords + 2
    MicroRegion.sameWords(base, off, size, snap) shouldBe true
    base(strideGrid(n).toSeq.sorted.apply(MicroRegion.SampleWords / 2)) += 1L
    MicroRegion.sameWords(base, off, size, snap) shouldBe false
  }

  test("sampled tier: an off-grid single-word flip dodges per-hit probes but the periodic checksum bounds its survival to <FullEvery hits") {
    val n = 4 * MicroRegion.FullCompareWords
    val (base, off, size) = region(n)
    val snap = MicroRegion.snapshot(base, off, size)
    val victim = (0 until n).find(!strideGrid(n).contains(_)).get
    base(victim) += 1L
    // the residual, pinned: the very first post-flip hit still passes
    // (this is exactly what the advisory flagged — document, don't hide)
    MicroRegion.sameWords(base, off, size, snap) shouldBe true
    // the bound, pinned: within FullEvery further hits the full-region
    // checksum recompute fires and the stale region is refused
    val survived = Iterator.range(0, MicroRegion.FullEvery)
      .takeWhile(_ => MicroRegion.sameWords(base, off, size, snap)).size
    survived should be < MicroRegion.FullEvery
  }

  test("sampled tier: an unchanged region passes well past the checksum hits") {
    val n = 4 * MicroRegion.FullCompareWords
    val (base, off, size) = region(n)
    val snap = MicroRegion.snapshot(base, off, size)
    (0 until 3 * MicroRegion.FullEvery).foreach { _ =>
      MicroRegion.sameWords(base, off, size, snap) shouldBe true
    }
  }

  test("checksum diffuses a single-bit flip anywhere in the region") {
    val n = 1024
    val (base, off, size) = region(n)
    val h0 = MicroRegion.checksum(base, off, size)
    for (w <- Seq(0, 1, n / 2, n - 1); bit <- Seq(0, 31, 63)) {
      base(w) ^= (1L << bit)
      MicroRegion.checksum(base, off, size) should not be h0
      base(w) ^= (1L << bit)
    }
    MicroRegion.checksum(base, off, size) shouldBe h0
  }
}
