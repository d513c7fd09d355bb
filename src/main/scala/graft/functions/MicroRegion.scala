package graft.functions

import org.apache.spark.unsafe.Platform

/** Word-level snapshot/compare of an UnsafeArrayData backing region, for
  * the argmin decode caches (ArgminL2Micro, MicroArgmin.CandDecodeCache).
  *
  * The caches key on (base, offset, numElements, sizeInBytes) plus a
  * 3-word head/mid/tail fingerprint. That fingerprint is O(1) but
  * probabilistic: under UnsafeRow buffer reuse (shuffle-read
  * UnsafeRowSerializer, sort iterators) the same region can later hold
  * DIFFERENT candidate bytes that happen to coincide on the three
  * sampled words — and a stale decode would silently change the argmin.
  * The fix (round-7, from the round-6 advisory): on a fingerprint hit,
  * verify the FULL region against a word snapshot taken at decode time.
  * The compare is a branch-per-word scan over bytes already in cache —
  * strictly cheaper than re-decoding, which allocates k fresh
  * double[] copies of the same byte volume — and it turns the cache from
  * "correct with overwhelming probability" into "correct, period".
  *
  * UnsafeArrayData regions are 8-byte aligned and sized (the format pads
  * to words), so `size % 8 == 0` always holds for the arrays these
  * caches see; `snapshot`/`sameWords` still guard the tail read for
  * safety. Public (not package-private) because whole-stage-codegen'd
  * classes live outside `graft.functions` and call these directly.
  */
object MicroRegion {

  /** Regions of at most this many words are snapshotted and verified
    * in FULL; larger regions use a [[SampleWords]]-point deterministic
    * stride sample. The verify runs on EVERY cache hit, i.e. every
    * stream row: a full-region compare there is O(region)·n — at the
    * ×1000 self-bench the 10k-candidate argmin region is ~5 MB, and
    * the per-row full scan measured 650 s where the argmin itself is
    * 140 s-class. An accidental buffer reuse (the hazard these caches
    * guard against) rewrites the region with a DIFFERENT row's data —
    * broad spans change, and 128 spread probes miss that with
    * probability ~(unchanged fraction)^128; the adversarial
    * single-word flip remains covered exactly for small regions and by
    * the head/mid/tail fingerprint + length + base identity beyond. */
  val FullCompareWords: Int = 512
  val SampleWords: Int = 128

  @inline private def pos(i: Int, n: Int, k: Int): Long =
    if (k <= 1) 0L else (i.toLong * (n - 1)) / (k - 1)

  /** Copy the region's verification words: all of them for regions
    * ≤ [[FullCompareWords]], else [[SampleWords]] evenly-strided probes
    * (first and last word always included). `size` in bytes. */
  def snapshot(base: AnyRef, off: Long, size: Long): Array[Long] = {
    val n = (size / 8L).toInt
    if (n <= FullCompareWords) {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = Platform.getLong(base, off + i.toLong * 8L)
        i += 1
      }
      out
    } else {
      val out = new Array[Long](SampleWords)
      var i = 0
      while (i < SampleWords) {
        out(i) = Platform.getLong(base, off + pos(i, n, SampleWords) * 8L)
        i += 1
      }
      out
    }
  }

  /** True iff the live region's verification words equal the snapshot
    * (same tiering as [[snapshot]]). A null or length-mismatched
    * snapshot is a miss (forces re-decode). */
  def sameWords(base: AnyRef, off: Long, size: Long, words: Array[Long]): Boolean = {
    if (words == null) return false
    val n = (size / 8L).toInt
    if (n <= FullCompareWords) {
      if (words.length != n) return false
      var i = 0
      while (i < n) {
        if (Platform.getLong(base, off + i.toLong * 8L) != words(i)) return false
        i += 1
      }
    } else {
      if (words.length != SampleWords) return false
      var i = 0
      while (i < SampleWords) {
        if (Platform.getLong(base, off + pos(i, n, SampleWords) * 8L) != words(i)) return false
        i += 1
      }
    }
    true
  }
}
