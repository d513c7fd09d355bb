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

  /** Copy the region's words. `size` in bytes, non-negative. */
  def snapshot(base: AnyRef, off: Long, size: Long): Array[Long] = {
    val n = (size / 8L).toInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Platform.getLong(base, off + i.toLong * 8L)
      i += 1
    }
    out
  }

  /** True iff the live region's words equal the snapshot. A null or
    * length-mismatched snapshot is a miss (forces re-decode). */
  def sameWords(base: AnyRef, off: Long, size: Long, words: Array[Long]): Boolean = {
    if (words == null || words.length.toLong != size / 8L) return false
    var i = 0
    val n = words.length
    while (i < n) {
      if (Platform.getLong(base, off + i.toLong * 8L) != words(i)) return false
      i += 1
    }
    true
  }
}
