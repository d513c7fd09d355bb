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
  * On a fingerprint hit the region is therefore verified against a
  * decode-time snapshot, in two tiers:
  *
  *  - regions ≤ [[FullCompareWords]] words: the snapshot holds EVERY
  *    word and every hit compares all of them — deterministic, no
  *    residual;
  *  - larger regions: a per-hit compare of [[SampleWords]] evenly
  *    strided words PLUS, every [[FullEvery]] hits, a full-region
  *    64-bit checksum recompute against the checksum folded at decode
  *    time. The per-hit sample is probabilistic (a reuse that rewrites
  *    fewer than ~1/SampleWords of the words can dodge one sample),
  *    but the periodic checksum bounds how long ANY persistent stale
  *    region can survive: at most FullEvery−1 rows before certain
  *    detection, at O(region)/FullEvery amortized per-row cost. (The
  *    full compare on EVERY hit measured 650 s at the ×1000 self-bench
  *    where the argmin itself is 140 s-class — see BASELINE.md; the
  *    amortized checksum is that cost / FullEvery.) The remaining
  *    residual is a region rewritten AND restored between two checksum
  *    rows while dodging the stride sample — noted honestly at the
  *    call sites.
  *
  *    Per-hit probe count: the round-8 default of 128 strided reads per
  *    hit (each a likely cache miss — the strides span the whole
  *    region) measured as a large share of the ADC family's ~1.4×
  *    round-8 inflation; the detection GUARANTEE never came from the
  *    probes (it is the periodic checksum's bounded-staleness argument),
  *    so round 9 drops the default to 16 probes — first/last word always
  *    included — and keeps the checksum cadence. Raise
  *    `-Dgraft.microRegion.sampleWords` for paranoid runs.
  *
  * Both knobs are JVM-level system properties read once at class load
  * (they size per-task caches, not per-query plans):
  * `-Dgraft.microRegion.fullCompareWords=N` raises the deterministic
  * tier (set it above your largest candidate region for
  * correctness-critical runs — the cost model is the only reason not
  * to); `-Dgraft.microRegion.fullEvery=N` tightens the staleness bound.
  *
  * UnsafeArrayData regions are 8-byte aligned and sized (the format pads
  * to words), so `size % 8 == 0` always holds for the arrays these
  * caches see; `snapshot`/`sameWords` still guard the tail read for
  * safety. Public (not package-private) because whole-stage-codegen'd
  * classes live outside `graft.functions` and call these directly.
  */
object MicroRegion {

  private def intProp(key: String, dflt: Int, min: Int): Int =
    scala.util.Try(System.getProperty(key).trim.toInt).toOption
      .filter(_ >= min).getOrElse(dflt)

  /** Regions of at most this many words are snapshotted and verified
    * in FULL on every hit; larger regions use the sampled+periodic-
    * checksum tier described in the class doc. */
  val FullCompareWords: Int = intProp("graft.microRegion.fullCompareWords", 512, 1)
  /** Sampled tier: words probed on EVERY hit (evenly strided; ≥2 so the
    * first and last word are always covered). */
  val SampleWords: Int = intProp("graft.microRegion.sampleWords", 16, 2)
  /** Sampled tier: every this-many hits, recompute the full-region
    * checksum (bounds persistent-stale survival to FullEvery−1 rows). */
  val FullEvery: Int = intProp("graft.microRegion.fullEvery", 512, 1)

  // sampled-tier snapshot layout: [0]=hit counter (mutated by
  // sameWords — single-threaded per task), [1]=full checksum,
  // [2..SampleWords+1]=strided words. The tier is chosen from `size`,
  // never from the array length, so the layouts can't be confused.
  private val SampledLen = SampleWords + 2

  @inline private def pos(i: Int, n: Int, k: Int): Long =
    if (k <= 1) 0L else (i.toLong * (n - 1)) / (k - 1)

  /** 64-bit mix-fold over every word of the region (splitmix64-style
    * finalizer per word, so single-bit flips diffuse). One sequential
    * pass — O(region), paid at decode time and on every FullEvery-th
    * hit only. */
  def checksum(base: AnyRef, off: Long, size: Long): Long = {
    val n = (size / 8L).toInt
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < n) {
      var x = Platform.getLong(base, off + i.toLong * 8L) + 0x9E3779B97F4A7C15L * (i + 1)
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      h ^= x ^ (x >>> 31)
      h = java.lang.Long.rotateLeft(h, 13) * 0x2545F4914F6CDD1DL
      i += 1
    }
    h
  }

  /** Copy the region's verification words: all of them for regions
    * ≤ [[FullCompareWords]], else the [[SampledLen]]-slot sampled-tier
    * snapshot (counter, checksum, strided probes — first and last word
    * always included). `size` in bytes. */
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
      val out = new Array[Long](SampledLen)
      out(0) = 0L
      out(1) = checksum(base, off, size)
      var i = 0
      while (i < SampleWords) {
        out(i + 2) = Platform.getLong(base, off + pos(i, n, SampleWords) * 8L)
        i += 1
      }
      out
    }
  }

  /** True iff the live region's verification words equal the snapshot
    * (same tiering as [[snapshot]]; sampled tier additionally verifies
    * the full checksum on every [[FullEvery]]-th call for this
    * snapshot). A null or length-mismatched snapshot is a miss (forces
    * re-decode). Mutates the sampled snapshot's hit counter — callers
    * are single-threaded per expression instance (codegen object state
    * / one eval thread per task). */
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
      if (words.length != SampledLen) return false
      var i = 0
      while (i < SampleWords) {
        if (Platform.getLong(base, off + pos(i, n, SampleWords) * 8L) != words(i + 2)) return false
        i += 1
      }
      words(0) += 1L
      if (words(0) % FullEvery == 0L && checksum(base, off, size) != words(1)) return false
    }
    true
  }
}
