package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q233 DSIR importance-resampling selection — invariants beyond the
  * DuckDB oracle: a full driver-side reimplementation of the method
  * (hash → bucket histograms → smoothed log-ratio → per-doc weight →
  * top-100), plus the semantic property that makes DSIR DSIR — the
  * selected set is enriched in target-distribution documents.
  */
class DsirSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val B = 64
  private val stop = Llm.stopWords.toSet

  /** The q171 portable ASCII hash, driver-side. */
  private def hash(tok: String): Long = {
    var h = 0L
    var i = 0
    while (i < tok.length) { h += (i + 1).toLong * tok.charAt(i).toLong; i += 1 }
    h + 7919L * tok.length
  }

  private def isAscii(tok: String): Boolean =
    tok.forall(_ < 128) // chars == octets for the hash's portable subset

  /** (doc_id, tgt, bucketed ASCII tokens) for every document. */
  private lazy val docs: Seq[(Long, Boolean, Seq[Int])] = {
    graft.Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars").collect().toSeq.map { r =>
        val words = r.getString(1).toLowerCase.split(" ", -1).toSeq
        val nChars = r.getLong(2)
        val ratio = words.count(stop).toDouble / words.size
        val tgt = nChars >= 100 && nChars <= 500 && ratio >= 0.05
        val bs = words.filter(isAscii).map(t => (hash(t) % B).toInt)
        (r.getLong(0), tgt, bs)
      }
  }

  /** Brute DSIR: smoothed per-bucket log-ratio rounded to integer
    * micro-units, exact long per-doc sums, one final ÷10⁶, top-100 by
    * (weight DESC, doc_id). */
  private lazy val bruteTop: Seq[(Long, Double)] = {
    val cr = Array.fill(B)(0L); val ct = Array.fill(B)(0L)
    docs.foreach { case (_, tgt, bs) =>
      bs.foreach { b => cr(b) += 1; if (tgt) ct(b) += 1 }
    }
    val tr = cr.sum; val tt = ct.sum
    val lprMicro = Array.tabulate(B) { b =>
      BigDecimal((math.log((ct(b) + 1.0) / (tt + B)) -
        math.log((cr(b) + 1.0) / (tr + B))) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    docs.filter(_._3.nonEmpty)
      .map { case (id, _, bs) =>
        (id, bs.map(lprMicro).sum.toDouble / 1000000)
      }
      .sortBy { case (id, w) => (-w, id) }
      .take(100)
  }

  test("q233 equals a driver-side reimplementation of DSIR end to end") {
    val got = graft.SparkEntry.queries("q233_dsir_select")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    got should have size 100
    got shouldBe bruteTop
  }

  test("q233 selection is enriched in target-distribution documents") {
    val tgtById = docs.map { case (id, tgt, _) => id -> tgt }.toMap
    val selected = bruteTop.map(_._1)
    val selShare = selected.count(tgtById).toDouble / selected.size
    val corpusShare = docs.count(_._2).toDouble / docs.size
    withClue(s"selected=$selShare corpus=$corpusShare: ") {
      selShare should be > corpusShare
    }
  }

  test("q233 is rerun-deterministic") {
    val a = graft.SparkEntry.queries("q233_dsir_select")(spark, sf).collect().toSeq
    val b = graft.SparkEntry.queries("q233_dsir_select")(spark, sf).collect().toSeq
    a shouldBe b
  }
}
