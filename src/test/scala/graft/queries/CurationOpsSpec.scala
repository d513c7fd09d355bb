package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Semantic invariants for the q161–q179 additions — properties beyond
  * what the DuckDB oracle asserts (brute-force model equality, bound
  * checks, determinism, composition consistency between queries that
  * share a builder).
  */
class CurationOpsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q162: the kept doc IS a member of its q78 cluster and has its max n_chars") {
    val clusters = run("q78_dedup_groups").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq // (doc, cluster)
    val chars = graft.Tables.documents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap // doc -> n_chars
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val kept = run("q162_quality_survivor").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    kept should not be empty
    kept.foreach { case (cid, keptDoc, nDocs, keptChars) =>
      val members = byCluster(cid)
      members should contain(keptDoc)
      nDocs shouldBe members.size
      keptChars shouldBe members.map(chars).max
      // tiebreak: min doc_id among the max-chars members
      keptDoc shouldBe members.filter(d => chars(d) == keptChars).min
    }
  }

  test("q166: sliding 7-day distinct equals a brute-force window over (day, user)") {
    val du = graft.Tables.events(spark, sf).collect()
      .map(r => (r.getTimestamp(1).getTime / 86400000L, r.getLong(2))).distinct
    val days = du.map(_._1).distinct
    val expected = days.map { d =>
      d -> du.filter { case (dd, _) => dd >= d - 6 && dd <= d }.map(_._2).distinct.size.toLong
    }.toMap
    val actual = run("q166_sliding_distinct").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    actual shouldBe expected
  }

  test("q167: every q101 fuzzy pair lands in one entity; entity ids are cluster minima") {
    val ent = run("q167_entity_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap // part -> entity
    val pairs = run("q101_fuzzy_join").collect().map(r => (r.getLong(0), r.getLong(1)))
    // sf0.001 blocks are sparse; tolerate an empty pair set but not a
    // pair that crosses entities
    pairs.foreach { case (a, b) => ent(a) shouldBe ent(b) }
    ent.groupBy(_._2).foreach { case (eid, members) =>
      eid shouldBe members.keys.min
    }
  }

  test("q169: vocab_95 is the MINIMAL prefix reaching 95% token mass") {
    val toks = graft.Tables.documents(spark, sf).collect()
      .flatMap(r => r.getString(1).toLowerCase.split(" ").map((r.getString(2), _)))
    val byLang = toks.groupBy(_._1)
    val rows = run("q169_vocab_coverage").collect()
    rows.length shouldBe byLang.size
    rows.foreach { r =>
      val (lang, vocabTotal, total, v95) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val counts = byLang(lang).groupBy(_._2).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (t, c) => (-c, t) }.map(_._2)
      counts.size.toLong shouldBe vocabTotal
      counts.sum shouldBe total
      val prefix = counts.take(v95.toInt).sum
      (prefix * 100 >= 95 * total) shouldBe true
      if (v95 > 1) (counts.take(v95.toInt - 1).sum * 100 < 95 * total) shouldBe true
    }
  }

  test("q171: hashed features are deterministic and conserve token mass") {
    val a = run("q171_feature_hashing").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = run("q171_feature_hashing").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    a shouldBe b // rerun-stable (pure arithmetic, no engine hash)
    val nWords = graft.Tables.documents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ", -1).length.toLong)).toMap
    a.groupBy(_._1).foreach { case (doc, rows) =>
      rows.map(_._2).distinct.length shouldBe rows.length // one row per dim
      rows.forall(r => r._2 >= 0 && r._2 < 16) shouldBe true
      // signed counts: |Σw| ≤ Σ|w| ≤ n_words; total signed mass parity
      rows.map(x => math.abs(x._3)).sum should be <= nWords(doc)
    }
  }

  test("q172: skewness/kurtosis equal a brute-force model on the fixture") {
    val vals = graft.Tables.events(spark, sf).collect()
      .map(r => (r.getString(3), math.round(r.getDouble(4) * 1000).toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = run("q172_higher_moments").collect()
    rows.foreach { r =>
      val vs = vals(r.getString(0))
      val n = vs.length.toDouble
      val m1 = vs.sum / n
      val m2 = vs.map(v => (v - m1) * (v - m1)).sum / n
      val m3 = vs.map(v => math.pow(v - m1, 3)).sum / n
      val m4 = vs.map(v => math.pow(v - m1, 4)).sum / n
      r.getLong(1) shouldBe vs.length.toLong
      r.getDouble(3) shouldBe (math.sqrt(m2) / 1000.0) +- 1e-4
      r.getDouble(4) shouldBe (m3 / math.pow(m2, 1.5)) +- 1e-4
      r.getDouble(5) shouldBe (m4 / (m2 * m2) - 3.0) +- 1e-4
    }
  }

  test("q174: KS statistic equals the brute-force empirical-CDF supremum") {
    val docs = graft.Tables.documents(spark, sf).collect()
      .map(r => (r.getString(3), r.getLong(4)))
    val a = docs.filter(_._1 == "src0").map(_._2).sorted
    val b = docs.filter(_._1 == "src1").map(_._2).sorted
    val support = (a ++ b).distinct.sorted
    val expected = support.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.length - b.count(_ <= v).toDouble / b.length)
    }.max
    val r = run("q174_ks_test").collect()(0)
    r.getLong(0) shouldBe a.length.toLong
    r.getLong(1) shouldBe b.length.toLong
    r.getDouble(3) shouldBe expected +- 1e-5
  }

  test("q175: Gini equals the brute-force mean-absolute-difference form; bounded [0,1)") {
    val byPri = graft.Tables.orders(spark, sf).collect()
      .map(r => (r.getString(5), math.round(r.getDouble(3) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    val rows = run("q175_gini_index").collect()
    rows.foreach { r =>
      val vs = byPri(r.getString(0))
      val n = vs.length.toDouble
      // G = Σ|vi - vj| / (2 n² μ) — the O(n²) definition the prefix-sum
      // identity must reproduce
      val mad = (for (x <- vs; y <- vs) yield math.abs(x - y)).sum
      val expected = mad / (2.0 * n * n * (vs.sum / n))
      // the identity uses (n+1) (sample convention); they agree to O(1/n)
      r.getDouble(2) shouldBe expected +- 2.0 / n
      r.getDouble(2) should be >= 0.0
      r.getDouble(2) should be < 1.0
    }
  }

  test("q177: pair set equals brute-force within-cluster cosine >= 0.35") {
    val pairs = run("q177_semantic_dedup").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    // brute force: recompute assignment + cosine in local Scala
    val embs = graft.Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble), r.getInt(2)))
    def micro(x: Double) = math.round(x * 1e6).toDouble
    val cents = embs.groupBy(_._3).view.mapValues { vs =>
      val k = vs.length
      Array.tabulate(64)(i => vs.map(v => micro(v._2(i))).sum / k)
    }.toMap
    val assigned = embs.map { case (id, e, _) =>
      val best = cents.toSeq.map { case (c, cv) =>
        (c, e.indices.map(i => { val d = micro(e(i)) - cv(i); d * d }).sum)
      }.minBy { case (c, dist) => (dist, c) }._1
      id -> best
    }.toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byId = embs.map(e => e._1 -> e._2).toMap
    val expected = (for {
      (ia, _, _) <- embs; (ib, _, _) <- embs
      if ia < ib && assigned(ia) == assigned(ib) && cos(byId(ia), byId(ib)) >= 0.35
    } yield (ia, ib)).toSet
    pairs shouldBe expected
  }

  test("q178: corrupted + target partition the document exactly; span inside bounds") {
    val nWords = graft.Tables.documents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ").length.toLong)).toMap
    val rows = run("q178_span_corruption").collect()
    rows should not be empty
    rows.foreach { r =>
      val (doc, n, st, ln) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      n shouldBe nWords(doc)
      (st >= 1 && st + ln - 1 <= n) shouldBe true
      val corrupted = r.getString(4).split(" ").length.toLong
      val target = r.getString(5).split(" ").length.toLong
      target shouldBe ln
      corrupted shouldBe (n - ln + 1) // span replaced by one sentinel token
    }
  }

  test("q180: covariance cells equal a brute-force model; diagonal is variance") {
    val embs = graft.Tables.embeddings(spark, sf).collect()
      .map(r => r.getSeq[Float](1).toArray.map(x => math.round(x.toDouble * 1e6).toDouble))
    val n = embs.length.toDouble
    def cell(i: Int, j: Int) = {
      val sab = embs.map(e => e(i) * e(j)).sum
      val sa = embs.map(_(i)).sum; val sb = embs.map(_(j)).sum
      (sab / n - (sa / n) * (sb / n)) / 1e12
    }
    val rows = run("q180_covariance_matrix").collect()
    rows.length shouldBe 64 * 65 / 2
    rows.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      r.getDouble(2) shouldBe cell(i, j) +- 1e-6
      if (i == j) r.getDouble(2) should be >= 0.0
    }
  }

  test("q181: third peel is the 2-core fixed point on the fixture") {
    val pairs = run("q80_embedding_near_dup").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = (pairs ++ pairs.map(p => (p._2, p._1))).toSet
    def peel(es: Set[(Long, Long)]): Set[(Long, Long)] = {
      val deg = es.groupBy(_._1).view.mapValues(_.size).toMap
      val alive = deg.filter(_._2 >= 2).keySet
      es.filter(e => alive(e._1) && alive(e._2))
    }
    for (_ <- 0 until 3) edges = peel(edges)
    peel(edges) shouldBe edges // converged: a 4th peel changes nothing
    val expected = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val actual = run("q181_kcore").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    actual shouldBe expected
  }

  test("q182: band counts partition the intersection pair set exactly") {
    val bands = run("q182_threshold_bands").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    bands.map(_._1).distinct.length shouldBe bands.length
    bands.foreach { case (b, np) => (b >= 0 && b <= 9) shouldBe true; np should be > 0L }
    // pairs at jaccard >= 0.03 (q47's floor) are a subset of all banded pairs
    val q47n = run("q47_near_dup_jaccard").collect().length.toLong
    bands.map(_._2).sum should be >= q47n
  }

  test("q183: predictions equal brute-force common-neighbors >= 2 minus existing edges") {
    val pairs = run("q80_embedding_near_dup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keys.toSeq.sorted
    val expected = (for {
      a <- nodes; b <- nodes
      if a < b && !pairs((a, b))
      common = adj(a).toSet.intersect(adj(b).toSet).size
      if common >= 2
    } yield ((a, b), common.toLong)).toMap
    val actual = run("q183_link_prediction").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    actual shouldBe expected
  }

  test("q184: AUC equals a brute-force midrank computation and sits in [0,1]") {
    val ev = graft.Tables.events(spark, sf).collect()
      .map(r => (r.getDouble(4), r.getString(3) == "purchase"))
    val nPos = ev.count(_._2).toLong
    val nNeg = ev.length - nPos
    // midrank model: rank positives among all scores, average over ties
    val sorted = ev.map(_._1).sorted
    val rankLo = sorted.zipWithIndex.groupBy(_._1).view.mapValues(_.map(_._2).min + 1).toMap
    val rankHi = sorted.zipWithIndex.groupBy(_._1).view.mapValues(_.map(_._2).max + 1).toMap
    val sumMid = ev.filter(_._2).map(e => (rankLo(e._1) + rankHi(e._1)) / 2.0).sum
    val expected = (sumMid - nPos * (nPos + 1) / 2.0) / (nPos.toDouble * nNeg)
    val r = run("q184_auc").collect()(0)
    r.getLong(0) shouldBe nPos
    r.getLong(1) shouldBe nNeg
    r.getDouble(2) shouldBe expected +- 1e-5
    r.getDouble(2) should (be >= 0.0 and be <= 1.0)
  }

  test("q179: no sampled negative is an actual positive; slots bounded") {
    val pos = graft.Tables.lineitem(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = run("q179_negative_sampling").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows should not be empty
    rows.foreach { case (ok, slot, neg) =>
      pos should not contain ((ok, neg))
      (slot >= 0 && slot <= 4) shouldBe true
    }
  }
}
