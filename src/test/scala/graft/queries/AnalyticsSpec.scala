package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Semantic invariants for the analytics + text-scoring operators
  * (q100–q110) — properties the DuckDB oracle cannot express (plan shape)
  * or that must hold structurally regardless of fixture content.
  */
class AnalyticsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)
  private def run2(dir: String, name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("q101 fuzzy join: result equals the brute-force blocked edit-distance pair set") {
    // brute-force model over all parts (fine at fixture scale) — asserts the
    // blocked join finds EXACTLY the qualifying pairs, no more, no less
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // sf0.01 so blocks are populated (sf0.001 has ~0.16 parts per block)
    val sfBig = "/root/testdata/sf0.01"
    val parts = graft.Tables.part(spark, sfBig).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(4)))
    val expected = (for {
      (ka, na, ba, sa) <- parts
      (kb, nb, bb, sb2) <- parts
      if ka < kb && ba == bb && sa == sb2 && lev(na, nb) <= 5
    } yield (ka, kb, lev(na, nb))).toSet
    expected should not be empty
    val actual = run2(sfBig, "q101_fuzzy_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    actual shouldBe expected
  }

  test("q101 plans as an equi-join on the blocking key (no nested-loop product)") {
    val p = run("q101_fuzzy_join").queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q102 unpivot: 3 long rows per wide row, values round-trip") {
    val wide = graft.Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_orderkey") < 100)
    val long = run("q102_unpivot").collect()
    long.length shouldBe wide.count() * 3
    // (l_orderkey, l_linenumber) is NOT unique in the fixture — compare the
    // full (key, measure, value) MULTISETS, not a keyed map
    def sorted(xs: Seq[(Long, Int, String, Double)]) = xs.sortBy(t => (t._1, t._2, t._3, t._4))
    val expected = wide.collect().flatMap(r => Seq(
      (r.getLong(0), r.getInt(3), "quantity", r.getDouble(4)),
      (r.getLong(0), r.getInt(3), "discount", r.getDouble(6)),
      (r.getLong(0), r.getInt(3), "tax", r.getDouble(7)))).toSeq
    val actual = long.map(r =>
      (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3))).toSeq
    sorted(actual) shouldBe sorted(expected)
  }

  test("q103 histogram: bin counts and totals partition the table exactly") {
    val rows = run("q103_histogram").collect()
    val o = graft.Tables.orders(spark, sf)
    rows.map(_.getLong(1)).sum shouldBe o.count()
    val total = rows.map(_.getDouble(2)).sum
    val direct = o.agg(Dsl.dsum(org.apache.spark.sql.functions.col("o_totalprice")))
      .collect()(0).getDouble(0)
    total shouldBe direct +- 1e-6
    rows.map(_.getInt(0)).toSeq shouldBe rows.map(_.getInt(0)).toSeq.sorted
  }

  test("q104 quality audit: metrics agree with direct counts on the fixture") {
    val m = run("q104_quality_audit").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = graft.Tables.orders(spark, sf)
    m("n_rows") shouldBe o.count()
    m("n_dup_key") shouldBe 0L       // o_orderkey unique in fixture
    m("n_null_custkey") shouldBe 0L  // fixture has no nulls
    m("n_status_values") shouldBe 3L // {F, O, P}
  }

  test("q106 funnel: stage populations are monotonically non-increasing") {
    val rows = run("q106_funnel").collect().sortBy(_.getInt(0))
    rows.map(_.getString(1)).toSeq shouldBe Seq("view", "click", "purchase")
    val users = rows.map(_.getLong(2))
    users(0) should be >= users(1)
    users(1) should be >= users(2)
    users(0) should be > 0L
  }

  test("q107 transitions: total transitions = events - users (one chain per user)") {
    val n = run("q107_transitions").collect().map(_.getLong(2)).sum
    val ev = graft.Tables.events(spark, sf)
    val users = ev.select("user_id").distinct().count()
    n shouldBe ev.count() - users
  }

  test("q108 SCD2: per-user intervals chain exactly (valid_to = next valid_from, one open)") {
    val rows = run("q108_scd2_intervals").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, hist) =>
      val sorted = hist.sortBy(r => (r.getTimestamp(2).getTime, r.getLong(1)))
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        a.getTimestamp(3) shouldBe b.getTimestamp(2) // closes at successor's start
      }
      sorted.count(_.isNullAt(3)) shouldBe 1 // exactly one current row
      sorted.last.isNullAt(3) shouldBe true
      // consecutive versions really differ
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        a.getDouble(4) should not be b.getDouble(4)
      }
    }
  }

  test("q100 BM25: scores positive, sorted desc, and every scored doc holds a query term") {
    val rows = run("q100_bm25").collect()
    rows should not be empty
    val scores = rows.map(_.getDouble(1))
    scores.foreach(_ should be > 0.0)
    scores.toSeq shouldBe scores.toSeq.sortBy(-_)
  }

  test("q100 plans broadcast for query terms, df stats, and corpus stats") {
    val p = run("q100_bm25").queryExecution.executedPlan.toString
    val n = p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin")
    (n + p.sliding("BroadcastNestedLoopJoin".length).count(_ == "BroadcastNestedLoopJoin")) should be >= 2
  }

  test("q105 unigram LM: cross-entropy positive and bounded by ln(corpus tokens)") {
    val rows = run("q105_unigram_lm").collect()
    rows should not be empty
    val totalTok = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")), " "))).count()
    val bound = math.log(totalTok.toDouble)
    rows.foreach { r =>
      r.getDouble(2) should be > 0.0
      r.getDouble(2) should be <= bound
    }
  }

  test("q109 entropy: 0 < H <= ln(vocabulary size) per language") {
    val rows = run("q109_lang_entropy").collect()
    rows.length shouldBe 5 // {de, en, es, fr, zh}
    val vocab = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.lower(
              org.apache.spark.sql.functions.col("text")), " ")).as("tok"))
      .distinct().groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val h = r.getDouble(1)
      h should be > 0.0
      h should be <= math.log(vocab(r.getString(0)).toDouble) + 1e-6
    }
  }

  test("q110 degree histogram: handshake lemma — Σ degree·n_nodes = 2·|pairs|") {
    val rows = run("q110_sim_graph_degree").collect()
    val degSum = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    val pairs = graft.SparkEntry.queries("q80_embedding_near_dup")(spark, sf).count()
    degSum shouldBe 2 * pairs
  }

  test("q140 MAD outliers: counts equal a brute-force median/MAD model per group") {
    // same interpolation as Spark percentile / DuckDB median: rank (n-1)/2
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val r = (s.length - 1) * 0.5
      val lo = r.toInt
      if (lo + 1 < s.length) s(lo) + (s(lo + 1) - s(lo)) * (r - lo) else s(lo)
    }
    val ev = graft.Tables.events(spark, sf).collect()
      .map(r => (r.getString(3), r.getDouble(4)))
    val expected = ev.groupBy(_._1).map { case (t, g) =>
      val vs = g.map(_._2)
      val med = median(vs)
      val mad = median(vs.map(v => math.abs(v - med)))
      (t, (vs.length.toLong, med, mad, vs.count(v => math.abs(v - med) > 3 * mad).toLong))
    }
    val rows = run("q140_mad_outliers").collect()
    rows.length shouldBe expected.size
    rows.foreach { r =>
      val (n, med, mad, out) = expected(r.getString(0))
      r.getLong(1) shouldBe n
      r.getDouble(2) shouldBe (med +- 1e-6)
      r.getDouble(3) shouldBe (mad +- 1e-6)
      r.getLong(4) shouldBe out
      r.getLong(4) should be < n // the screen never flags a whole group
    }
  }

  test("q141 attribution: pair set matches brute force; credits split a purchase exactly") {
    // microsecond-exact model: getTime is ms-truncated, and
    // floor(a/1000)-floor(b/1000) != floor((a-b)/1000) in general
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val ev = graft.Tables.events(spark, sf).collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getLong(2), r.getString(3)))
    val clicks = ev.filter(_._4 == "click")
    val expected = (for {
      (pid, pts, pu, _) <- ev.filter(_._4 == "purchase")
      (cid, cts, cu, _) <- clicks
      if cu == pu && cts <= pts && cts > pts - 6L * 3600 * 1000000
    } yield (pid, cid, (pts - cts) / 1000)).toSet
    val rows = run("q141_attribution").collect()
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet shouldBe expected
    expected should not be empty
    rows.groupBy(_.getLong(0)).foreach { case (_, touches) =>
      // equal split: n · round(1/n, 6) — within rounding of the 1/n literal
      touches.map(_.getDouble(3)).sum shouldBe (1.0 +- 1e-4)
      touches.map(_.getDouble(3)).distinct.length shouldBe 1
    }
  }

  test("q155 triangles: count equals a brute-force model; orientation preserves edges") {
    val sfBig = "/root/testdata/sf0.01" // sf0.001's graph is near-empty
    // brute-force co-purchase graph: distinct (order, part), pairs within
    // order, weight >= 2, degree-ordered orientation, closed wedges
    val li = graft.Tables.lineitem(spark, sfBig)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    // (not Map.collect returning the pair — that overload would REBUILD a
    // Map keyed by the first endpoint and silently collapse edges)
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    def key(n: Long) = (deg(n), n)
    val oriented = edges.map { case (u, v) =>
      if (Ordering[(Long, Long)].lt(key(u), key(v))) (u, v) else (v, u) }
    val bySrc = oriented.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._2) }
    val expectedTri = oriented.toSeq.map { case (s0, t0) =>
      bySrc.getOrElse(t0, Set.empty).count(w => oriented.contains((s0, w))).toLong
    }.sum
    val r = run2(sfBig, "q155_triangle_count").collect().head
    r.getLong(0) shouldBe edges.size.toLong   // n_edges
    r.getLong(1) shouldBe deg.size.toLong     // n_nodes
    r.getLong(2) shouldBe expectedTri         // n_triangles
    expectedTri should be > 0L
  }

  test("q155 final plan combines 1-row aggregates over the ONE materialized edge relation") {
    val p = run2("/root/testdata/sf0.01", "q155_triangle_count")
      .queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    // the edge/orientation pipelines are localCheckpoint'ed (they feed six
    // consumers), so the final plan reads the materialization — the
    // broadcast orientation joins ran exactly once, at checkpoint time
    p should include ("Scan ExistingRDD")
  }

  test("q154 bigram LM: cross-entropy positive, bounded by the smoothing floor") {
    val sfBig = "/root/testdata/sf0.01"
    val rows = run2(sfBig, "q154_bigram_perplexity").collect()
    rows should not be empty
    // add-one smoothing: every bigram probability is >= 1/(max_lead+V)
    // and < 1, so 0 < cross_entropy <= ln(max_lead_count + vocab)
    val train = graft.Tables.documents(spark, sfBig)
      .filter("substr(md5(cast(cast(doc_id as string) as binary)),1,2) < 'd0'")
      .selectExpr("split(lower(text), ' ') as w").filter("size(w) >= 2")
      .selectExpr("explode(transform(sequence(1, size(w)-1), i -> w[i-1])) as w1")
    val v = train.distinct().count()
    val maxLead = train.groupBy("w1").count()
      .agg(org.apache.spark.sql.functions.max("count")).collect()(0).getLong(0)
    val bound = math.log(maxLead.toDouble + v)
    rows.foreach { r =>
      r.getDouble(2) should be > 0.0
      r.getDouble(2) should be <= bound
    }
    // every held-out doc with >= 2 tokens is scored — none dropped
    val nTest = graft.Tables.documents(spark, sfBig)
      .filter("text is not null and size(split(lower(text), ' ')) >= 2")
      .filter("substr(md5(cast(cast(doc_id as string) as binary)),1,2) >= 'd0'")
      .count()
    rows.length.toLong shouldBe nTest
  }

  test("q156 diversity: ratios in (0,1], distinct <= total, agrees with direct counts") {
    val sfBig = "/root/testdata/sf0.01"
    val rows = run2(sfBig, "q156_ngram_diversity").collect()
    rows should not be empty
    val direct = graft.Tables.documents(spark, sfBig).filter("text is not null")
      .selectExpr("source", "split(lower(text), ' ') as w").filter("size(w) >= 3")
      .selectExpr("source",
        "explode(transform(sequence(1, size(w)-2), i -> concat_ws(' ', slice(w, i, 3)))) as g")
      .groupBy("source", "g").count()
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("count").as("n"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (n, dct) = direct(r.getString(0))
      r.getLong(1) shouldBe n
      r.getLong(2) shouldBe dct
      r.getDouble(3) should (be > 0.0 and be <= 1.0)
      r.getDouble(4) should (be > 0.0 and be <= 1.0)
      r.getDouble(4) should be >= 1.0 / dct
    }
  }
}
