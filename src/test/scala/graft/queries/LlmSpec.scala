package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Statistical/semantic checks for the no-oracle LLM operators. */
class LlmSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("A4: q16 exact column matches, HLL++ tolerance gate is true") {
    // graded row: (l_returnflag, exact_parts, within_tol) — the estimate
    // is compared to exact IN-QUERY at a 6% (3 sigma) gate
    val df = graft.SparkEntry.queries("q16_approx_distinct")(spark, sf).collect()
    val exact = graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    df.foreach { r =>
      r.getLong(1) shouldBe exact(r.getString(0))
      r.getBoolean(2) shouldBe true
    }
    // independent 5% re-check of the estimator itself
    val est = graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions
        .approx_count_distinct(org.apache.spark.sql.functions.col("l_partkey"), 0.02).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (flag, e) =>
      math.abs(e - exact(flag)).toDouble / exact(flag) should be < 0.05
    }
  }

  test("L3: MinHash-LSH provable recall gate holds; probabilistic recall is measured") {
    // graded row: (n_identical_pairs, recall_ok) — the gate is the
    // PROVABLE property (identical shingle sets ⇒ identical signatures ⇒
    // candidate); J≥0.8 recall is probabilistic (≈12% per-pair miss at
    // 4×4 banding) and only MEASURED, never asserted
    val gate = graft.SparkEntry.queries("q48_minhash_lsh")(spark, sf).collect()
    gate.length shouldBe 1
    gate(0).getBoolean(1) shouldBe true
    // exact-duplicate TEXTS are a lower bound on identical-set pairs
    val F = org.apache.spark.sql.functions
    val dupTextPairs = graft.Tables.documents(spark, sf)
      .filter(F.col("text").isNotNull &&
        F.size(F.split(F.lower(F.col("text")), " ")) >= 3)
      .groupBy("text").agg(F.count(F.lit(1)).as("n")).filter(F.col("n") >= 2)
      .collect().map(r => { val n = r.getLong(1); n * (n - 1) / 2 }).sum
    gate(0).getLong(0) should be >= dupTextPairs
    info(s"identical-set pairs=${gate(0).getLong(0)} (dup-text lower bound $dupTextPairs)")
    // measured (not asserted) recall on the probabilistic J≥0.8 class
    val exact = Llm.jaccardPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val strong = exact.filter(_._3 >= 0.8).map(t => (t._1, t._2)).toSet
    val candidates = Llm.minHashCandidates(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    if (strong.nonEmpty) {
      val recall = strong.count(candidates.contains).toDouble / strong.size
      info(f"measured recall@J>=0.8: $recall%.2f over ${strong.size} pairs, " +
        s"candidates=${candidates.size}")
    }
  }

  test("L5: IVF-pruned top-k is exact WITHIN its cell and measures its recall vs brute force") {
    import org.apache.spark.sql.functions.col
    val exact = graft.SparkEntry.queries("q50_cosine_topk")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val ivf = graft.SparkEntry.queries("q51_cosine_topk_ivf")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    // structure: same query set, ≤ k neighbors each, no self-matches,
    // and every IVF neighbor shares the query's label (cell containment)
    ivf.keys.toSet shouldBe exact.keys.toSet
    ivf.values.foreach(_.size should be <= 5)
    val labels = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    ivf.foreach { case (q, ns) =>
      ns should not contain q
      ns.foreach(n => labels(n) shouldBe labels(q))
    }
    // recall is informational on this fixture: labels are synthetic
    // coarse cells, not learned centroids, so cell-pruned recall over
    // random vectors is low by construction — the graded property is
    // the SHAPE (bounded candidate set = the query's cell, exact
    // rank within it), the log keeps the trade-off visible
    val recalls = exact.map { case (q, ns) =>
      ivf.get(q).map(iv => iv.intersect(ns).size.toDouble / ns.size).getOrElse(0.0)
    }
    info(f"ivf recall@5 vs brute force: mean ${recalls.sum / recalls.size}%.2f over ${recalls.size} queries")
  }

  test("multi-probe LSH: candidate set strictly contains single-bucket's; recall never drops") {
    // q132 probes the query's bucket plus its four 1-bit-flip neighbors,
    // so per query its neighbor set must contain every q95 neighbor with
    // cos >= the multi-probe 5th-best (the candidate set is a superset;
    // top-5 can only improve), and recall@5 vs brute force (q50) must be
    // >= single-probe recall for every query set
    def topSets(name: String) =
      graft.SparkEntry.queries(name)(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val single = topSets("q95_lsh_ann")
    val multi = topSets("q132_multiprobe_ann")
    val brute = topSets("q50_cosine_topk")
    multi.keys.toSet shouldBe single.keys.toSet
    def recall(ann: Map[Long, Set[Long]]) = {
      val per = brute.toSeq.map { case (q, ns) =>
        ann.get(q).map(a => a.intersect(ns).size.toDouble / ns.size).getOrElse(0.0)
      }
      per.sum / per.size
    }
    val rs = recall(single)
    val rm = recall(multi)
    rm should be >= rs
    info(f"recall@5 vs brute: single-probe $rs%.2f -> multi-probe $rm%.2f")
  }

  test("q133 bloom decontamination: no false negatives, bounded false positives") {
    // the graded row computes its gates in-query; re-derive the exact
    // side here to pin the wiring (candidates = docs with >=5 words off
    // the eval slice; exact_bad matches the q93 contaminated-set size)
    val row = graft.SparkEntry.queries("q133_bloom_decon")(spark, sf).collect()
    row.length shouldBe 1
    row(0).getLong(0) should be > 0L    // n_candidates
    row(0).getBoolean(2) shouldBe true  // no_false_negatives
    row(0).getBoolean(3) shouldBe true  // fp_bounded (5% of candidates)
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sf)
    val nDecontaminated = graft.SparkEntry.queries("q93_decontaminate")(spark, sf).count()
    val offEval = docs.filter(col("doc_id") % 97 =!= 0).count()
    // q93 keeps (off-eval docs - exact_bad); q133's exact_bad must agree
    row(0).getLong(1) shouldBe (offEval - nDecontaminated)
  }

  test("SimHash banded pairs find EXACTLY the Hamming<=3 pairs (pigeonhole recall = 1)") {
    val sigsDf = graft.SparkEntry.queries("q49_simhash")(spark, sf)
    val sigs = sigsDf.collect().map(r => r.getLong(0) -> r.getLong(1))
    // brute force over all signature pairs
    val expected = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) if h <= 3
      a = math.min(sigs(i)._1, sigs(j)._1); b = math.max(sigs(i)._1, sigs(j)._1)
    } yield (a, b, h.toLong)).toSet
    val got = Llm.simHashBandedPairs(sigsDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // banding is EXACT for radius 3 with 4×16-bit bands (pigeonhole):
    // set equality, not a recall bound
    got shouldBe expected
    info(s"hamming<=3 pairs: ${got.size} over ${sigs.length} docs")
    // the graded q92 row certifies the same equality in-query
    val cert = graft.SparkEntry.queries("q92_simhash_pairs")(spark, sf).collect()
    cert.length shouldBe 1
    cert(0).getLong(0) shouldBe sigs.length.toLong
    cert(0).getBoolean(1) shouldBe true
  }

  test("SimHash bucket cap: fixture pair set unchanged under a realistic cap") {
    // the 100 TB guard: capping (band, bkey) posting lists bounds the
    // worst key's fanout; on this corpus no bucket exceeds the cap, so
    // the pair set must be IDENTICAL — the exactness trade-off only
    // begins past the cap
    val sigsDf = graft.SparkEntry.queries("q49_simhash")(spark, sf)
    val uncapped = Llm.simHashBandedPairs(sigsDf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Llm.simHashBandedPairs(sigsDf, bucketCap = Some(100)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    capped shouldBe uncapped
    // a degenerate cap of 1 keeps only singleton buckets -> no pairs
    val starved = Llm.simHashBandedPairs(sigsDf, bucketCap = Some(1)).count()
    starved shouldBe 0L
  }

  test("SimHash signatures are deterministic across runs") {
    val sig1 = graft.SparkEntry.queries("q49_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sig2 = graft.SparkEntry.queries("q49_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sig1 shouldBe sig2
  }

  test("dedup pipeline composes end-to-end: jaccard+minhash pairs -> cleaned corpus") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sf)
    val nDocs = docs.count()
    // union both candidate sources (exact pairs + LSH candidates)
    val jac = graft.SparkEntry.queries("q47_near_dup_jaccard")(spark, sf)
      .select(col("doc_a"), col("doc_b"))
    val lsh = Llm.minHashCandidates(spark, sf)
      .select(col("doc_a"), col("doc_b"))
    val pairs = jac.union(lsh).distinct()
    val cleaned = graft.operators.Dedup.keepSurvivors(docs, "doc_id", pairs, "doc_a", "doc_b")
    val kept = cleaned.count()
    val paired = pairs.select(col("doc_a")).union(pairs.select(col("doc_b"))).distinct().count()
    // every drop is justified by membership in a candidate pair...
    (nDocs - kept) should be < paired
    // ...at least one doc survives per cluster, so drops < paired docs,
    // and docs outside any pair are all retained
    kept should be >= (nDocs - paired + 1)
    kept should be < nDocs // fixtures do contain near-dups
    // survivors include the minimum doc_id of every pair component
    val keptIds = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    val minPaired = pairs.agg(org.apache.spark.sql.functions.min(
      org.apache.spark.sql.functions.least(col("doc_a"), col("doc_b")))).collect()(0).getLong(0)
    keptIds should contain (minPaired)
  }

  test("q93: survivors share NO 5-shingle with the eval slice (independent Scala check)") {
    // reimplement contamination directly on collected texts — a second,
    // join-free derivation the query (and its oracle) must agree with
    def shingles(text: String): Set[String] = {
      val w = text.toLowerCase.split(" ", -1)
      if (w.length < 5) Set.empty
      else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
    val evalSh = docs.filter(_._1 % 97 == 0).flatMap(d => shingles(d._2)).toSet
    val expectSurvivors = docs.filter(_._1 % 97 != 0)
      .filter(d => shingles(d._2).intersect(evalSh).isEmpty)
      .map(_._1).toSet
    val got = graft.SparkEntry.queries("q93_decontaminate")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    got shouldBe expectSurvivors
    // the eval slice itself is never part of the cleaned corpus
    got.exists(_ % 97 == 0) shouldBe false
  }

  test("PII redaction: crafted strings redact exactly, leave no residual match, and are idempotent") {
    import org.apache.spark.sql.functions.{col, lit, regexp_count}
    import spark.implicits._
    val cases = Seq(
      ("mail a.b+c%x@sub.ex-y.co and d@e.org now", "mail <EMAIL> and <EMAIL> now"),
      ("call 415-555-0199 or 800-555-0100.", "call <PHONE> or <PHONE>."),
      ("host 192.168.0.1, gateway 10.0.0.254.", "host <IP>, gateway <IP>."),
      ("all three: u_1@a.io 212-555-9999 127.0.0.1", "all three: <EMAIL> <PHONE> <IP>"),
      ("no pii here, just words and 1234 numbers", "no pii here, just words and 1234 numbers"),
      ("almost: user@localhost 123-444-5678 1.2.3", "almost: user@localhost 123-444-5678 1.2.3"))
    val df = cases.toDF("raw", "expected")
      .withColumn("red", Llm.redactPii(col("raw")))
    df.collect().foreach { r =>
      r.getString(2) shouldBe r.getString(1)
    }
    // idempotence + zero residual matches on the redacted output
    val chk = df.select(
      Llm.redactPii(col("red")).as("red2"), col("red"),
      (regexp_count(col("red"), lit(Llm.emailRe)) +
        regexp_count(col("red"), lit(Llm.phoneRe)) +
        regexp_count(col("red"), lit(Llm.ipRe))).as("residual")).collect()
    chk.foreach { r =>
      r.getString(0) shouldBe r.getString(1)
      r.getInt(2) shouldBe 0
    }
  }

  test("q95: LSH buckets partition the corpus and within-bucket top-k is measured vs brute force") {
    val ann = graft.SparkEntry.queries("q95_lsh_ann")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
    // per query: at most 5 neighbors, cos non-increasing in rank, one bucket
    ann.groupBy(_._1).foreach { case (_, rows) =>
      rows.length should be <= 5
      val byRank = rows.sortBy(_._5)
      byRank.map(_._4).sliding(2).foreach {
        case Array(a, b) => a should be >= b
        case _           =>
      }
      rows.map(_._3).distinct.length shouldBe 1
    }
    // the hash actually splits the space: >1 distinct bucket over the queries
    ann.map(_._3).distinct.length should be > 1
    // recall@5 vs the exact brute-force top-5 (informational: 4 random
    // hyperplanes keep ~1/16 of the corpus as candidates)
    val exact = graft.SparkEntry.queries("q50_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ann.map(t => (t._1, t._2)).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    info(s"lsh-ann recall@5 vs brute force: $recall over ${exact.size} pairs")
    recall should be > 0.0 // buckets preserve SOME true neighbors on this corpus
  }

  test("normalization: crafted strings normalize exactly and idempotently") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val cases = Seq(
      ("  Hello\t\tWORLD  ", "hello world"),
      ("a\r\nb\rc\nd", "a b c d"),
      ("zero\u200Bwidth \u200B gone", "zerowidth gone"),
      ("already clean", "already clean"),
      ("", ""),
      ("   ", ""),
      ("MiXeD CaSe\u200B", "mixed case"))
    val df = cases.toDF("raw", "expected")
      .withColumn("norm", Llm.normalizeCol(col("raw")))
      .withColumn("norm2", Llm.normalizeCol(col("norm")))
    df.collect().foreach { r =>
      r.getAs[String]("norm") shouldBe r.getAs[String]("expected")
      r.getAs[String]("norm2") shouldBe r.getAs[String]("norm") // idempotent
    }
  }

  test("q98: snapshot diff agrees with an independent Scala derivation") {
    val orders = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val a = orders.filter(_._1 % 11 != 0).toMap
    val b = orders.filter(_._1 % 13 != 0)
      .map { case (k, v) => k -> (if (k % 7 == 0) v * 1.05 else v) }.toMap
    val expected = (a.keySet ++ b.keySet).flatMap { k =>
      (a.get(k), b.get(k)) match {
        case (None, Some(_))              => Some(k -> "added")
        case (Some(_), None)              => Some(k -> "removed")
        case (Some(x), Some(y)) if x != y => Some(k -> "changed")
        case _                            => None
      }
    }.toMap
    val got = graft.SparkEntry.queries("q98_snapshot_diff")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got shouldBe expected
  }

  test("q139 dup spans: result equals the brute-force 13-gram cross-doc model") {
    val docs = graft.Tables.documents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val occ = for {
      (id, text) <- docs.toSeq
      w = text.toLowerCase.split(" ", -1)
      if w.length >= 13
      i <- 0 to w.length - 13
    } yield (w.slice(i, i + 13).mkString(" "), id)
    val expected = occ.groupBy(_._1)
      .map { case (s, g) => (s, g.map(_._2).distinct.length.toLong, g.length.toLong) }
      .filter(_._2 >= 2).toSeq
      .sortBy { case (s, nd, no) => (-nd, -no, s) }
      .take(50)
    expected should not be empty
    val rows = graft.SparkEntry.queries("q139_dup_spans")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    rows shouldBe expected
  }

  test("q142 mixture: allocation sums to budget, satisfies quota, and delivers exactly") {
    val rows = graft.SparkEntry.queries("q142_mixture_alloc")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val counts = graft.Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val budget = total / 2
    rows.map(_._2).sum shouldBe budget
    rows.foreach { case (lang, alloc, kept, _) =>
      kept shouldBe alloc // exact delivery, not best-effort
      val base = budget * counts(lang) / total
      alloc should (be(base) or be(base + 1)) // Hamilton quota property
    }
    rows.map(_._1).toSet shouldBe counts.keySet // no language starved out
  }

  test("q99: centroid assignment agrees with an independent Scala derivation") {
    val rows = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    // same micro-int scheme as the query: e -> round(e * 1e6) exactly
    def micro(e: Float): Double = math.rint(e.toDouble * 1000000.0)
    val byLabel = rows.groupBy(_._3)
    val centroids = byLabel.map { case (l, vs) =>
      l -> Array.tabulate(64) { i =>
        vs.map(v => micro(v._2(i)).toLong).sum.toDouble / vs.length
      }
    }
    val expected = rows.map { case (_, emb, label) =>
      val best = centroids.toSeq.map { case (cand, c) =>
        val dist = (0 until 64).foldLeft(0.0) { (acc, i) =>
          val d = micro(emb(i)) - c(i); acc + d * d
        }
        (dist, cand)
      }.minBy(identity)
      (label, best._2)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = graft.SparkEntry.queries("q99_centroid_assign")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    got shouldBe expected
    got.values.sum shouldBe rows.length // every vector assigned exactly once
  }

  test("q158 containment: agrees with a brute-force shingle-set model (incl. df cap)") {
    val sfBig = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, sfBig)
      .selectExpr("doc_id", "lang", "split(lower(text), ' ') as w")
      .filter("size(w) >= 3").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getSeq[String](2).sliding(3).map(_.mkString(" ")).toSet))
    // df cap at 100 within lang — mirror the query's posting-list cap
    val df = docs.flatMap { case (_, l, ss) => ss.map(sh => (l, sh)) }
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val capped = docs.map { case (id, l, ss) =>
      (id, l, ss.filter(sh => df((l, sh)) <= 100)) }
    val expected = (for {
      (ida, la, sa) <- capped; (idb, lb, sb2) <- capped
      if ida < idb && la == lb
      i = (sa & sb2).size
      if i > 0 && sa.nonEmpty && sb2.nonEmpty
      c = i.toDouble / math.min(sa.size, sb2.size)
      if c >= 0.5
    } yield (ida, idb) -> (sa.size.toLong, sb2.size.toLong, i.toLong, c)).toMap
    val rows = graft.SparkEntry.queries("q158_containment_dup")(spark, sfBig).collect()
    rows.length shouldBe expected.size
    expected should not be empty
    rows.foreach { r =>
      val (ca, cb, i, c) = expected((r.getLong(0), r.getLong(1)))
      r.getLong(2) shouldBe ca
      r.getLong(3) shouldBe cb
      r.getLong(4) shouldBe i
      r.getDouble(5) shouldBe (c +- 1e-6)
    }
  }

  test("q160 incremental dedup: classes agree with a brute-force fingerprint model") {
    val sfBig = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, sfBig).filter("text is not null")
      .selectExpr("doc_id", "lang",
        "concat_ws(' ', slice(split(lower(text), ' '), 1, 8)) as fp",
        "substr(md5(cast(cast(doc_id as string) as binary)),1,2) < 'd0' as in_index")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    val idxFp = docs.filter(_._4).map(_._3).toSet
    val batch = docs.filterNot(_._4)
    val minId = batch.groupBy(_._3).map { case (fp, ds) => fp -> ds.map(_._1).min }
    val expected = batch.map { case (id, lang, fp, _) =>
      val status =
        if (idxFp(fp)) "dup_of_index"
        else if (id > minId(fp)) "dup_in_batch"
        else "new"
      (lang, status, id)
    }.groupBy(t => (t._1, t._2))
      .map { case (k, v) => k -> (v.size.toLong, v.map(_._3).sum) }
    val rows = graft.SparkEntry.queries("q160_incremental_dedup")(spark, sfBig).collect()
    rows.length shouldBe expected.size
    rows.foreach { r =>
      val (n, idSum) = expected((r.getString(0), r.getString(1)))
      r.getLong(2) shouldBe n
      r.getLong(3) shouldBe idSum
    }
    // the fixture exercises every class — the query is not degenerate
    rows.map(_.getString(1)).toSet shouldBe Set("dup_of_index", "dup_in_batch", "new")
  }

  test("q159 embed stats: agrees with a direct per-dimension model") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val rows = graft.SparkEntry.queries("q159_embed_stats")(spark, sf).collect()
    rows.length shouldBe 64
    rows.foreach { r =>
      val dim = r.getLong(0).toInt
      val xs = vecs.map(v => v(dim).toDouble)
      r.getLong(1) shouldBe xs.length.toLong
      val mean = xs.sum / xs.length
      val std = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1))
      r.getDouble(2) shouldBe (mean +- 1e-5)
      r.getDouble(3) shouldBe (std +- 1e-5)
      r.getDouble(4) shouldBe (xs.min +- 1e-6)
      r.getDouble(5) shouldBe (xs.max +- 1e-6)
    }
  }

  test("q157 temperature mix: sums to budget, quota holds, boosts low-resource langs") {
    val rows = graft.SparkEntry.queries("q157_temperature_mix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val counts = graft.Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = counts.values.sum / 2
    rows.map(_._3).sum shouldBe budget
    // Hamilton quota property against the sqrt-integer weights
    val wi = counts.map { case (l, c) => l -> math.floor(math.sqrt(c.toDouble) * 1e6).toLong }
    val sw = wi.values.sum
    rows.foreach { case (lang, cnt, alloc, epochs) =>
      cnt shouldBe counts(lang)
      val base = budget * wi(lang) / sw
      alloc should (be(base) or be(base + 1))
      epochs shouldBe (alloc.toDouble / cnt +- 1e-6)
    }
    // the temperature property: effective epochs never increase with size
    val byCnt = rows.sortBy(_._2)
    byCnt.zip(byCnt.tail).foreach { case (small, large) =>
      small._4 should be >= large._4 - 1e-9
    }
    rows.map(_._1).toSet shouldBe counts.keySet
  }

  test("q49 golden signatures: fixed token lists pin the hash function (r14 verdict ask #6)") {
    // q49 is the ONE declared query with no DuckDB oracle (xxhash64-
    // engine-specific values by design), so until this pin an expression
    // rewrite was checked only by an unchanged row count. These longs
    // were computed on the r14 tree and frozen; any rewrite of the
    // signature arithmetic (word split, distinct, vote, bit assembly)
    // that changes a single output bit fails here.
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "en"),  // multi-word vote
      (2L, "alpha alpha beta", "en"),  // duplicate word: array_distinct folds it
      (3L, "delta epsilon", "fr"),     // non-en: filtered out entirely
      (4L, "zeta", "en")               // single word: signature == its hash bits
    ).toDF("doc_id", "text", "lang")
    val got = Llm.simHashSignaturesOf(docs).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    got.map(_._1).toSeq shouldBe Seq(1L, 2L, 4L)
    // single-word signature bit b = 1 iff hash bit b = 1, i.e. the raw hash
    val zetaHash = docs.filter($"doc_id" === 4L)
      .select(org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.lit("zeta"))).head().getLong(0)
    got.toMap.apply(4L) shouldBe zetaHash
    // golden values (frozen):
    got.toMap.apply(1L) shouldBe GOLDEN_Q49_DOC1
    got.toMap.apply(2L) shouldBe GOLDEN_Q49_DOC2
  }
  private val GOLDEN_Q49_DOC1 = -8970745664593772831L
  private val GOLDEN_Q49_DOC2 = 36031307721027073L
}
