package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Unit coverage for the reusable distributed operators (as-of join,
  * connected components) on hand-built inputs where the expected output
  * is checkable by eye. */
class OperatorsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------ as-of join

  private def trades = Seq(
    // (trade_id, sym, t)
    (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 35L),
    (4L, "B", 15L), (5L, "C", 50L)
  ).toDF("trade_id", "sym", "t")

  private def quotes = Seq(
    // (qsym, qt, px, qid)
    ("A", 5L, 1.0, 100L), ("A", 20L, 2.0, 101L), ("A", 30L, 3.0, 102L),
    ("B", 99L, 9.0, 103L) // only AFTER B's trade
  ).toDF("qsym", "qt", "px", "qid")

  test("asof join: latest quote at-or-before each trade, per key") {
    val got = AsofJoin(trades, quotes, "sym", "qsym", "t", "qt",
        payload = Seq("px", "qid"), tieBreak = Seq("qid"))
      .orderBy("trade_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    got.toSeq shouldBe Seq(
      (1L, Some(1.0), Some(100L)), // t=10 → quote at 5
      (2L, Some(2.0), Some(101L)), // t=20 → quote AT 20 (inclusive)
      (3L, Some(3.0), Some(102L)), // t=35 → quote at 30
      (4L, None, None),            // B has no quote ≤ 15
      (5L, None, None))            // C has no quotes at all
  }

  test("asof join rejects payload/left name collisions and reserved __ columns") {
    // same column name on both sides would silently duplicate in the output
    an[IllegalArgumentException] should be thrownBy
      AsofJoin(trades, quotes.withColumnRenamed("px", "t"), "sym", "qsym", "t", "qt",
        payload = Seq("t"))
    an[IllegalArgumentException] should be thrownBy
      AsofJoin(trades.withColumnRenamed("trade_id", "__id"), quotes,
        "sym", "qsym", "t", "qt", payload = Seq("px"))
  }

  test("asof join: inclusive=false excludes the equal-ts right row") {
    val got = AsofJoin(trades, quotes, "sym", "qsym", "t", "qt",
        payload = Seq("qid"), tieBreak = Seq("qid"), inclusive = false)
      .orderBy("trade_id").collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Long]))
    // trade 2 at t=20 must now see the t=5 quote, not the t=20 one
    got(1) shouldBe Some(100L)
  }

  test("asof join: tie on right ts resolves to the greatest tieBreak, row-consistently") {
    val q2 = Seq(("A", 10L, 5.0, 200L), ("A", 10L, 6.0, 201L)).toDF("qsym", "qt", "px", "qid")
    val got = AsofJoin(Seq((1L, "A", 10L)).toDF("trade_id", "sym", "t"), q2,
        "sym", "qsym", "t", "qt", payload = Seq("px", "qid"), tieBreak = Seq("qid"))
      .collect()(0)
    // both payload fields come from the SAME winning row (qid 201)
    got.getLong(4) shouldBe 201L
    got.getDouble(3) shouldBe 6.0
  }

  test("asof join: composite keys match positionally") {
    val l = Seq((1L, "A", "x", 10L), (2L, "A", "y", 10L)).toDF("id", "k1", "k2", "t")
    val r = Seq(("A", "x", 5L, 7.0), ("A", "y", 5L, 8.0)).toDF("rk1", "rk2", "rt", "px")
    val got = AsofJoin(l, r, Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt",
        payload = Seq("px"), tieBreak = Nil, inclusive = true)
      .orderBy("id").collect().map(_.getDouble(4))
    got.toSeq shouldBe Seq(7.0, 8.0) // (A,x) and (A,y) resolve independently
  }

  // ------------------------------------- connected components / dedup groups

  /** localFinishEdges = 0 forces the distributed contraction rounds;
    * the default exercises the one-task union-find end-game. Both paths
    * must agree — the property test below runs every graph through both. */
  private def ccOf(pairs: Seq[(Long, Long)], localFinishEdges: Long = 1L << 20): Map[Long, Long] =
    ConnectedComponents(pairs.toDF("a", "b"), "a", "b", localFinishEdges = localFinishEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connected components: chain, pair, and triangle resolve to min labels") {
    // chain 1-2-3-4, pair 10-11, triangle 20-21-22 (with a redundant edge)
    val cc = ccOf(Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)))
    cc shouldBe Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
  }

  test("connected components: long path converges (diameter > a few rounds)") {
    val path = (0L until 40L).map(i => (i, i + 1))
    val cc = ccOf(path)
    cc.values.toSet shouldBe Set(0L)
    cc.size shouldBe 41
  }

  test("connected components: 1024-node monotone path stays within the log-round bound") {
    // monotone ids along a chain are the adversarial case for raw
    // min-contraction (O(1) progress per round); the hashed order must
    // keep convergence logarithmic — maxRounds=20 would fail a linear
    // or sqrt-ish algorithm loudly via the convergence require()
    val path = (0L until 1023L).map(i => (i, i + 1))
    // localFinishEdges = 0: this test pins the DISTRIBUTED rounds' bound
    val labels = ConnectedComponents(path.toDF("a", "b"), "a", "b", maxRounds = 20,
      localFinishEdges = 0L)
    labels.agg(countDistinct(col("label"))).collect()(0).getLong(0) shouldBe 1L
    labels.agg(min(col("label")), max(col("label"))).collect()(0) match {
      case r => r.getLong(0) shouldBe 0L; r.getLong(1) shouldBe 0L
    }
  }

  test("connected components: two shuffled-id components resolve to their true minima") {
    val rnd = new scala.util.Random(7)
    // two parallel chains over a shuffled id space — component membership
    // must follow EDGES, not id locality, and labels must be the true
    // per-component minimum original id
    val ids = rnd.shuffle((0L until 400L).toVector)
    val (compA, compB) = ids.splitAt(200)
    val edges = compA.sliding(2).map(p => (p(0), p(1))).toSeq ++
      compB.sliding(2).map(p => (p(0), p(1))).toSeq
    val cc = ccOf(edges)
    cc.filter { case (id, _) => compA.contains(id) }.values.toSet shouldBe Set(compA.min)
    cc.filter { case (id, _) => compB.contains(id) }.values.toSet shouldBe Set(compB.min)
  }

  test("connected components is idempotent: relabeling the labeling changes nothing") {
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L))
    val cc = ccOf(pairs)
    // feed (id, label) back in as edges: same partition must come out
    val again = ccOf(cc.toSeq)
    again shouldBe cc
  }

  test("connected components: a node appearing only in a self-pair is still labeled") {
    val cc = ccOf(Seq((5L, 5L), (1L, 2L)))
    cc shouldBe Map(5L -> 5L, 1L -> 1L, 2L -> 1L)
  }

  test("connected components: empty input yields empty output") {
    ccOf(Seq.empty) shouldBe Map.empty
  }

  test("Dedup.keepSurvivors keeps the min id per cluster and every unpaired row") {
    val docs = (1L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val kept = Dedup.keepSurvivors(docs, "doc_id", pairs, "doc_a", "doc_b")
      .orderBy("doc_id").collect().map(_.getLong(0))
    // cluster {1,2,3} -> keep 1; {5,6} -> keep 5; 4 untouched
    kept.toSeq shouldBe Seq(1L, 4L, 5L)
  }

  test("property: connected components match a reference union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val n = 30
      val pairs = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      // reference: plain union-find with path compression
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expected = nodes.map { id =>
        // component min among nodes that actually appear in pairs
        val root = find(id.toInt)
        id -> nodes.filter(x => find(x.toInt) == root).min
      }.toMap
      ccOf(pairs) shouldBe expected                        // local union-find end-game
      ccOf(pairs, localFinishEdges = 0L) shouldBe expected // distributed rounds only
    }
  }

  test("property: asof join matches brute force on random trades/quotes") {
    val rnd = new scala.util.Random(7)
    val quotes = Seq.fill(40)((s"k${rnd.nextInt(4)}", rnd.nextInt(60).toLong,
      rnd.nextInt(1000) / 10.0, rnd.nextLong(100000).abs))
    val trades = Seq.tabulate(25)(i => (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(60).toLong))
    val got = AsofJoin(trades.toDF("trade_id", "sym", "t"),
        quotes.toDF("qsym", "qt", "px", "qid"),
        "sym", "qsym", "t", "qt", payload = Seq("px", "qid"), tieBreak = Seq("qid"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
    trades.foreach { case (id, sym, t) =>
      val best = quotes.filter(q => q._1 == sym && q._2 <= t)
        .sortBy(q => (q._2, q._4)).lastOption
      got(id) shouldBe ((best.map(_._3), best.map(_._4)))
    }
  }

  // ------------------------------------------------------------- skew salt

  test("MergeInto: all verb x match combinations, multi-column payload with nulls, composite key") {
    val base = Seq(
      (1L, "a", Some(10.0)), // untouched        -> keep
      (2L, "a", Some(20.0)), // matched U        -> update
      (3L, "b", None),       // matched D        -> dropped
      (4L, "b", Some(40.0))  // matched I        -> update (I on match = upsert)
    ).toDF("k", "part", "v")
    val cdc = Seq(
      (2L, "a", "U", Some(21.0)),
      (3L, "b", "D", None),
      (4L, "b", "I", Some(41.0)),
      (5L, "c", "U", None),        // unmatched U -> insert (with null payload)
      (6L, "c", "D", Some(60.0))   // unmatched D -> no-op
    ).toDF("k", "part", "op", "v")
    val got = MergeInto(base, cdc, Seq("k", "part"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getString(3)))
    got.toSeq shouldBe Seq(
      (1L, "a", Some(10.0), "keep"),
      (2L, "a", Some(21.0), "update"),
      (4L, "b", Some(41.0), "update"),
      (5L, "c", None, "insert"))
  }

  test("salted aggregation equals the direct groupBy, including on a hot key") {
    // key "hot" has 50× the rows of the others
    val rows = (1 to 5000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toDouble))
    val df = rows.toDF("k", "v")
    val salted = SkewSalt.countSum(df, Seq("k"), "v", salts = 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(28,4)")).cast("double").as("total"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    salted.toSeq shouldBe direct.toSeq
  }

  test("salting actually fans the hot key out across salt subkeys") {
    val df = (1 to 5000).map(i => ("hot", i.toDouble)).toDF("k", "v")
    val salted = df.withColumn("__salt",
      pmod(hash(col("k"), col("v")), lit(8)))
    salted.select("__salt").distinct().count() shouldBe 8
  }
}
