package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dsl._

/** Non-equi, as-of, interval and star joins (SURVEY.md §2.3 J8–J11). */
object AdvancedJoins extends QueryModule {

  /** J8: time-range self-join, banded. A naive theta join on
    * (user, tsb > tsa, tsb ≤ tsa+5min) degenerates to a per-user nested
    * loop; instead each left row probes exactly two 5-minute buckets, so
    * the join is EQUI on (user_id, bucket) — shuffle-partitionable and
    * linear at 100 TB. The oracle states the same semantics as a theta
    * join (fine at oracle scale).
    */
  val rangeJoinBanded: Q = Q(
    """SELECT a.user_id, COUNT(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND epoch_us(b.ts) > epoch_us(a.ts)
      | AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin) { (s, d) =>
    val ev = events(s, d).select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val left = ev
      .withColumn("bucket", explode(array(floor(col("us") / 300000000L),
        floor(col("us") / 300000000L) + 1)))
      .select(col("user_id"), col("us").as("a_us"), col("bucket"))
    val right = ev
      .select(col("user_id").as("b_user"), col("us").as("b_us"),
        floor(col("us") / 300000000L).as("b_bucket"))
    left.join(right,
        col("user_id") === col("b_user") && col("bucket") === col("b_bucket")
          && col("b_us") > col("a_us") && col("b_us") <= col("a_us") + 300000000L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  /** J9: as-of join — for every purchase, the most recent preceding click
    * of the same user. Formulated as a running MAX over the merged event
    * stream (ts is monotone, so MAX(click ts so far) IS the as-of match);
    * one shuffle by user, no self-join at all — the classic
    * union-then-window as-of trick.
    */
  val asofJoin: Q = Q(
    """SELECT * FROM (
      |  SELECT event_id, user_id, ts,
      |    MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_ts,
      |    event_type
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |) WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        max(when(col("event_type") === "click", col("ts"))).over(w).as("prev_click_ts"),
        col("event_type"))
      .filter(col("event_type") === "purchase")
      .orderBy("event_id")
  }

  /** J10: interval-overlap join — per-user daily activity spans, then
    * pairs of distinct users whose spans overlap that day.
    *
    * Scale shape: one side explodes each span into the 2-hour buckets it
    * covers; the other is keyed by its START bucket only. Two
    * overlapping spans always share the start bucket of the
    * later-starting one (a common instant exists at max(s1,s2)), so the
    * join is EQUI on the bucket, a key's candidate space is "users
    * active in the same 2-hour window" — not the per-day O(users²)
    * fanout of a naive day key — and each pair matches in EXACTLY one
    * bucket (canonical orientation: earlier start, user id on ties), so
    * no dedup pass is needed. The overlap predicate re-checks exactly;
    * the oracle states the plain theta-join semantics (fine at oracle
    * scale).
    */
  val intervalOverlap: Q = Q(
    """WITH spans AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         MIN(ts) AS s, MAX(ts) AS e
      |  FROM events GROUP BY 1, 2)
      |SELECT a.day AS day, COUNT(*) AS n_overlaps
      |FROM spans a JOIN spans b
      |  ON a.day = b.day AND a.user_id < b.user_id
      | AND a.s < b.e AND b.s < a.e
      |GROUP BY a.day ORDER BY day""".stripMargin) { (s, d) =>
    val bucketUs = 7200L * 1000000L // 2-hour bands (divides a day evenly)
    val spans = events(s, d)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(min("ts").as("s"), max("ts").as("e"))
      .withColumn("sb", expr(s"unix_micros(s) DIV $bucketUs"))
      .withColumn("eb", expr(s"unix_micros(e) DIV $bucketUs"))
    val a = spans.select(col("user_id").as("u1"), col("day"), col("sb").as("sb1"),
        col("s").as("s1"), col("e").as("e1"),
        explode(sequence(col("sb"), col("eb"))).as("bucket"))
    val b = spans.select(col("user_id").as("u2"), col("sb").as("sb2"),
        col("s").as("s2"), col("e").as("e2"))
    a.join(b, col("bucket") === col("sb2")
        && (col("sb1") < col("sb2") ||
            (col("sb1") === col("sb2") && col("u1") < col("u2")))
        && col("u1") =!= col("u2")
        && col("s1") < col("e2") && col("s2") < col("e1"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_overlaps"))
      .orderBy("day")
  }

  /** J9 as a REUSABLE operator: [[graft.operators.AsofJoin]] (union +
    * running last-non-null, no join) applied to two distinct inputs —
    * purchases pick up the latest preceding-or-simultaneous click of the
    * same user, with the click's id and timestamp attached as a
    * row-consistent payload (tie on click ts broken by highest id). */
  val asofGeneric: Q = Q(
    """WITH clicks AS (
      |  SELECT user_id, ts AS click_ts, event_id AS click_id
      |  FROM events WHERE event_type = 'click'),
      |purch AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.ts,
      |  (max({'t': c.click_ts, 'i': c.click_id})).t AS click_ts,
      |  (max({'t': c.click_ts, 'i': c.click_id})).i AS click_id
      |FROM purch p LEFT JOIN clicks c
      |  ON c.user_id = p.user_id AND c.click_ts <= p.ts
      |GROUP BY p.event_id, p.user_id, p.ts
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.AsofJoin(purchases, clicks,
        leftKey = "user_id", rightKey = "c_user",
        leftTs = "ts", rightTs = "click_ts",
        payload = Seq("click_ts", "click_id"), tieBreak = Seq("click_id"))
      .orderBy("event_id")
  }

  /** J11: multi-way star join (TPC-H Q5 shape) — revenue by nation for one
    * region and a two-year order window. Fact tables join SMJ on their
    * keys; `nation`/`region`/`supplier` are bounded dims → broadcast.
    * `customer` scales with the fact data → NOT broadcast (at SF100 it is
    * tens of GB).
    */
  val starJoin: Q = Q(
    s"""SELECT n_name, $sqlRevenueA AS revenue, COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation   ON s_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate <  TIMESTAMP '1998-01-01'
       |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    val ext  = col("l_extendedprice").cast("decimal(12,2)")
    val disc = col("l_discount").cast("decimal(4,2)")
    lineitem(s, d)
      .join(orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(sum(ext * (lit(1).cast("decimal(4,2)") - disc)).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  private def sqlRevenueA =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"

  /** J8-auto: the same class of range join as q36, but written as the
    * NAIVE θ-join and rewritten to the banded equi-join by the
    * [[graft.plans.BandedRangeJoin]] optimizer rule — the user states
    * intent, the engine supplies the scale shape (Spark alone would plan
    * a nested loop here: no equality conjunct exists). Customers matched
    * to suppliers whose account balance is within ±500.00: acctbals are
    * floor-scaled to integer cents (floor(x*100) is bit-identical in
    * both engines; a raw long CAST would round half-even in DuckDB but
    * truncate in Spark). The rule is installed at runtime through
    * `spark.experimental.extraOptimizations` — the official hook for
    * adding optimizer rules to a LIVE session (Verify/Bench build plain
    * sessions); `withExtensions(new GraftExtensions)` is the
    * session-construction equivalent. The binSize conf must be LIVE at
    * action time (the optimizer reads it when the query executes, not
    * when this builder runs), so the builder cannot restore it itself;
    * Verify and Bench wrap every query in [[graft.GraftConf.scoped]],
    * which reverts all `spark.graft.*` keys after the action — no other
    * query's plan sees the setting. Library callers doing the same
    * should use that scope (the rule is result-identical regardless —
    * wide/NULL intervals fall back to the θ-join branch — but an
    * unscoped conf silently changes plans of later pure-range joins).
    * PlanSpec asserts the rewrite actually replaces the nested loop,
    * and restores the conf to unset. */
  val rangeJoinAuto: Q = Q(
    """SELECT c_custkey, s_suppkey
      |FROM
      | (SELECT c_custkey, CAST(floor(c_acctbal*100) AS BIGINT) AS p FROM customer) c,
      | (SELECT s_suppkey, CAST(floor(s_acctbal*100) AS BIGINT)-50000 AS lo,
      |         CAST(floor(s_acctbal*100) AS BIGINT)+50000 AS hi FROM supplier) s
      |WHERE c.p >= s.lo AND c.p <= s.hi
      |ORDER BY c_custkey, s_suppkey""".stripMargin) { (s, d) =>
    graft.plans.BandedRangeJoin.install(s)
    s.conf.set("spark.graft.rangeJoin.binSize", "100000") // = 2× half-width
    val c = customer(s, d).select(col("c_custkey"),
      floor(col("c_acctbal") * 100).cast("long").as("p"))
    val sup = supplier(s, d).select(col("s_suppkey"),
      (floor(col("s_acctbal") * 100).cast("long") - 50000).as("lo"),
      (floor(col("s_acctbal") * 100).cast("long") + 50000).as("hi"))
    c.join(sup, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("c_custkey", "s_suppkey")
      .orderBy("c_custkey", "s_suppkey")
  }

  override def queries: Seq[(String, Q)] = Seq(
    "q36_range_join"       -> rangeJoinBanded,
    "q37_asof_join"        -> asofJoin,
    "q38_interval_overlap" -> intervalOverlap,
    "q39_star_join"        -> starJoin,
    "q79_asof_generic"     -> asofGeneric,
    "q125_range_join_auto" -> rangeJoinAuto
  )
}
