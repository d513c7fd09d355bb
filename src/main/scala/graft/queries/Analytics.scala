package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dsl._

/** Warehouse-analytics operators beyond the core relational set: funnel
  * analysis, Markov transitions, SCD2 interval construction, fixed-width
  * histograms, unpivot/melt, a data-quality audit, and blocked fuzzy
  * (edit-distance) record linkage.
  *
  * Scale notes per query are inline; the common theme is that every
  * pairwise or per-entity computation is keyed by a bounded blocking key
  * (user_id, (brand, size) block, bin id) so the shuffle is an equi-key
  * exchange, never an unpartitioned product.
  */
object Analytics extends QueryModule {

  /** Blocked fuzzy join (record linkage): candidate pairs come from an
    * equi-join on the (p_brand, p_size) blocking key, then the
    * edit-distance predicate filters within blocks. The quadratic term is
    * bounded by the largest block (≤7 parts on the fixture; blocking keys
    * at 100 TB are chosen exactly so this stays O(block²·n_blocks), never
    * O(n²)). levenshtein() is codegen'd in Spark and built in to DuckDB
    * with identical unit-cost semantics. */
  /** The blocked candidate-pair relation shared by q101 (graded pairs)
    * and q167 (transitive entity clusters) — ONE definition of the edge
    * set, so the cluster query's components are exactly the pair
    * query's edges (the q80/q110 shared-builder discipline). */
  private val sqlFuzzyPairs =
    """fp AS (
      |  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
      |    a.p_name AS name_a, b.p_name AS name_b,
      |    levenshtein(a.p_name, b.p_name) AS dist
      |  FROM part a JOIN part b
      |    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
      |   AND a.p_partkey < b.p_partkey
      |  WHERE levenshtein(a.p_name, b.p_name) <= 5)""".stripMargin

  private def fuzzyPairs(s: org.apache.spark.sql.SparkSession, d: String) = {
    // CPU fan-out on the STREAM side (Tables.wide): the per-pair
    // levenshtein runs in the probe stage of the broadcast join, which
    // otherwise inherits the single-split part scan's one task
    val a = graft.Tables.wide(s, part(s, d))
      .select(col("p_partkey").as("key_a"), col("p_name").as("name_a"),
      col("p_brand"), col("p_size"))
    val b = part(s, d).select(col("p_partkey").as("key_b"), col("p_name").as("name_b"),
      col("p_brand").as("brand_b"), col("p_size").as("size_b"))
    a.join(b, col("p_brand") === col("brand_b") && col("p_size") === col("size_b") &&
        col("key_a") < col("key_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 5)
      .select("key_a", "key_b", "name_a", "name_b", "dist")
  }

  val fuzzyJoin: Q = Q(
    s"""WITH $sqlFuzzyPairs
       |SELECT key_a, key_b, name_a, name_b, dist FROM fp
       |ORDER BY key_a, key_b""".stripMargin) { (s, d) =>
    fuzzyPairs(s, d).orderBy("key_a", "key_b")
  }

  /** ENTITY RESOLUTION: the q101 fuzzy matches resolved to transitive
    * entities — if A≈B and B≈C, all three are one entity even when A
    * and C are not a direct match. Same distributed connected-components
    * machinery as the text dedup family (q78), applied to record
    * linkage; the entity id is the cluster's minimum part key. Scale
    * inherits from both halves: pair generation is bounded by the
    * blocking key, CC shuffles a geometrically contracting edge list.
    * cluster_size rides a window partitioned by entity (bounded by
    * entity size). */
  val entityClusters: Q = Q(
    s"""WITH RECURSIVE $sqlFuzzyPairs,
       |edges AS (
       |  SELECT key_a AS src, key_b AS dst FROM fp
       |  UNION SELECT key_b, key_a FROM fp),
       |reach(id, label) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
       |cl AS (SELECT id, MIN(label) AS entity_id FROM reach GROUP BY id)
       |SELECT id AS p_partkey, entity_id,
       |  COUNT(*) OVER (PARTITION BY entity_id) AS entity_size
       |FROM cl ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val cl = graft.operators.ConnectedComponents(
        fuzzyPairs(s, d).select("key_a", "key_b"), "key_a", "key_b")
      .select(col("id"), col("label").as("entity_id"))
    cl.select(col("id").as("p_partkey"), col("entity_id"),
        count(lit(1)).over(Window.partitionBy("entity_id")).as("entity_size"))
      .orderBy("p_partkey")
  }

  /** Unpivot/melt: wide numeric measures to (key, measure, value) long
    * form — the standard reshape before per-measure profiling. Narrow
    * per-row map, no shuffle until the final order. */
  val unpivot: Q = Q(
    """SELECT l_orderkey, l_linenumber, measure, value FROM (
      |  SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem)
      |WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_orderkey") < 100)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity").as("quantity"), col("l_discount").as("discount"),
          col("l_tax").as("tax")),
        "measure", "value")
      .orderBy("l_orderkey", "l_linenumber", "measure")
  }

  /** Fixed-width histogram: bin id is pure per-row arithmetic, then one
    * partial+final aggregate over ≤10 keys — the cheapest possible
    * distribution profile at any scale (single scan, map-side combine,
    * 10-row exchange). */
  val histogram: Q = Q(
    s"""SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9) AS INT) AS bin,
       |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
       |FROM orders GROUP BY bin ORDER BY bin""".stripMargin) { (s, d) =>
    orders(s, d)
      .groupBy(least(floor(col("o_totalprice") / 50000.0), lit(9)).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("bin")
  }

  /** Data-quality audit: one scan, one aggregate row, unpivoted to
    * (metric, value) — row count, key uniqueness, null counts, domain
    * cardinality, out-of-range counts. The entire audit is a single
    * map-side-combined pass regardless of table size. */
  val qualityAudit: Q = Q(
    """WITH a AS (SELECT
      |    COUNT(*) AS n_rows,
      |    COUNT(DISTINCT o_orderkey) AS n_distinct_key,
      |    COUNT(*) - COUNT(o_custkey) AS n_null_custkey,
      |    COUNT(DISTINCT o_orderstatus) AS n_status_values,
      |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonpos_price,
      |    CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_date_low
      |  FROM orders)
      |SELECT metric, value FROM (
      |  SELECT 'n_rows' AS metric, n_rows AS value FROM a
      |  UNION ALL SELECT 'n_dup_key', n_rows - n_distinct_key FROM a
      |  UNION ALL SELECT 'n_null_custkey', n_null_custkey FROM a
      |  UNION ALL SELECT 'n_status_values', n_status_values FROM a
      |  UNION ALL SELECT 'n_nonpos_price', n_nonpos_price FROM a
      |  UNION ALL SELECT 'n_date_low', n_date_low FROM a)
      |ORDER BY metric""".stripMargin) { (s, d) =>
    val a = graft.Tables.wide(s, orders(s, d)).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("o_orderkey")).as("n_distinct_key"),
      (count(lit(1)) - count(col("o_custkey"))).as("n_null_custkey"),
      countDistinct(col("o_orderstatus")).as("n_status_values"),
      sum(when(col("o_totalprice") <= 0, 1).otherwise(0)).as("n_nonpos_price"),
      sum(when(col("o_orderdate") < lit("1995-01-01").cast("timestamp"), 1).otherwise(0))
        .as("n_date_low"))
    a.select(expr(
      """stack(6,
        |  'n_rows', n_rows,
        |  'n_dup_key', n_rows - n_distinct_key,
        |  'n_null_custkey', n_null_custkey,
        |  'n_status_values', n_status_values,
        |  'n_nonpos_price', n_nonpos_price,
        |  'n_date_low', n_date_low) AS (metric, value)""".stripMargin))
      .orderBy("metric")
  }

  /** Funnel analysis (view → click → purchase, strictly ordered in time):
    * each stage is a per-user MIN over the previous stage's anchor — one
    * groupBy plus one equi-join per stage, all keyed by user_id, so every
    * exchange is the same bounded-key hash partition (and reusable).
    * Never a window over the whole event stream. */
  val funnel: Q = Q(
    """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |      JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      |      WHERE e.event_type = 'click' GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      |      JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT stage, step, users FROM (
      |  SELECT 1 AS stage, 'view' AS step, COUNT(*) AS users FROM v
      |  UNION ALL SELECT 2, 'click', COUNT(*) FROM c
      |  UNION ALL SELECT 3, 'purchase', COUNT(*) FROM p)
      |ORDER BY stage""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = ev.filter(col("event_type") === "click").as("e")
      .join(v.as("v"), col("e.user_id") === col("v.user_id") && col("e.ts") > col("t1"))
      .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase").as("e")
      .join(c.as("c"), col("e.user_id") === col("c.user_id") && col("e.ts") > col("t2"))
      .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t3"))
    val one = (df: org.apache.spark.sql.DataFrame, stage: Int, step: String) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(stage).as("stage"), lit(step).as("step"), col("users"))
    one(v, 1, "view").unionAll(one(c, 2, "click")).unionAll(one(p, 3, "purchase"))
      .orderBy("stage")
  }

  /** Markov transition counts: (event_type → next event_type) per user
    * timeline. One window keyed by user_id (bounded partitions), then a
    * 25-key aggregate — the standard clickstream transition matrix. */
  val transitions: Q = Q(
    """SELECT cur, nxt, COUNT(*) AS n FROM (
      |  SELECT event_type AS cur,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      |  FROM events)
      |WHERE nxt IS NOT NULL
      |GROUP BY cur, nxt ORDER BY cur, nxt""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .select(col("event_type").as("cur"), lead("event_type", 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
      .orderBy("cur", "nxt")
  }

  /** SCD2 interval construction: per-user purchase `value` history
    * compressed to change rows with [valid_from, valid_to) validity —
    * lag to detect changes, lead to close intervals. Both windows share
    * one user_id partition; the open interval (valid_to NULL) is the
    * current row, exactly the warehouse SCD2 load shape. */
  val scd2Intervals: Q = Q(
    """WITH h AS (
      |  SELECT user_id, ts, event_id, value,
      |    LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events WHERE event_type = 'purchase' AND user_id < 20)
      |SELECT user_id, event_id, ts AS valid_from,
      |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  value
      |FROM h WHERE prev IS NULL OR prev <> value
      |ORDER BY user_id, valid_from, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val h = events(s, d)
      .filter(col("event_type") === "purchase" && col("user_id") < 20)
      .withColumn("prev", lag("value", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("value"))
    h.select(col("user_id"), col("event_id"), col("ts").as("valid_from"),
        lead("ts", 1).over(w).as("valid_to"), col("value"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  /** Winsorization: clip a value column at its global p01/p99 — the
    * standard outlier treatment before training on numeric features.
    * Scale shape: the two percentiles are ONE 1-row aggregate broadcast
    * into the scan-side projection (no sort of the data, no second
    * shuffle); the clip itself folds into codegen. Exact interpolated
    * percentiles (q32 established Spark percentile == DuckDB
    * quantile_cont on this data); clipped sums decimal-accumulate. */
  val winsorize: Q = Q(
    s"""WITH p AS (SELECT quantile_cont(o_totalprice, 0.01) AS lo,
       |                 quantile_cont(o_totalprice, 0.99) AS hi FROM orders)
       |SELECT o_orderpriority,
       |  COUNT(*) AS n,
       |  CAST(SUM(CASE WHEN o_totalprice < lo OR o_totalprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
       |  CAST(SUM(CAST(ROUND(CASE WHEN o_totalprice < lo THEN lo
       |       WHEN o_totalprice > hi THEN hi ELSE o_totalprice END, 2) AS DECIMAL(28,4))) AS DOUBLE) AS total_winsorized
       |FROM orders CROSS JOIN p
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val o = orders(s, d)
    val p = o.agg(
      percentile(col("o_totalprice"), lit(0.01)).as("lo"),
      percentile(col("o_totalprice"), lit(0.99)).as("hi"))
    val clipped = when(col("o_totalprice") < col("lo"), col("lo"))
      .when(col("o_totalprice") > col("hi"), col("hi"))
      .otherwise(col("o_totalprice"))
    o.crossJoin(broadcast(p))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_totalprice") < col("lo") || col("o_totalprice") > col("hi"), 1L)
          .otherwise(0L)).as("n_clipped"),
        sum(round(clipped, 2).cast("decimal(28,4)")).cast("double").as("total_winsorized"))
      .orderBy("o_orderpriority")
  }

  /** Time-weighted average (irregular time series): each observation is
    * weighted by how long it remained current (gap to the next event of
    * the same user) — the correct mean for unevenly-sampled signals,
    * where the arithmetic mean over-weights bursts. One window (lead)
    * partitioned by user supplies the holding time; rows with no
    * successor take zero weight, matching the oracle's lead() NULL
    * handling. Each PRODUCT is computed in DECIMAL(38,0) — one operand
    * is widened BEFORE the multiply, because an Int64 product wraps
    * already at ~1-day gaps × 5-figure values (3.6e9 ms × 1e11 micro ≈
    * 4e20 > 2^63), and it wraps SILENTLY in Spark while DuckDB errors:
    * the product, not just the accumulator, is where the engines first
    * diverge. The per-user SUM also accumulates in DECIMAL(38,0) (the
    * repo's dsum discipline). The final division is the only rounding
    * step. */
  val timeWeighted: Q = Q(
    """WITH t AS (SELECT user_id, value,
      |    CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      - ts) AS BIGINT) // 1000 AS dur_ms,
      |    CAST(ROUND(value * 1000000) AS BIGINT) AS v_micro
      |  FROM events)
      |SELECT user_id,
      |  CAST(SUM(CASE WHEN dur_ms IS NULL THEN 0 ELSE dur_ms END) AS BIGINT) AS held_ms,
      |  ROUND(CAST(SUM(CASE WHEN dur_ms IS NULL THEN CAST(0 AS DECIMAL(38,0))
      |      ELSE CAST(dur_ms AS DECIMAL(19,0)) * CAST(v_micro AS DECIMAL(19,0)) END) AS DOUBLE)
      |    / (1000000.0 * SUM(CASE WHEN dur_ms IS NULL THEN 0 ELSE dur_ms END)), 6) AS twa
      |FROM t GROUP BY user_id
      |HAVING SUM(CASE WHEN dur_ms IS NULL THEN 0 ELSE dur_ms END) > 0
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val t = events(s, d).select(col("user_id"), col("value"),
        expr("(unix_micros(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))" +
          " - unix_micros(ts)) DIV 1000").as("dur_ms"),
        round(col("value") * 1000000).cast("long").as("v_micro"))
    t.groupBy("user_id")
      .agg(sum(coalesce(col("dur_ms"), lit(0L))).as("held_ms"),
        round(
          // widen BEFORE the multiply: 19+19 digits -> decimal(38,0)
          // product in both engines; an Int64 product wraps silently
          sum(coalesce(
              col("dur_ms").cast("decimal(19,0)") * col("v_micro").cast("decimal(19,0)"),
              lit(0L).cast("decimal(38,0)")))
            .cast("double") /
            (lit(1000000.0) * sum(coalesce(col("dur_ms"), lit(0L)))), 6).as("twa"))
      .filter(col("held_ms") > 0)
      .orderBy("user_id")
  }

  /** Robust per-group outlier detection via median/MAD — the screen that
    * survives the outliers it is hunting (mean/stddev get dragged by the
    * very tail they should flag). Three passes over events, but the
    * per-group statistics are TINY (one row per event_type): each pass
    * is a grouped aggregate whose result broadcasts back into the next
    * scan-side projection — no row-level shuffle beyond the aggregates
    * themselves, no sort of the data. The outlier test compares the
    * UN-rounded med/mad (identical interpolation arithmetic in both
    * engines, the q111/q32 precedent); rounding happens only on the
    * emitted columns. At 100 TB the exact medians become one
    * approx_percentile pass (q116's sketch) and the shape is unchanged. */
  val madOutliers: Q = Q(
    """WITH med AS (SELECT event_type, median(value) AS med
      |             FROM events GROUP BY event_type),
      |mad AS (SELECT e.event_type, median(abs(e.value - m.med)) AS mad
      |        FROM events e JOIN med m USING (event_type) GROUP BY e.event_type)
      |SELECT e.event_type, COUNT(*) AS n,
      |  ROUND(m.med, 6) AS med, ROUND(a.mad, 6) AS mad,
      |  CAST(SUM(CASE WHEN abs(e.value - m.med) > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM events e JOIN med m USING (event_type) JOIN mad a USING (event_type)
      |GROUP BY e.event_type, m.med, a.mad
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val ev = events(s, d).select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val mad = ev.join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(percentile(abs(col("value") - col("med")), lit(0.5)).as("mad"))
    ev.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("value") - col("med")) > lit(3) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        col("n_outliers"))
      .orderBy("event_type")
  }

  /** Multi-touch ATTRIBUTION — every click within the 6 h before a
    * purchase by the same user shares the credit equally (1/n per
    * touch). Join key is (user_id, 6 h time bucket) — the q38 banding
    * discipline: a click ≤6 h before a purchase lives in the purchase's
    * bucket or the one before, so the purchase side EXPLODES to those
    * two probe buckets and the join is pure equi. A power user's fanout
    * is bounded by clicks-per-6 h × purchases-per-6 h, not by the
    * product of lifetime totals — the difference between linear and
    * quadratic on the users that matter. A (purchase, click) pair
    * matches exactly one probe (the click's bucket), so no dedup step.
    * The streaming twin is the ST7 stream-stream interval join
    * (StreamingSpec): same condition, watermark-bounded state. gap_ms
    * and the credit denominator are exact integer arithmetic
    * (unix_micros), so the oracle is exact. */
  val attribution: Q = Q(
    """WITH pairs AS (
      |  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |    CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) // 1000 AS gap_ms
      |  FROM events p JOIN events c
      |    ON p.user_id = c.user_id
      |   AND p.event_type = 'purchase' AND c.event_type = 'click'
      |   AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 6 HOUR)
      |SELECT purchase_id, click_id, gap_ms,
      |  ROUND(1.0 / COUNT(*) OVER (PARTITION BY purchase_id), 6) AS credit
      |FROM pairs ORDER BY purchase_id, click_id""".stripMargin) { (s, d) =>
    val BucketUs = 6L * 3600 * 1000000 // 6 h in microseconds
    val ev = events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"),
        explode(array(lit(0L), lit(1L))).as("back"))
      .withColumn("bucket", expr(s"unix_micros(pts) DIV $BucketUs") - col("back"))
      .drop("back")
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"),
        expr(s"unix_micros(cts) DIV $BucketUs").as("bucket"))
    val w = Window.partitionBy("purchase_id")
    p.join(c, Seq("user_id", "bucket"))
      .filter(col("cts") <= col("pts") &&
        col("cts") > col("pts") - expr("INTERVAL 6 HOURS"))
      .select(col("purchase_id"), col("click_id"),
        expr("(unix_micros(pts) - unix_micros(cts)) DIV 1000").as("gap_ms"))
      .withColumn("credit", round(lit(1.0) / count(lit(1)).over(w), 6))
      .orderBy("purchase_id", "click_id")
  }

  /** Population Stability Index — the standard distribution-drift gate
    * between a reference corpus slice and a candidate slice (here: even
    * vs odd event_id halves over fixed 50-wide value bins, capped at bin
    * 9). A retraining pipeline runs exactly this before accepting a new
    * data drop; PSI > 0.2 is the conventional "distribution moved" alarm.
    *
    * Laplace-smoothed (+0.5 per bin, +5.0 per side) so an empty bin on
    * one side contributes a finite term instead of ±∞ — and the smoothing
    * arithmetic is written with IDENTICAL shape on both engines. Scale
    * shape: one pass bins the fan-in (conditional COUNT per bin — a
    * 10-row aggregate), the side totals are a 1-row broadcast, and the
    * per-bin PSI terms are ROUND 9 then DECIMAL-summed into the total, so
    * the drift score is bit-stable at any partitioning. */
  val psiDrift: Q = Q(
    """WITH binned AS (SELECT CAST(LEAST(9, FLOOR(value / 50)) AS INT) AS bin,
      |    CASE WHEN event_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS side FROM events),
      |cnts AS (SELECT bin,
      |    COUNT(*) FILTER (WHERE side = 'ref') AS c_ref,
      |    COUNT(*) FILTER (WHERE side = 'cur') AS c_cur
      |  FROM binned GROUP BY bin),
      |tot AS (SELECT SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur FROM cnts),
      |terms AS (SELECT bin, c_ref, c_cur,
      |    ROUND(((c_cur + 0.5) / (n_cur + 5.0) - (c_ref + 0.5) / (n_ref + 5.0))
      |      * ln(((c_cur + 0.5) / (n_cur + 5.0)) / ((c_ref + 0.5) / (n_ref + 5.0))), 9)
      |      AS psi_term
      |  FROM cnts CROSS JOIN tot),
      |total AS (SELECT ROUND(CAST(SUM(CAST(psi_term AS DECIMAL(28,9))) AS DOUBLE), 6)
      |            AS psi_total FROM terms)
      |SELECT bin, c_ref, c_cur, psi_term, psi_total
      |FROM terms CROSS JOIN total ORDER BY bin""".stripMargin) { (s, d) =>
    val binned = events(s, d).select(
      least(lit(9), floor(col("value") / 50)).cast("int").as("bin"),
      when(col("event_id") % 2 === 0, lit("ref")).otherwise(lit("cur")).as("side"))
    val cnts = binned.groupBy("bin").agg(
      count(when(col("side") === "ref", 1)).as("c_ref"),
      count(when(col("side") === "cur", 1)).as("c_cur"))
    val tot = cnts.agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"))
    val pCur = (col("c_cur") + 0.5) / (col("n_cur") + 5.0)
    val pRef = (col("c_ref") + 0.5) / (col("n_ref") + 5.0)
    val terms = cnts.crossJoin(broadcast(tot))
      .select(col("bin"), col("c_ref"), col("c_cur"),
        round((pCur - pRef) * log(pCur / pRef), 9).as("psi_term"))
    val total = terms.agg(
      round(sum(col("psi_term").cast("decimal(28,9)")).cast("double"), 6).as("psi_total"))
    terms.crossJoin(broadcast(total)).orderBy("bin")
  }

  /** Triangle counting over the co-purchase graph with DEGREE-ORDERED
    * edge orientation — the standard trick that makes distributed
    * triangle enumeration data-bound: orienting every edge from its
    * lower-(degree, id) endpoint to the higher one bounds each node's
    * out-degree by O(√m), so the wedge join generates O(m^1.5) candidate
    * wedges worst-case instead of Σ deg² (a single celebrity node never
    * explodes). Pipeline: distinct (order, part) pairs → in-order pair
    * generation (per-key fanout bounded by order size, ≤7 on TPC-H-ish
    * data — an equi-key exchange, never a self-cross) → weight filter
    * w ≥ 2 (co-purchased at least twice) → degree table (small: one row
    * per surviving node, broadcast into the orientation) → wedge join on
    * the oriented edges → closing-edge semi-check. Every triangle is
    * counted exactly once (its unique lowest-(deg,id) apex emits the
    * wedge). The (deg, id) tie-break total-orders nodes identically in
    * both engines via native struct/row comparison. */
  val triangleCount: Q = Q(
    """WITH pr AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e AS (SELECT a.p AS u, b.p AS v, COUNT(*) AS w
      |      FROM pr a JOIN pr b ON a.o = b.o AND a.p < b.p
      |      GROUP BY a.p, b.p HAVING COUNT(*) >= 2),
      |deg AS (SELECT node, COUNT(*) AS deg FROM (
      |          SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) un
      |        GROUP BY node),
      |o AS (SELECT CASE WHEN (du.deg, u) < (dv.deg, v) THEN u ELSE v END AS s,
      |             CASE WHEN (du.deg, u) < (dv.deg, v) THEN v ELSE u END AS t
      |      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
      |tri AS (SELECT COUNT(*) AS n_triangles FROM o e1
      |        JOIN o e2 ON e2.s = e1.t
      |        JOIN o e3 ON e3.s = e1.s AND e3.t = e2.t)
      |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
      |       (SELECT COUNT(*) FROM deg) AS n_nodes,
      |       (SELECT n_triangles FROM tri) AS n_triangles""".stripMargin) { (s, d) =>
    // pair generation is IN-ARRAY (the q47 posting-list discipline):
    // collect_set per order dedups and bounds the fanout by order size,
    // the sorted array yields u<v pairs inside codegen — ONE exchange
    // (by order), where the former distinct + self-join spelling paid
    // the (o,p)-distinct exchange AND re-exchanged both join sides on o
    // CPU fan-out (Tables.wide): the map-side partial collect_set is this
    // query's dominant job and otherwise runs inside the single-split
    // lineitem scan stage (job probe: n=3/n=4 tasks on 32 cores)
    val ps = graft.Tables.wide(s, lineitem(s, d))
      .groupBy(col("l_orderkey").as("o"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) >= 2)
    val pairsCol = flatten(transform(sequence(lit(1), size(col("ps")) - 1), i =>
      transform(sequence(i + 1, size(col("ps"))), j =>
        struct(element_at(col("ps"), i).as("u"), element_at(col("ps"), j).as("v")))))
    // materialize the weighted edge relation ONCE: it feeds deg, the
    // orientation join, the n_edges count AND (via o) all three legs of
    // the triangle join — six consumers whose shapes exchange reuse does
    // not bridge, so without the checkpoint the per-order pair generation
    // and its aggregate run six times (the q120/pagerank discipline)
    val e = ps.select(explode(pairsCol).as("pr"))
      .select(col("pr.u").as("u"), col("pr.v").as("v"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .localCheckpoint()
    val deg = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // deg has one row per surviving node — broadcast both orientation joins
    val lower = struct(col("du.deg"), col("u")) < struct(col("dv.deg"), col("v"))
    // o is read three times by the triangle join — checkpoint it too,
    // or each leg re-runs both broadcast orientation joins
    val o = e.join(broadcast(deg.as("du")), col("du.node") === col("u"))
      .join(broadcast(deg.as("dv")), col("dv.node") === col("v"))
      .select(when(lower, col("u")).otherwise(col("v")).as("s"),
        when(lower, col("v")).otherwise(col("u")).as("t"))
      .localCheckpoint()
    val tri = o.as("e1")
      .join(o.as("e2"), col("e2.s") === col("e1.t"))
      .join(o.as("e3"),
        col("e3.s") === col("e1.s") && col("e3.t") === col("e2.t"))
      .agg(count(lit(1)).as("n_triangles"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .crossJoin(tri)
  }

  /** Grouped OLS regression: per-user linear trend of `value` over time,
    * closed form from the five sufficient statistics (n, Σx, Σy, Σx²,
    * Σxy) — the distributed way to fit millions of small models at once:
    * ONE grouped aggregate, no per-group iteration, no driver loop.
    *
    * Exactness discipline (q129's): x = whole seconds since the corpus
    * origin (bounded, so x² sums fit BIGINT), y is micro-scaled to
    * BIGINT, and the one product that can wrap int64 (x·y ≈ 2.6e15 per
    * row) is widened to DECIMAL(19,0)×DECIMAL(19,0)→DECIMAL(38,0)
    * BEFORE multiplying. All five statistics are therefore exact and
    * order-independent; the closed-form division happens once per
    * group in DOUBLE with identical expression shape in both engines.
    * Degenerate groups where every x is equal (a burst of ≥3 events in
    * one epoch second) make the n·Σx²−(Σx)² denominator exactly 0 —
    * NULL in Spark, NaN/±inf in DuckDB — so the HAVING excludes them
    * with the EXACT integer predicate MIN(x) < MAX(x) (equivalent to
    * variance > 0, no float-cancellation ambiguity) on BOTH sides.
    * At 100 TB this is a textbook map-side-combinable aggregate: five
    * partial sums per (user, partition), one exchange on user_id. */
  val groupedRegression: Q = {
    val origin = 1704067200L // 2024-01-01T00:00:00Z, inside the fixture range
    Q(
      s"""WITH t AS (SELECT user_id,
         |    CAST(epoch_us(ts) AS BIGINT) // 1000000 - $origin AS x,
         |    CAST(ROUND(value * 1000000) AS BIGINT) AS y
         |  FROM events),
         |s AS (SELECT user_id, COUNT(*) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx,
         |    CAST(SUM(y) AS BIGINT) AS sy,
         |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
         |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy
         |  FROM t GROUP BY user_id
         |  HAVING COUNT(*) >= 3 AND MIN(x) < MAX(x))
         |SELECT user_id, CAST(n AS BIGINT) AS n,
         |  ROUND(((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1000000.0)
         |      - CAST(sx AS DOUBLE) * (CAST(sy AS DOUBLE) / 1000000.0))
         |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 86400.0, 6) AS slope_per_day,
         |  ROUND((CAST(sy AS DOUBLE) / 1000000.0
         |      - ((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1000000.0)
         |          - CAST(sx AS DOUBLE) * (CAST(sy AS DOUBLE) / 1000000.0))
         |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
         |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
         |FROM s ORDER BY user_id""".stripMargin) { (s, d) =>
      val t = events(s, d).select(col("user_id"),
        (expr("unix_micros(ts) DIV 1000000") - origin).as("x"),
        round(col("value") * 1000000).cast("long").as("y"))
      val st = t.groupBy("user_id").agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)")).as("sxx"),
          sum(col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)")).as("sxy"),
          min(col("x")).as("mnx"), max(col("x")).as("mxx"))
        .filter(col("n") >= 3 && col("mnx") < col("mxx"))
      val nD = col("n").cast("double")
      val sxD = col("sx").cast("double")
      val syD = col("sy").cast("double") / 1000000.0
      val sxxD = col("sxx").cast("double")
      val sxyD = col("sxy").cast("double") / 1000000.0
      val slopeSec = (nD * sxyD - sxD * syD) / (nD * sxxD - sxD * sxD)
      st.select(col("user_id"), col("n"),
          round(slopeSec * 86400.0, 6).as("slope_per_day"),
          round((syD - slopeSec * sxD) / nD, 6).as("intercept"))
        .orderBy("user_id")
    }
  }

  /** Point-in-time (leakage-free) feature extraction — the feature-store
    * join every supervised pipeline needs: at each LABEL event (a
    * purchase), compute features from the user's history STRICTLY
    * before it — views/clicks in the trailing 7 days and the previous
    * event's value. Strictness is enforced in the frame itself: the
    * range frame is keyed on epoch MICROseconds ending at 1 PRECEDING,
    * so same-second neighbors never leak in, and the row frame ends at
    * 1 PRECEDING under a (ts, event_id) total order.
    *
    * Scale shape: one exchange on user_id serves all three window
    * frames (same partition key, same sort); the label filter applies
    * AFTER the windows (it must — features read pre-label history) but
    * the projection is the only thing that survives it. No self-join:
    * the naive formulation is events⋈events on user & range, which
    * shuffles the fact table twice and fans out per pair; the window
    * form moves each row once. */
  val pitFeatures: Q = Q(
    """WITH t AS (SELECT event_id, user_id, event_type, value,
      |    CAST(epoch_us(ts) AS BIGINT) AS x_us FROM events),
      |f AS (SELECT event_id, user_id, event_type, x_us,
      |    COUNT(*) FILTER (WHERE event_type = 'view') OVER (
      |      PARTITION BY user_id ORDER BY x_us
      |      RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING) AS n_views_7d,
      |    COUNT(*) FILTER (WHERE event_type = 'click') OVER (
      |      PARTITION BY user_id ORDER BY x_us
      |      RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING) AS n_clicks_7d,
      |    last_value(value) OVER (
      |      PARTITION BY user_id ORDER BY x_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_value,
      |    x_us - lag(x_us) OVER (PARTITION BY user_id ORDER BY x_us, event_id)
      |      AS gap_us
      |  FROM t)
      |SELECT event_id, user_id,
      |  CAST(n_views_7d AS BIGINT) AS n_views_7d,
      |  CAST(n_clicks_7d AS BIGINT) AS n_clicks_7d,
      |  prev_value, CAST(gap_us // 1000000 AS BIGINT) AS gap_sec
      |FROM f WHERE event_type = 'purchase'
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val t = events(s, d).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), expr("unix_micros(ts)").as("x_us"))
    val wRange = Window.partitionBy("user_id").orderBy("x_us")
      .rangeBetween(-604800000000L, -1L)
    val wRows = Window.partitionBy("user_id").orderBy("x_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLag = Window.partitionBy("user_id").orderBy("x_us", "event_id")
    t.select(col("event_id"), col("user_id"), col("event_type"),
        count(when(col("event_type") === "view", 1)).over(wRange).as("n_views_7d"),
        count(when(col("event_type") === "click", 1)).over(wRange).as("n_clicks_7d"),
        last(col("value")).over(wRows).as("prev_value"),
        (col("x_us") - lag(col("x_us"), 1).over(wLag)).as("gap_us"))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("n_views_7d"),
        col("n_clicks_7d"), col("prev_value"),
        expr("CAST(gap_us DIV 1000000 AS BIGINT)").as("gap_sec"))
      .orderBy("user_id", "event_id")
  }

  /** AUC (Mann–Whitney) of `value` as a ranking score for purchase
    * events — the model-evaluation aggregate, computed EXACTLY: ties
    * get proper midranks, and every term stays integer until the final
    * division. Per distinct score: r_lo/r_hi from the EXCLUSIVE prefix
    * of value counts (doubled midrank = r_lo + r_hi, so no .5 ever
    * appears), U·2 = Σ_pos(r_lo + r_hi) − n_pos·(n_pos+1), AUC =
    * U·2 / (2·n_pos·n_neg). Σnp·(r_lo+r_hi) grows ~2·n_pos·n_total —
    * past int64 well below target scale — so both the per-score product
    * and the n_pos·(n_pos+1) correction are DECIMAL(19,0)-widened
    * pre-multiply (q129 discipline). The global cumulative ranking is the
    * single-partition trap — the distinct-score relation can be
    * millions of rows — so the prefix comes from operators.PrefixSum
    * (range exchange, one Long per partition to the driver, parallel
    * stamping), the same machinery as q151. One grouped aggregate over
    * the data, one PrefixSum over the distinct-score relation, one
    * 1-row result. */
  val aucScore: Q = Q(
    """WITH dv AS (SELECT value AS s, COUNT(*) AS n,
      |    COUNT(*) FILTER (WHERE event_type = 'purchase') AS np
      |  FROM events GROUP BY value),
      |c AS (SELECT s, n, np,
      |    COALESCE(SUM(n) OVER (ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx
      |  FROM dv),
      |agg AS (SELECT
      |    CAST(SUM(np) AS BIGINT) AS n_pos,
      |    CAST(SUM(n - np) AS BIGINT) AS n_neg,
      |    SUM(CAST(np AS DECIMAL(19,0)) * CAST(pfx + 1 + pfx + n AS DECIMAL(19,0))) AS sum_mid2
      |  FROM c)
      |SELECT n_pos, n_neg,
      |  ROUND(CAST(sum_mid2 - CAST(n_pos AS DECIMAL(19,0)) * CAST(n_pos + 1 AS DECIMAL(19,0)) AS DOUBLE)
      |    / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) AS auc
      |FROM agg""".stripMargin) { (s, d) =>
    val dv = events(s, d).groupBy(col("value").as("s"))
      .agg(count(lit(1)).as("n"),
        count(when(col("event_type") === "purchase", 1)).as("np"))
    // PrefixSum emits the EXCLUSIVE prefix (q151's contract)
    val c = graft.operators.PrefixSum.withPrefixSum(
      dv, Seq(col("s")), "n", "pfx", partitions = 32)
    c.agg(sum("np").as("n_pos"), sum(col("n") - col("np")).as("n_neg"),
        sum(col("np").cast("decimal(19,0)")
          * (col("pfx") + 1 + col("pfx") + col("n")).cast("decimal(19,0)")).as("sum_mid2"))
      .select(col("n_pos"), col("n_neg"),
        round((col("sum_mid2") - col("n_pos").cast("decimal(19,0)")
            * (col("n_pos") + 1).cast("decimal(19,0)")).cast("double")
          / (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")), 6)
          .as("auc"))
  }

  /** Exact WEIGHTED median (lower weighted median) of extended price
    * weighted by quantity, per return flag — the holistic aggregate
    * where every row's influence is its weight (a revenue-weighted
    * "typical price" ignores how many units moved if unweighted). The
    * selection is all-integer: centi-scaled prices order the partition,
    * centi-scaled weights accumulate in a running sum, and the answer
    * is the first value whose INCLUSIVE cumulative weight doubles to
    * ≥ the total — no float comparison at the boundary. One window per
    * bounded group (3 flags; same total-sort-within-group shape as
    * q29/q32), one aggregate to pick the crossing row. */
  val weightedMedian: Q = Q(
    """WITH t AS (SELECT l_returnflag AS flag,
      |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p,
      |    CAST(ROUND(l_quantity * 100) AS BIGINT) AS w,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |c AS (SELECT flag, p, w,
      |    SUM(w) OVER (PARTITION BY flag ORDER BY p, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |    SUM(w) OVER (PARTITION BY flag) AS tw
      |  FROM t)
      |SELECT flag, CAST(MIN(tw) AS BIGINT) AS total_weight,
      |  ROUND(CAST(MIN(CASE WHEN 2 * cw >= tw THEN p END) AS DOUBLE) / 100.0, 2)
      |    AS weighted_median
      |FROM c GROUP BY flag ORDER BY flag""".stripMargin) { (s, d) =>
    val t = lineitem(s, d).select(col("l_returnflag").as("flag"),
      round(col("l_extendedprice") * 100).cast("long").as("p"),
      round(col("l_quantity") * 100).cast("long").as("w"),
      col("l_orderkey"), col("l_linenumber"))
    val wCum = Window.partitionBy("flag")
      .orderBy("p", "l_orderkey", "l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("flag")
    val c = t.select(col("flag"), col("p"), col("w"),
      sum("w").over(wCum).as("cw"), sum("w").over(wAll).as("tw"))
    c.groupBy("flag")
      .agg(min("tw").as("total_weight"),
        round(min(when(lit(2) * col("cw") >= col("tw"), col("p"))).cast("double")
          / 100.0, 2).as("weighted_median"))
      .orderBy("flag")
  }

  /** Per-source QUANTILE NORMALIZATION of document length — the
    * batch-effect remover: each doc's length becomes its within-source
    * percentile, making sources with different length distributions
    * directly comparable (the preprocessing step before cross-source
    * quality thresholds). percentile = (rank−1)/(n−1) under a total
    * (length, doc_id) order — a rational of two integers, identical in
    * both engines; the n=1 degenerate group is pinned to 0.0 by CASE
    * on BOTH sides (otherwise 0/0 is NULL in Spark but NaN in DuckDB —
    * an engine divergence, and the micro-scaled ROUND→BIGINT cast of
    * NaN errors the oracle run). Windows partition by source (bounded key set), and
    * the output keeps (doc, source, raw, normalized) so downstream
    * filters can mix raw and normalized gates. Top-level aggregate
    * summarises per source so the graded row stays small. */
  val quantileNorm: Q = Q(
    """WITH r AS (SELECT source, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rnk,
      |    COUNT(*) OVER (PARTITION BY source) AS n
      |  FROM documents),
      |q AS (SELECT source, doc_id, n_chars,
      |    ROUND(CASE WHEN n = 1 THEN 0.0
      |      ELSE CAST(rnk - 1 AS DOUBLE) / (n - 1) END, 6) AS pct
      |  FROM r)
      |SELECT source, COUNT(*) AS n_docs,
      |  ROUND(CAST(SUM(CAST(ROUND(pct * 1000000) AS BIGINT)) AS DOUBLE)
      |    / (1000000.0 * COUNT(*)), 6) AS mean_pct,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
      |  CAST(MIN(CASE WHEN pct >= 0.5 THEN n_chars END) AS BIGINT) AS median_chars
      |FROM q GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val wRank = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    val wAll = Window.partitionBy("source")
    val q = documents(s, d).select(col("source"), col("doc_id"), col("n_chars"),
        row_number().over(wRank).as("rnk"), count(lit(1)).over(wAll).as("n"))
      .select(col("source"), col("doc_id"), col("n_chars"),
        round(when(col("n") === 1, lit(0.0))
          .otherwise((col("rnk") - 1).cast("double") / (col("n") - 1)), 6).as("pct"))
    q.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(sum(round(col("pct") * 1000000).cast("long")).cast("double")
          / (lit(1000000.0) * count(lit(1))), 6).as("mean_pct"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
        min(when(col("pct") >= 0.5, col("n_chars"))).as("median_chars"))
      .orderBy("source")
  }

  /** Calibration curve for the q184 score: per score-DECILE (equi-depth,
    * exact distributed ranks — the q112 GlobalRank shape, never a
    * single-partition row_number), the observed purchase rate next to
    * the mean score. AUC says "ranks well"; this says WHERE the score
    * over/under-predicts — together they are the standard model-eval
    * pair. Mean score is decimal-exact (micro-scaled sums); the rate is
    * an integer ratio emitted once per bin. */
  val calibration: Q = Q(
    """WITH r AS (SELECT value, event_type,
      |    ROW_NUMBER() OVER (ORDER BY value, event_id) AS rnk,
      |    COUNT(*) OVER () AS n
      |  FROM events)
      |SELECT CAST(FLOOR((rnk - 1) * 10 / n) AS INT) AS decile,
      |  COUNT(*) AS n_rows,
      |  ROUND(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS DOUBLE)
      |    / (1000000.0 * COUNT(*)), 6) AS mean_score,
      |  ROUND(CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
      |    / COUNT(*), 6) AS purchase_rate
      |FROM r GROUP BY decile ORDER BY decile""".stripMargin) { (s, d) =>
    val ev = events(s, d).select("value", "event_type", "event_id")
    val (ranked, n) = graft.operators.GlobalRank.withRowNumberAndTotal(
      ev, Seq(col("value"), col("event_id")), "rnk", partitions = 32)
    ranked
      .groupBy(floor((col("rnk") - 1) * 10 / n).cast("int").as("decile"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(round(col("value") * 1000000).cast("long")).cast("double")
          / (lit(1000000.0) * count(lit(1))), 6).as("mean_score"),
        round(count(when(col("event_type") === "purchase", 1)).cast("double")
          / count(lit(1)), 6).as("purchase_rate"))
      .orderBy("decile")
  }

  /** Pairwise Pearson correlation matrix over the four lineitem
    * measures — the feature-audit grid ("which measures are redundant")
    * — computed the scale-right way: ONE wide aggregate producing every
    * sufficient statistic (4 sums, 4 square sums, 6 cross sums) in a
    * single map-side-combinable pass, then the 6 matrix cells expand
    * from that ONE row. The generic alternative (unpivot → self-join on
    * the row key → per-pair aggregate) shuffles the fact table twice
    * and fans out ×measures²; the wide aggregate moves each row once
    * and exchanges 14 numbers. Centi-scaled BIGINT values; every
    * product is DECIMAL(19,0)-widened pre-multiply (price² ≈ 1e14 per
    * row × 6e5 rows overflows int64 in the sum — and DuckDB's
    * DECIMAL(≤18) multiply range-errors at 1e18, so 19 digits forces
    * the 128-bit path in both engines). corr computed once per pair in
    * identically-shaped DOUBLE. `corr()` builtins are float-accumulation
    * order-dependent — unusable as an oracle. */
  val corrMatrix: Q = {
    val ms = Seq("q" -> "l_quantity", "e" -> "l_extendedprice",
      "d" -> "l_discount", "t" -> "l_tax")
    val prs = for (i <- ms.indices; j <- ms.indices if i < j) yield (ms(i), ms(j))
    // zero-variance guard: a constant measure makes the sqrt denominator
    // exactly 0 — NULL in Spark, NaN in DuckDB. MIN=MAX is the EXACT
    // integer equivalent of variance=0 (no float-cancellation ambiguity),
    // so both engines emit NULL for that cell identically.
    def sqlCorr(a: String, b: String): String =
      s"""CASE WHEN mn_$a = mx_$a OR mn_$b = mx_$b THEN CAST(NULL AS DOUBLE)
         |  ELSE ROUND((CAST(n AS DOUBLE) * CAST(s_$a$b AS DOUBLE)
         |      - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
         |    / (sqrt(CAST(n AS DOUBLE) * CAST(s_$a$a AS DOUBLE)
         |      - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
         |     * sqrt(CAST(n AS DOUBLE) * CAST(s_$b$b AS DOUBLE)
         |      - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))), 6) END""".stripMargin
    Q(
      s"""WITH t AS (SELECT ${ms.map { case (k, c) =>
            s"CAST(ROUND($c * 100) AS BIGINT) AS $k" }.mkString(", ")} FROM lineitem),
         |s AS (SELECT COUNT(*) AS n,
         |  ${ms.map { case (k, _) => s"MIN($k) AS mn_$k, MAX($k) AS mx_$k" }.mkString(", ")},
         |  ${ms.map { case (k, _) => s"CAST(SUM($k) AS BIGINT) AS s_$k" }.mkString(", ")},
         |  ${(ms.map { case (k, _) => (k, k) } ++ prs.map(p => (p._1._1, p._2._1)))
              .map { case (a, b) =>
                s"SUM(CAST($a AS DECIMAL(19,0)) * CAST($b AS DECIMAL(19,0))) AS s_$a$b" }
              .mkString(", ")}
         |  FROM t)
         |SELECT m_a, m_b, n, corr FROM (
         |${prs.map { case ((ka, ca), (kb, cb)) =>
            s"  SELECT '$ca' AS m_a, '$cb' AS m_b, CAST(n AS BIGINT) AS n, ${sqlCorr(ka, kb)} AS corr FROM s" }
            .mkString("\n  UNION ALL\n")}
         |) ORDER BY m_a, m_b""".stripMargin) { (s, d) =>
      // CPU fan-out (Tables.wide): 14 decimal-widened products per row
      // otherwise run inside the single-split lineitem scan stage (job
      // probe: ONE 1.22 s job at n=3 was the whole query)
      val t = graft.Tables.wide(s, lineitem(s, d)).select(ms.map { case (k, c) =>
        round(col(c) * 100).cast("long").as(k) }: _*)
      val aggs =
        ms.flatMap { case (k, _) =>
          Seq(min(col(k)).as(s"mn_$k"), max(col(k)).as(s"mx_$k")) } ++
        ms.map { case (k, _) => sum(col(k)).as(s"s_$k") } ++
        (ms.map { case (k, _) => (k, k) } ++ prs.map(p => (p._1._1, p._2._1))).map {
          case (a, b) =>
            sum(col(a).cast("decimal(19,0)") * col(b).cast("decimal(19,0)")).as(s"s_$a$b") }
      val wide = t.agg(count(lit(1)).as("n"), aggs: _*)
      def corrOf(a: String, b: String) = {
        val nD = col("n").cast("double")
        ((nD * col(s"s_$a$b").cast("double")
          - col(s"s_$a").cast("double") * col(s"s_$b").cast("double"))
          / (sqrt(nD * col(s"s_$a$a").cast("double")
              - col(s"s_$a").cast("double") * col(s"s_$a").cast("double"))
            * sqrt(nD * col(s"s_$b$b").cast("double")
              - col(s"s_$b").cast("double") * col(s"s_$b").cast("double"))))
      }
      // the 6 cells expand from the ONE aggregate row via stack — a
      // unionAll of per-pair selects would re-run the wide aggregate
      // once per pair (no exchange to reuse between identical aggs)
      val one = wide.select(col("n") +: prs.map { case ((ka, _), (kb, _)) =>
        when(col(s"mn_$ka") === col(s"mx_$ka") || col(s"mn_$kb") === col(s"mx_$kb"),
          lit(null).cast("double"))
          .otherwise(round(corrOf(ka, kb), 6)).as(s"c_$ka$kb") }: _*)
      val stackArgs = prs.map { case ((ka, ca), (kb, cb)) =>
        s"'$ca', '$cb', c_$ka$kb" }.mkString(", ")
      one.select(col("n"),
          expr(s"stack(${prs.size}, $stackArgs) AS (m_a, m_b, corr)"))
        .select(col("m_a"), col("m_b"), col("n"), col("corr"))
        .orderBy("m_a", "m_b")
    }
  }

  /** Higher central moments per group — mean, stddev, SKEWNESS and
    * KURTOSIS — from the four raw power sums in ONE map-side-combinable
    * aggregate (the moments-sketch shape: partials merge by addition,
    * so the same query runs incrementally or distributed). Engine
    * builtins for skew/kurt use different bias corrections per engine —
    * unusable for an oracle — so both sides compute the SAME closed
    * form from the same exact sums. Milli-scaled BIGINT values keep
    * every power sum exact: v² fits int64 PER ROW, but its running sum
    * grows ~n·1e12 (and Σv ~n·1e6) — past int64 well below target
    * scale — so ALL four power sums accumulate in DECIMAL, products
    * widened to DECIMAL(19,0)×DECIMAL(19,0) BEFORE the multiply — 19
    * digits specifically, because DuckDB evaluates DECIMAL(≤18)
    * multiplies on the int64 fast path and range-errors at 1e18, while
    * 19 forces the 128-bit path in both engines (the q129 discipline).
    * Spark would instead wrap silently — divergence exactly at the
    * cube. Scaling cancels
    * in skew/kurt (dimensionless). */
  val higherMoments: Q = Q(
    """WITH t AS (SELECT event_type,
      |    CAST(ROUND(value * 1000) AS BIGINT) AS v FROM events),
      |s AS (SELECT event_type, COUNT(*) AS n,
      |    SUM(CAST(v AS DECIMAL(19,0))) AS s1,
      |    SUM(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0))) AS s2,
      |    SUM(CAST(v * v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0))) AS s3,
      |    SUM(CAST(v * v AS DECIMAL(19,0)) * CAST(v * v AS DECIMAL(19,0))) AS s4
      |  FROM t GROUP BY event_type)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  ROUND(CAST(s1 AS DOUBLE) / (1000.0 * CAST(n AS DOUBLE)), 6) AS mean,
      |  ROUND(sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
      |    - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / 1000.0, 6) AS stddev,
      |  ROUND((CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
      |      - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
      |      + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
      |    / pow(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 1.5), 6) AS skewness,
      |  ROUND((CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
      |      - 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
      |      + 6.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
      |      - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
      |    / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
      |      * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))) - 3.0, 6) AS kurtosis
      |FROM s ORDER BY event_type""".stripMargin) { (s, d) =>
    val t = events(s, d).select(col("event_type"),
      round(col("value") * 1000).cast("long").as("v"))
    val st = t.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("v").cast("decimal(19,0)")).as("s1"),
      sum(col("v").cast("decimal(19,0)") * col("v").cast("decimal(19,0)")).as("s2"),
      sum((col("v") * col("v")).cast("decimal(19,0)") * col("v").cast("decimal(19,0)")).as("s3"),
      sum((col("v") * col("v")).cast("decimal(19,0)")
        * (col("v") * col("v")).cast("decimal(19,0)")).as("s4"))
    val nD = col("n").cast("double")
    val m1 = col("s1").cast("double") / nD   // milli units
    val r2 = col("s2").cast("double") / nD
    val r3 = col("s3").cast("double") / nD
    val r4 = col("s4").cast("double") / nD
    val m2 = r2 - m1 * m1
    st.select(col("event_type"), col("n"),
        round(col("s1").cast("double") / (lit(1000.0) * nD), 6).as("mean"),
        round(sqrt(m2) / 1000.0, 6).as("stddev"),
        round((r3 - lit(3.0) * m1 * r2 + lit(2.0) * m1 * m1 * m1) / pow(m2, 1.5), 6)
          .as("skewness"),
        round((r4 - lit(4.0) * m1 * r3 + lit(6.0) * m1 * m1 * r2
          - lit(3.0) * m1 * m1 * m1 * m1) / (m2 * m2) - lit(3.0), 6).as("kurtosis"))
      .orderBy("event_type")
  }

  /** Chi-square test of independence (lang × source) — the corpus-audit
    * question "does language depend on scrape source?". Observed counts
    * from one grouped aggregate; the EXPECTED grid is the cross join of
    * the two TINY marginal relations (5 langs × 20 sources), left-joined
    * to observed so empty cells contribute (0−e)²/e — dropping them
    * understates the statistic. Per-cell contributions are ROUNDed then
    * DECIMAL-summed (the q100 per-term discipline) so the global sum is
    * order-independent. Everything after the one big aggregate is
    * marginal-sized — at 100 TB the grid math is free. */
  val chiSquare: Q = Q(
    """WITH o AS (SELECT lang, source, COUNT(*) AS c FROM documents
      |           GROUP BY lang, source),
      |rt AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS r FROM o GROUP BY lang),
      |ct AS (SELECT source, CAST(SUM(c) AS BIGINT) AS k FROM o GROUP BY source),
      |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM o),
      |grid AS (SELECT rt.lang, ct.source, rt.r, ct.k, nn.n,
      |           COALESCE(o.c, 0) AS c
      |         FROM rt CROSS JOIN ct CROSS JOIN nn
      |         LEFT JOIN o ON o.lang = rt.lang AND o.source = ct.source),
      |cell AS (SELECT ROUND(
      |    (CAST(c AS DOUBLE) - CAST(r AS DOUBLE) * CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
      |    * (CAST(c AS DOUBLE) - CAST(r AS DOUBLE) * CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
      |    / (CAST(r AS DOUBLE) * CAST(k AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS x
      |  FROM grid)
      |SELECT ROUND(CAST(SUM(CAST(x AS DECIMAL(28,9))) AS DOUBLE), 6) AS chi2,
      |  (SELECT COUNT(*) FROM rt) * (SELECT COUNT(*) FROM ct)
      |    - (SELECT COUNT(*) FROM rt) - (SELECT COUNT(*) FROM ct) + 1 AS df
      |FROM cell""".stripMargin) { (s, d) =>
    val o = documents(s, d).groupBy("lang", "source").agg(count(lit(1)).as("c"))
    val rt = o.groupBy("lang").agg(sum("c").as("r"))
    val ct = o.groupBy("source").agg(sum("c").as("k"))
    val nn = o.agg(sum("c").as("n"))
    val grid = rt.crossJoin(broadcast(ct)).crossJoin(broadcast(nn))
      .join(o, Seq("lang", "source"), "left")
      .select(col("r"), col("k"), col("n"), coalesce(col("c"), lit(0L)).as("c"))
    val e = col("r").cast("double") * col("k").cast("double") / col("n").cast("double")
    val x = round((col("c").cast("double") - e) * (col("c").cast("double") - e) / e, 9)
    // df arrives in-plan from the two 1-row marginal counts (no driver
    // action at build time), matching the oracle's subquery arithmetic
    val nl = rt.agg(count(lit(1)).as("nl"))
    val ns = ct.agg(count(lit(1)).as("ns"))
    grid.select(x.as("x"))
      .agg(round(sum(col("x").cast("decimal(28,9)")).cast("double"), 6).as("chi2"))
      .crossJoin(broadcast(nl)).crossJoin(broadcast(ns))
      .select(col("chi2"),
        (col("nl") * col("ns") - col("nl") - col("ns") + 1).as("df"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic (src0 vs src1 length
    * distributions) — distribution drift measured EXACTLY: the KS
    * supremum |F_a − F_b| is maximized as the INTEGER |ca·nb − cb·na|
    * over the merged value support, so engines cannot disagree at the
    * argmax (the float CDF difference would tie-break differently under
    * rounding). The cumulative CDF numerators come from
    * [[graft.operators.PrefixSum]] — a range-exchanged two-pass prefix
    * (one Long per partition to the driver), NOT a partition-less
    * window: the support relation is distinct-value-bounded on the
    * fixtures (~500 lengths) but a continuous 100 TB metric has no such
    * bound, and the operator costs the same here while surviving there
    * (the round-10 verdict's q174 watch item). Totals come off the
    * stamped frame, so the documents scan runs once. */
  val ksTest: Q = Q(
    """WITH ab AS (SELECT n_chars AS v,
      |    COUNT(*) FILTER (WHERE source = 'src0') AS na_v,
      |    COUNT(*) FILTER (WHERE source = 'src1') AS nb_v
      |  FROM documents WHERE source IN ('src0', 'src1') GROUP BY n_chars),
      |cum AS (SELECT v,
      |    SUM(na_v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
      |    SUM(nb_v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
      |    SUM(na_v) OVER () AS na, SUM(nb_v) OVER () AS nb
      |  FROM ab)
      |SELECT CAST(MAX(na) AS BIGINT) AS na, CAST(MAX(nb) AS BIGINT) AS nb,
      |  CAST(MAX(ABS(ca * nb - cb * na)) AS BIGINT) AS d_num,
      |  ROUND(CAST(MAX(ABS(ca * nb - cb * na)) AS DOUBLE)
      |    / (CAST(MAX(na) AS DOUBLE) * CAST(MAX(nb) AS DOUBLE)), 6) AS ks
      |FROM cum""".stripMargin) { (s, d) =>
    val ab = documents(s, d).filter(col("source").isin("src0", "src1"))
      .groupBy(col("n_chars").as("v"))
      .agg(count(when(col("source") === "src0", 1)).as("na_v"),
        count(when(col("source") === "src1", 1)).as("nb_v"))
    // v is DISTINCT (post-groupBy) — the total order PrefixSum requires;
    // exclusive prefix + the row's own weight = the inclusive CDF count;
    // BOTH numerators stamp in the one range exchange
    val parts = s.sparkContext.defaultParallelism
    val pb = graft.operators.PrefixSum.withPrefixSums(
      ab, Seq(col("v")), Seq("na_v" -> "pa", "nb_v" -> "pb"), parts)
    val tot = pb.agg(sum("na_v").as("na"), sum("nb_v").as("nb"))
    val cum = pb.crossJoin(broadcast(tot))
      .select(col("v"),
        (col("pa") + col("na_v")).as("ca"), (col("pb") + col("nb_v")).as("cb"),
        col("na"), col("nb"))
    cum.agg(max("na").as("na"), max("nb").as("nb"),
        max(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("d_num"),
        round(max(abs(col("ca") * col("nb") - col("cb") * col("na"))).cast("double")
          / (max("na").cast("double") * max("nb").cast("double")), 6).as("ks"))
  }

  /** Gini coefficient of order value per priority class — revenue
    * concentration, the classic inequality measure, via the sorted
    * prefix-sum identity G = (2·Σi·vᵢ − (n+1)·Σvᵢ) / (n·Σvᵢ). Values
    * are centi-scaled BIGINTs and the rank i is a per-group row_number
    * under a TOTAL order (value, then key), so the big sums are exact
    * integers — the division at the end is the only float op. Σi·v
    * grows ~n²·v̄/2, past int64 well below target scale, so the i·v
    * product is DECIMAL(19,0)-widened pre-multiply (the q129/q172
    * discipline; Spark wraps int64 silently, DuckDB's HUGEINT→BIGINT
    * cast would error — widening keeps both engines exact). The
    * per-priority window is a keyed partition (5 groups), each sorted
    * once; the identity needs no pairwise |vᵢ−vⱼ| expansion (the naive
    * O(n²) formulation). */
  val giniIndex: Q = Q(
    """WITH t AS (SELECT o_orderpriority AS pri,
      |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT), o_orderkey) AS i
      |  FROM orders),
      |s AS (SELECT pri, COUNT(*) AS n,
      |    CAST(SUM(v) AS BIGINT) AS sv,
      |    SUM(CAST(i AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0))) AS siv
      |  FROM t GROUP BY pri)
      |SELECT pri, CAST(n AS BIGINT) AS n,
      |  ROUND((2.0 * CAST(siv AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(sv AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(sv AS DOUBLE)), 6) AS gini
      |FROM s ORDER BY pri""".stripMargin) { (s, d) =>
    val v = round(col("o_totalprice") * 100).cast("long")
    val w = Window.partitionBy("pri").orderBy("v", "o_orderkey")
    val t = orders(s, d)
      .select(col("o_orderpriority").as("pri"), v.as("v"), col("o_orderkey"))
      .withColumn("i", row_number().over(w))
    val st = t.groupBy("pri").agg(count(lit(1)).as("n"),
      sum("v").as("sv"),
      sum(col("i").cast("decimal(19,0)") * col("v").cast("decimal(19,0)")).as("siv"))
    st.select(col("pri"), col("n"),
        round((lit(2.0) * col("siv").cast("double")
          - (col("n").cast("double") + 1.0) * col("sv").cast("double"))
          / (col("n").cast("double") * col("sv").cast("double")), 6).as("gini"))
      .orderBy("pri")
  }

  override def queries: Seq[(String, Q)] = Seq(
    "q101_fuzzy_join"     -> fuzzyJoin,
    "q102_unpivot"        -> unpivot,
    "q103_histogram"      -> histogram,
    "q104_quality_audit"  -> qualityAudit,
    "q106_funnel"         -> funnel,
    "q107_transitions"    -> transitions,
    "q108_scd2_intervals" -> scd2Intervals,
    "q128_winsorize"      -> winsorize,
    "q129_time_weighted"  -> timeWeighted,
    "q140_mad_outliers"   -> madOutliers,
    "q141_attribution"    -> attribution,
    "q145_psi_drift"      -> psiDrift,
    "q155_triangle_count" -> triangleCount,
    "q163_grouped_regression" -> groupedRegression,
    "q164_pit_features"   -> pitFeatures,
    "q167_entity_clusters" -> entityClusters,
    "q176_corr_matrix"    -> corrMatrix,
    "q184_auc"            -> aucScore,
    "q185_calibration"    -> calibration,
    "q186_weighted_median"-> weightedMedian,
    "q187_quantile_norm"  -> quantileNorm,
    "q172_higher_moments" -> higherMoments,
    "q173_chi_square"     -> chiSquare,
    "q174_ks_test"        -> ksTest,
    "q175_gini_index"     -> giniIndex
  )
}
