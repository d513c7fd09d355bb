package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dsl._

/** Coverage completions: the outer-join variants J4 not exercised by the
  * core set, full-frame window analytics (W2 first/last/nth), and the SQL
  * string entry path (parser → analyzer, same Catalyst pipeline as the
  * DataFrame API).
  */
object Extras extends QueryModule {

  /** J4b: FULL OUTER join with both dangling sides manufactured by
    * disjoint-ish filters, then re-aggregated per surviving key. */
  val fullOuter: Q = Q(
    """SELECT COALESCE(c_custkey, o_custkey) AS k,
      |  COUNT(o_orderkey) AS n_orders,
      |  CAST(MAX(CASE WHEN c_name IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS has_cust
      |FROM (SELECT * FROM customer WHERE c_custkey < 100) c
      |FULL OUTER JOIN (SELECT * FROM orders WHERE o_custkey >= 50) o
      |  ON c_custkey = o_custkey
      |GROUP BY COALESCE(c_custkey, o_custkey) ORDER BY k""".stripMargin) { (s, d) =>
    val c = customer(s, d).filter(col("c_custkey") < 100)
    val o = orders(s, d).filter(col("o_custkey") >= 50)
    c.join(o, col("c_custkey") === col("o_custkey"), "full")
      .groupBy(coalesce(col("c_custkey"), col("o_custkey")).as("k"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        max(when(col("c_name").isNotNull, 1).otherwise(0)).cast("int").as("has_cust"))
      .orderBy("k")
  }

  /** J4c: RIGHT OUTER join — parts kept even with zero matching items. */
  val rightOuter: Q = Q(
    """SELECT p_partkey, COUNT(l_orderkey) AS n_items
      |FROM (SELECT * FROM lineitem WHERE l_quantity >= 49) l
      |RIGHT JOIN part ON l_partkey = p_partkey
      |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin) { (s, d) =>
    lineitem(s, d).filter(col("l_quantity") >= 49)
      .join(part(s, d), col("l_partkey") === col("p_partkey"), "right")
      .groupBy("p_partkey")
      .agg(count(col("l_orderkey")).as("n_items"))
      .orderBy("p_partkey")
  }

  /** W2b: first/last/nth values over full partition frames. */
  val firstLastWindow: Q = Q(
    """SELECT * FROM (
      |  SELECT event_id, user_id, value,
      |    first_value(value) OVER w AS first_v,
      |    last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v,
      |    nth_value(value, 3) OVER w AS third_v,
      |    event_type
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |) WHERE event_type = 'signup' ORDER BY event_id""".stripMargin) { (s, d) =>
    val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wAll = wRun.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        first("value").over(wRun).as("first_v"),
        last("value").over(wAll).as("last_v"),
        nth_value(col("value"), 3).over(wRun).as("third_v"),
        col("event_type"))
      .filter(col("event_type") === "signup")
      .orderBy("event_id")
  }

  /** SQL-string entry path: the same Catalyst pipeline entered through the
    * parser, over registered temp views — proves spark.sql(...) parity. */
  val sqlApi: Q = Q(
    s"""SELECT year(o_orderdate) AS y, o_orderpriority,
       |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
       |FROM orders GROUP BY y, o_orderpriority
       |ORDER BY y, o_orderpriority""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      s"""SELECT year(o_orderdate) AS y, o_orderpriority,
         |  COUNT(*) AS n,
         |  CAST(SUM(CAST((o_totalprice) AS DECIMAL(28,4))) AS DOUBLE) AS total
         |FROM orders_v GROUP BY y, o_orderpriority
         |ORDER BY y, o_orderpriority""".stripMargin)
  }

  /** A5c: explicit GROUPING SETS through the SQL path (rollup/cube's
    * general form). */
  val groupingSets: Q = Q(
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
       |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem_v
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** A7b: ordered LISTAGG (SQL:2023, new in Spark 4) — deterministic
    * delimited concatenation via WITHIN GROUP (ORDER BY …), the string
    * twin of q31's sort_array(collect_list). DuckDB spells it
    * string_agg(expr, sep ORDER BY …). */
  val listAgg: Q = Q(
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, d) =>
    nation(s, d).createOrReplaceTempView("nation_v")
    region(s, d).createOrReplaceTempView("region_v")
    s.sql(
      """SELECT r_name, listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        |FROM nation_v JOIN region_v ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
  }

  /** J12: correlated LATERAL subquery — top-2 orders per qualifying
    * customer, written as the SQL form (a per-row dependent subquery
    * with ORDER BY + LIMIT). Catalyst decorrelates this into a
    * window-rank over ONE join — no nested-loop re-execution per outer
    * row — which is exactly the rewrite that keeps the construct usable
    * when the outer side is 10^9 customers. DuckDB executes the same
    * text natively. */
  val lateralTopk: Q = Q(
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
      |WHERE c_custkey <= 50
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin) { (s, d) =>
    customer(s, d).createOrReplaceTempView("customer_v")
    orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer_v, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders_v
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
        |WHERE c_custkey <= 50
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  /** §2.7-json++: the VARIANT type (new in Spark 4) — `parse_json` once,
    * then typed `variant_get` path extraction. Variant's binary encoding
    * replaces per-access string re-parsing with O(log fields) field
    * lookup, the semi-structured answer to "don't re-tokenize JSON in
    * every expression" at corpus scale. Output is projected to plain
    * typed columns (the variant never crosses the result boundary), so
    * the DuckDB oracle is plain json_extract. */
  val variantExtract: Q = Q(
    """SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
      |FROM events
      |WHERE CAST(json_extract(props, '$.k') AS INT) > 95
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val v = parse_json(col("props"))
    // CPU fan-out (Tables.wide): per-row JSON parse otherwise runs inside
    // the single-split events scan stage
    graft.Tables.wide(s, events(s, d))
      .select(col("event_id"), variant_get(v, "$.k", "int").as("k"))
      .filter(col("k") > 95)
      .orderBy("event_id")
  }

  /** The densified (user × day) grid both resampling queries share: every
    * user crossed with every day of the observed range (the day list is a
    * one-row aggregate → broadcast; the cross join is users × ~30, not a
    * pair explosion). */
  private def dailyGrid(s: org.apache.spark.sql.SparkSession, d: String) = {
    val ev = events(s, d).select(col("user_id"),
      date_trunc("day", col("ts")).cast("date").as("day"), col("value"))
    val days = ev.agg(min("day").as("mn"), max("day").as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("day"))
    val users = ev.select("user_id").distinct()
    (ev, users.crossJoin(broadcast(days)))
  }

  private val sqlDailyCtes =
    """ev AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value FROM events),
      |days AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
      |         FROM (SELECT MIN(day) AS mn, MAX(day) AS mx FROM ev)),
      |grid AS (SELECT u.user_id, d.day FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN days d)""".stripMargin

  /** Time-series densification (resampling): per-user daily event counts
    * over the FULL observed range, missing days zero-filled — the gap
    * between "group by day" and an actual regular time series. */
  val resample: Q = Q(
    s"""WITH $sqlDailyCtes,
       |cnt AS (SELECT user_id, day, COUNT(*) AS n FROM ev GROUP BY 1, 2)
       |SELECT g.user_id, g.day, COALESCE(cnt.n, 0) AS n
       |FROM grid g LEFT JOIN cnt ON g.user_id = cnt.user_id AND g.day = cnt.day
       |ORDER BY g.user_id, g.day""".stripMargin) { (s, d) =>
    val (ev, grid) = dailyGrid(s, d)
    val cnt = ev.groupBy("user_id", "day").agg(count(lit(1)).as("n"))
    grid.join(cnt, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("user_id", "day")
  }

  /** Forward fill (last observation carried forward): per-user daily mean
    * value on the densified grid; days with no events inherit the
    * previous day's value (null until the first observation). */
  val forwardFill: Q = Q(
    s"""WITH $sqlDailyCtes,
       |daily AS (SELECT user_id, day, ${sqlDavg("value")} AS v FROM ev GROUP BY 1, 2)
       |SELECT user_id, day,
       |  ROUND(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled
       |FROM (SELECT g.user_id, g.day, daily.v
       |      FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.day = daily.day)
       |ORDER BY user_id, day""".stripMargin) { (s, d) =>
    val (ev, grid) = dailyGrid(s, d)
    val daily = ev.groupBy("user_id", "day").agg(davg(col("value")).as("v"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        round(last(col("v"), ignoreNulls = true).over(w), 6).as("filled"))
      .orderBy("user_id", "day")
  }

  /** Snapshot diff (change-data-capture between two corpus/table
    * versions): full-outer join two snapshots on the key, classify each
    * key as added / removed / changed, and emit only the delta — the
    * incremental-pipeline primitive for "what changed since the last
    * load". Snapshots are carved deterministically from `orders` (A
    * drops keys ≡0 mod 11; B drops ≡0 mod 13 and uplifts prices of keys
    * ≡0 mod 7 by 5%), so both engines derive identical versions.
    *
    * Determinism: prices pass through UNROUNDED — x and x*1.05 are single
    * IEEE double ops, bit-identical across engines, so emitting the raw
    * values is SAFER than rounding (no tie-break semantics in play).
    * Scale shape: one shuffle per side on the join key; the delta is the
    * only output (unchanged rows — the overwhelming majority at 100 TB —
    * never leave the join). */
  val snapshotDiff: Q = Q(
    """WITH a AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 11 <> 0),
      |b AS (SELECT o_orderkey,
      |        CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.05
      |             ELSE o_totalprice END AS o_totalprice
      |      FROM orders WHERE o_orderkey % 13 <> 0)
      |SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |  CASE WHEN a.o_orderkey IS NULL THEN 'added'
      |       WHEN b.o_orderkey IS NULL THEN 'removed'
      |       ELSE 'changed' END AS change,
      |  a.o_totalprice AS old_price, b.o_totalprice AS new_price
      |FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
      |WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
      |   OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val a = orders(s, d).filter(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderkey").as("a_key"), col("o_totalprice").as("old_price"))
    val b = orders(s, d).filter(col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey").as("b_key"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 1.05)
          .otherwise(col("o_totalprice")).as("new_price"))
    a.join(b, col("a_key") === col("b_key"), "full")
      .filter(col("a_key").isNull || col("b_key").isNull ||
        !(col("old_price") <=> col("new_price")))
      .select(coalesce(col("a_key"), col("b_key")).as("o_orderkey"),
        when(col("a_key").isNull, "added")
          .when(col("b_key").isNull, "removed")
          .otherwise("changed").as("change"),
        col("old_price"), col("new_price"))
      .orderBy("o_orderkey")
  }

  override def queries: Seq[(String, Q)] = Seq(
    "q73_join_full_outer"  -> fullOuter,
    "q74_join_right_outer" -> rightOuter,
    "q75_first_last_window"-> firstLastWindow,
    "q76_sql_api"          -> sqlApi,
    "q77_grouping_sets"    -> groupingSets,
    "q84_resample"         -> resample,
    "q85_forward_fill"     -> forwardFill,
    "q98_snapshot_diff"    -> snapshotDiff,
    "q122_listagg"         -> listAgg,
    "q123_lateral_topk"    -> lateralTopk,
    "q124_variant_extract" -> variantExtract
  )
}
