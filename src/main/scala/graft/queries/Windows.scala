package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dsl._

/** Window functions (SURVEY.md §2.5, W1–W6). Every window has a TOTAL order
  * (unique-key tiebreaks) so results are deterministic cross-engine (R1).
  *
  * Scale note: window partitions here are bounded (customer, user, segment
  * keys), so a 100 TB run shuffles once by partition key and sorts within
  * partitions — no global sort, no driver materialization.
  */
object Windows extends QueryModule {

  /** W1: ranking family over order value within market segment. */
  val rankWindow: Q = Q(
    """SELECT * FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER w AS rn,
      |    RANK() OVER w AS rnk,
      |    DENSE_RANK() OVER w AS drnk,
      |    NTILE(4) OVER w AS quartile,
      |    CAST(PERCENT_RANK() OVER w AS DOUBLE) AS prank
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC)
      |) WHERE rn <= 20 ORDER BY c_mktsegment, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).cast("double").as("prank"))
      .filter(col("rn") <= 20)
      .orderBy("c_mktsegment", "rn")
  }

  /** W2: lag/lead over each user's event stream (ts+event_id total order). */
  val lagLead: Q = Q(
    """SELECT * FROM (
      |  SELECT event_id, user_id, value,
      |    LAG(value, 1) OVER w AS prev_value,
      |    LEAD(value, 1) OVER w AS next_value,
      |    CAST(value - LAG(value, 1) OVER w AS DOUBLE) AS delta,
      |    event_type
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |) WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        lag("value", 1).over(w).as("prev_value"),
        lead("value", 1).over(w).as("next_value"),
        (col("value") - lag("value", 1).over(w)).cast("double").as("delta"),
        col("event_type"))
      .filter(col("event_type") === "purchase")
      .orderBy("event_id")
  }

  /** W3: running total per customer — prefix sums in exact decimal. */
  val runningSum: Q = Q(
    """SELECT c_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER (
      |    PARTITION BY c_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY c_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(28,4)")).over(w).cast("double").as("running_total"))
      .orderBy("c_custkey", "o_orderkey")
  }

  /** W4: sliding RANGE frame — trailing-7-day spend per customer, keyed on
    * a numeric day offset so both engines use identical range semantics. */
  val rangeFrame: Q = Q(
    """SELECT c_custkey, o_orderkey, day_num,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER (
      |    PARTITION BY c_custkey ORDER BY day_num
      |    RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS DOUBLE) AS week_spend
      |FROM (
      |  SELECT c_custkey, o_orderkey, o_totalprice,
      |    datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_num
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |ORDER BY c_custkey, day_num, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_custkey").orderBy("day_num").rangeBetween(-7, 0)
    orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .withColumn("day_num", datediff(to_date(col("o_orderdate")), lit("1995-01-01")))
      .select(col("c_custkey"), col("o_orderkey"), col("day_num"),
        sum(col("o_totalprice").cast("decimal(28,4)")).over(w).cast("double").as("week_spend"))
      .orderBy("c_custkey", "day_num", "o_orderkey")
  }

  /** W5: top-k per group with the group's dimension attributes joined in. */
  val topKPerGroup: Q = Q(
    """SELECT * FROM (
      |  SELECT c_mktsegment, c_name, o_orderkey, o_totalprice,
      |    RANK() OVER (PARTITION BY c_mktsegment
      |                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |) WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_mktsegment").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("c_name"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy("c_mktsegment", "rnk")
  }

  /** W6: cumulative distribution + percent rank over one ship-month of
    * lineitem (deterministic pre-filter keeps the dump bounded). */
  val cumeDist: Q = Q(
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  CAST(CUME_DIST() OVER w AS DOUBLE) AS cd,
      |  CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pr
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber)
      |ORDER BY l_orderkey, l_linenumber, l_quantity, cd, pr""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("l_returnflag").orderBy("l_quantity", "l_orderkey", "l_linenumber")
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        cume_dist().over(w).cast("double").as("cd"),
        percent_rank().over(w).cast("double").as("pr"))
      // the fixture lineitem has duplicate (l_orderkey, l_linenumber)
      // pairs, so the dump order must be total over the FULL output row
      // or the engines may interleave tied keys differently (seen at
      // sf0.1; cd/pr themselves are tie-safe — CUME_DIST/PERCENT_RANK
      // assign equal values to equal sort keys)
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "cd", "pr")
  }

  /** Batch sessionization (gaps-and-islands): a new session starts when
    * the gap to the previous event exceeds 30 minutes; session id = running
    * count of session starts. Two stacked windows over the SAME (user, ts)
    * ordering — one shuffle + one sort feed both (and the streaming
    * equivalent is q65's session_window, so the two formulations
    * cross-check each other at the semantic level). */
  val sessionize: Q = Q(
    """WITH gaps AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |           OR lag(ts) OVER w IS NULL
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM gaps)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  COUNT(*) AS n_events, MIN(ts) AS s_start, MAX(ts) AS s_end
      |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w) > 1800000000L
          || lag(col("ts"), 1).over(w).isNull, 1).otherwise(0).as("new_s"))
      .select(col("user_id"), col("ts"),
        sum("new_s").over(wRun).cast("long").as("session_id"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("ts").as("s_start"), max("ts").as("s_end"))
      .orderBy("user_id", "session_id")
  }

  override def queries: Seq[(String, Q)] = Seq(
    "q24_rank_window"    -> rankWindow,
    "q25_lag_lead"       -> lagLead,
    "q26_running_sum"    -> runningSum,
    "q27_range_frame"    -> rangeFrame,
    "q28_topk_per_group" -> topKPerGroup,
    "q29_cume_dist"      -> cumeDist,
    "q86_sessionize"     -> sessionize
  )
}
