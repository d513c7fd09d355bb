package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._
import Dsl._

/** Streaming-window semantics declared as batch queries (SURVEY.md §2.10):
  * `window()`/`session_window()` evaluate identically in batch and
  * Structured Streaming, so the oracle checks the semantics here and the
  * ScalaTest MemoryStream suites prove incremental execution, watermarks
  * and stateful dedup (graft.streaming).
  */
object StreamingBatch extends QueryModule {

  /** ST1: tumbling 10-minute windows per event type. Both engines bucket
    * from an epoch-aligned origin, so starts agree. */
  val tumblingWindow: Q = Q(
    s"""SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start, event_type,
       |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
       |FROM events GROUP BY w_start, event_type
       |ORDER BY w_start, event_type""".stripMargin) { (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")
  }

  /** ST2: sliding windows (10 min length, 5 min slide) — every event lands
    * in exactly two windows; the oracle materializes both membership rows
    * explicitly. */
  val slidingWindow: Q = Q(
    s"""SELECT w_start, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
       |FROM (
       |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, value FROM events
       |  UNION ALL
       |  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS w_start, value FROM events)
       |GROUP BY w_start ORDER BY w_start""".stripMargin) { (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("n"), col("sum_value"))
      .orderBy("w_start")
  }

  /** ST3: session windows (5-minute gap) per user. Oracle = the classic
    * lag/cumsum sessionization; a new session opens when the gap is ≥ the
    * timeout (Spark merges events strictly inside start+gap). Exact µs
    * arithmetic avoids interval-comparison dialect gaps. */
  val sessionWindow: Q = Q(
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 300000000
      |         OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_event, COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    events(s, d)
      .groupBy(session_window(col("ts"), "5 minutes").as("sw"), col("user_id"))
      .agg(min("ts").as("session_start"), max("ts").as("last_event"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("last_event"), col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** ST5 (batch shape): stateful dedup semantics — a doubled stream
    * deduped by key yields the original, deterministically (duplicate rows
    * are bit-identical, so the arbitrary pick is value-stable). */
  val dedupStream: Q = Q(
    """SELECT event_type, COUNT(*) AS n,
      |  COUNT(DISTINCT event_id) AS n_unique
      |FROM (SELECT DISTINCT * FROM (
      |  SELECT * FROM events UNION ALL SELECT * FROM events))
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val e = events(s, d)
    e.unionAll(e)
      .dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("event_id").as("n_unique"))
      .orderBy("event_type")
  }

  /** ST6 (batch shape): stream⋈static enrichment — events joined against a
    * broadcast static per-user profile (lifetime mean), classifying each
    * event against it. */
  val streamStaticJoin: Q = Q(
    s"""WITH profile AS (
       |  SELECT user_id, ${sqlDavg("value")} AS avg_value FROM events GROUP BY user_id)
       |SELECT e.event_type,
       |  CAST(SUM(CASE WHEN e.value > p.avg_value THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
       |  CAST(SUM(CASE WHEN e.value <= p.avg_value THEN 1 ELSE 0 END) AS BIGINT) AS n_below
       |FROM events e JOIN profile p ON e.user_id = p.user_id
       |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin) { (s, d) =>
    val profile = events(s, d).groupBy("user_id").agg(davg(col("value")).as("avg_value"))
    events(s, d)
      .join(broadcast(profile.withColumnRenamed("user_id", "p_user")), col("user_id") === col("p_user"))
      .groupBy("event_type")
      .agg(sum(when(col("value") > col("avg_value"), 1).otherwise(0)).as("n_above"),
        sum(when(col("value") <= col("avg_value"), 1).otherwise(0)).as("n_below"))
      .orderBy("event_type")
  }

  override def queries: Seq[(String, Q)] = Seq(
    "q63_tumbling_window"   -> tumblingWindow,
    "q64_sliding_window"    -> slidingWindow,
    "q65_session_window"    -> sessionWindow,
    "q66_dedup_stream"      -> dedupStream,
    "q67_stream_static_join"-> streamStaticJoin
  )
}
