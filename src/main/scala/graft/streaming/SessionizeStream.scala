package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** State: ALL currently-open sessions of one key, as parallel arrays of
  * [start, end] millis + event counts (kept sorted by start). A LIST —
  * not a single session — because out-of-order events that are still
  * on time (within the watermark delay) may open an EARLIER session, or
  * bridge two open ones. Top-level (not nested in the object): the state
  * encoder's generated code constructs it reflectively, and
  * nested/private classes trip Janino's constructor resolution. */
private[graft] case class OpenSessions(starts: Array[Long], ends: Array[Long],
                                       counts: Array[Long])

/** Streaming gap-based sessionization with CUSTOM state — the streaming
  * twin of the batch gaps-and-islands query (q86) and the third point on
  * the session triangle next to `session_window` (q65): open sessions
  * are held in `flatMapGroupsWithState` state and each session is
  * emitted exactly once, when the event-time WATERMARK passes its
  * end + gap — the only moment finality is provable. Nothing is ever
  * closed merely because a later event arrived: an out-of-order event
  * that is still on time (within the watermark delay) may extend an
  * earlier open session, open a new one before it, or BRIDGE two open
  * sessions into one — all of which plain "close on next event" designs
  * get wrong. Append-mode output of final sessions is what a production
  * pipeline sinks (session_window cannot carry arbitrary per-session
  * state — that is the point of the custom-state API).
  *
  * Scale shape: state lives in the state store, partitioned by key —
  * one shuffle per micro-batch on the grouping key, state size O(open
  * sessions), and event-time timeouts close + garbage-collect idle
  * keys. The caller MUST set a watermark on the event-time column
  * upstream (event-time timeout requires it); events later than the
  * watermark are dropped by the framework before this operator sees
  * them.
  */
object SessionizeStream {

  /** @param ds        watermarked input stream
    * @param key       session grouping key
    * @param eventTime event-time accessor (the watermarked column)
    * @param gapMs     inactivity gap that closes a session
    * @return closed sessions (key, start, end, n), append-mode-safe
    *         (each emitted exactly once, in start order per key)
    */
  def byGap[T, K: Encoder](ds: Dataset[T], key: T => K, eventTime: T => Timestamp,
                           gapMs: Long): Dataset[(K, Timestamp, Timestamp, Long)] = {
    require(gapMs > 0, s"session gap must be positive, got $gapMs ms")
    implicit val stateEnc: Encoder[OpenSessions] = Encoders.product[OpenSessions]
    implicit val outEnc: Encoder[(K, Timestamp, Timestamp, Long)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.TIMESTAMP, Encoders.TIMESTAMP,
        Encoders.scalaLong)
    ds.groupByKey(key)
      .flatMapGroupsWithState[OpenSessions, (K, Timestamp, Timestamp, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: K, evs: Iterator[T], state: GroupState[OpenSessions]) =>
          // merge new events into the open-session set: each event is a
          // [t, t, 1] singleton; coalesce any neighbors within gap (this
          // extends sessions in either direction and bridges across)
          val prior = state.getOption
            .map(s => s.starts.indices.map(i => (s.starts(i), s.ends(i), s.counts(i))).toVector)
            .getOrElse(Vector.empty)
          val fresh = evs.map(e => { val t = eventTime(e).getTime; (t, t, 1L) }).toVector
          val merged = (prior ++ fresh).sortBy(s => (s._1, s._2)).foldLeft(
            Vector.empty[(Long, Long, Long)]) {
            case (acc :+ last, s) if s._1 - last._2 <= gapMs =>
              acc :+ ((last._1, math.max(last._2, s._2), last._3 + s._3))
            case (acc, s) => acc :+ s
          }
          // a session is FINAL once the watermark passed end + gap: no
          // on-time event can extend or bridge it any more. This fires
          // both on the timeout callback and opportunistically on data.
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) = merged.partition(_._2 + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open.map(_._1).toArray, open.map(_._2).toArray,
              open.map(_._3).toArray))
            // wake when the earliest open session becomes provably final
            // (must be strictly beyond the current watermark)
            state.setTimeoutTimestamp(math.max(open.map(_._2).min + gapMs, wm + 1))
          }
          closed.iterator.map { case (s, e, n) =>
            (k, new Timestamp(s), new Timestamp(e), n)
          }
      }
  }
}
