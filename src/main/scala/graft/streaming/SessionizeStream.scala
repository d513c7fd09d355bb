package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session state: [start, end] in epoch millis + event count.
  * Top-level (not nested in the object): the state encoder's generated
  * code constructs it reflectively, and nested/private classes trip
  * Janino's constructor resolution. */
private[graft] case class OpenSession(start: Long, end: Long, n: Long)

/** Streaming gap-based sessionization with CUSTOM state — the streaming
  * twin of the batch gaps-and-islands query (q86) and the third point on
  * the session triangle next to `session_window` (q65): sessions are
  * held open in `flatMapGroupsWithState` state and emitted exactly once,
  * when they CLOSE — either because a later event of the same key
  * arrives more than `gapMs` after the session's end, or because the
  * event-time watermark passes end+gap with no successor (event-time
  * timeout). Append-mode output of final sessions is what a production
  * pipeline wants to sink (session_window in append mode needs the
  * watermark too, but cannot carry arbitrary per-session state — this
  * operator can, which is the point of the custom-state API).
  *
  * Scale shape: state lives in the state store, partitioned by key —
  * one shuffle per micro-batch on the grouping key, state size O(open
  * sessions), timeouts garbage-collect every idle key, and nothing ever
  * reaches the driver. The caller MUST set a watermark on the event-time
  * column upstream (event-time timeout requires it).
  */
object SessionizeStream {

  /** @param ds        watermarked input stream
    * @param key       session grouping key
    * @param eventTime event-time accessor (the watermarked column)
    * @param gapMs     inactivity gap that closes a session
    * @return closed sessions, append-mode-safe (each emitted exactly once)
    */
  def byGap[T, K: Encoder](ds: Dataset[T], key: T => K, eventTime: T => Timestamp,
                           gapMs: Long): Dataset[(K, Timestamp, Timestamp, Long)] = {
    require(gapMs > 0, s"session gap must be positive, got $gapMs ms")
    implicit val openEnc: Encoder[OpenSession] = Encoders.product[OpenSession]
    implicit val outEnc: Encoder[(K, Timestamp, Timestamp, Long)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.TIMESTAMP, Encoders.TIMESTAMP,
        Encoders.scalaLong)
    ds.groupByKey(key)
      .flatMapGroupsWithState[OpenSession, (K, Timestamp, Timestamp, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: K, evs: Iterator[T], state: GroupState[OpenSession]) =>
          def emit(s: OpenSession) = (k, new Timestamp(s.start), new Timestamp(s.end), s.n)
          if (state.hasTimedOut) {
            // watermark passed end+gap with no successor event: final
            val s = state.get
            state.remove()
            Iterator.single(emit(s))
          } else {
            // batch events may extend the open session, or close it and
            // open later ones (sorted: batch order is not time order)
            val times = evs.map(eventTime(_).getTime).toArray
            java.util.Arrays.sort(times)
            val closed = Vector.newBuilder[(K, Timestamp, Timestamp, Long)]
            var cur = state.getOption
            times.foreach { t =>
              cur = cur match {
                case Some(s) if t - s.end <= gapMs =>
                  // events at/before the watermark can still arrive here;
                  // max() keeps the session end monotone
                  Some(OpenSession(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed += emit(s)
                  Some(OpenSession(t, t, 1))
                case None =>
                  Some(OpenSession(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire once the watermark proves no in-gap successor exists
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
