package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization with explicit state — the streaming twin of
  * the batch `sessionize` query (gaps-and-islands, oracle-covered there).
  *
  * Sessions close when a later event arrives past the inactivity gap
  * (emitted immediately) or when the group times out (open session
  * flushed). State per user is one open session — O(users) state, the
  * shape that holds at any stream volume.
  */
object SessionizeStream {

  case class Ev(user_id: Long, ts_us: Long, value: Double)
  case class OpenSession(start_us: Long, end_us: Long, n_events: Long, sum_value: Double)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                        n_events: Long, sum_value: Double)

  /** Fold a user's batch of events into the open session, emitting every
    * session closed by a gap. Exposed for direct unit testing.
    */
  def foldUser(userId: Long, events: Seq[Ev], open: Option[OpenSession],
               gapUs: Long): (Seq[SessionOut], Option[OpenSession]) = {
    val sorted = events.sortBy(e => (e.ts_us, e.value))
    // The sort repairs disorder only WITHIN a batch. An event older than
    // the carried session's end would mean cross-batch disorder (a later
    // micro-batch delivering earlier event time) — that would silently
    // mis-sessionize, so fail loudly instead: the source must feed
    // batches in event-time order (one-batch AvailableNow, or
    // watermark-ordered ingestion).
    for (s <- open; e <- sorted.headOption)
      require(e.ts_us >= s.end_us,
        s"cross-batch event-time disorder for user $userId: " +
          s"event at ${e.ts_us} precedes open-session end ${s.end_us}")
    var cur = open
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts_us - s.end_us <= gapUs =>
          cur = Some(OpenSession(s.start_us, e.ts_us, s.n_events + 1, s.sum_value + e.value))
        case Some(s) =>
          closed += SessionOut(userId, s.start_us, s.end_us, s.n_events, s.sum_value)
          cur = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
        case None =>
          cur = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
      }
    }
    (closed.result(), cur)
  }

  /** Streaming form: groupByKey(user) + flatMapGroupsWithState.
    *
    * Default NoTimeout: sessions close when a later event arrives past
    * the gap. Production deployments pass ProcessingTimeTimeout to also
    * flush sessions for users that go silent (timer batches keep the
    * query ticking, which is why it is not the test default).
    */
  def apply(ds: Dataset[Ev], gapUs: Long,
            timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
            timeoutMs: Long = 1000L): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc  = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (userId: Long, events: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.start_us, s.end_us, s.n_events, s.sum_value))
          } else {
            val (closed, open) = foldUser(userId, events.toSeq, state.getOption, gapUs)
            open match {
              case Some(s) =>
                state.update(s)
                if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
                  state.setTimeoutDuration(timeoutMs)
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }
}
