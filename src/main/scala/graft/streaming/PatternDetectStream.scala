package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP-style two-step pattern detector: emit a match whenever an
  * `aType` event is FOLLOWED BY a `bType` event from the same user
  * within `withinUs` event-time microseconds — the "view then purchase
  * inside 30 minutes" trigger marketing automation fires on.
  *
  * Semantics: the most recent un-consumed A arms the pattern; the
  * first qualifying B consumes it (non-overlapping matches — one
  * conversion per arm, re-arming requires a fresh A). A B with no
  * armed A, or one arriving after the window, emits nothing and
  * leaves state untouched.
  *
  * State per user is ONE long (the armed A's event time, MinValue =
  * disarmed): O(users) at any stream volume, no event buffering —
  * this is why the two-step pattern scales where a general NFA regex
  * engine would buffer candidate prefixes. Within a micro-batch,
  * events fold in (seq, type) order, so replays are deterministic;
  * the armed timestamp carries across batches (asserted in
  * StreamingSpec).
  */
object PatternDetectStream {

  case class Ev(user: String, seq_us: Long, etype: String)
  case class PState(armed_a_us: Long)
  case class Match(user: String, a_us: Long, b_us: Long, lag_us: Long)

  private val Disarmed = Long.MinValue

  /** Fold one user's micro-batch in event-time order; exposed for unit
    * tests.
    */
  def foldUser(user: String, evs: Seq[Ev], st: Option[PState],
               aType: String, bType: String, withinUs: Long): (Seq[Match], PState) = {
    var armed = st.map(_.armed_a_us).getOrElse(Disarmed)
    val out = Seq.newBuilder[Match]
    evs.sortBy(e => (e.seq_us, e.etype)).foreach { e =>
      if (e.etype == aType) {
        // A re-arms (the freshest A is the one the window measures from)
        armed = math.max(armed, e.seq_us)
      } else if (e.etype == bType && armed != Disarmed &&
          e.seq_us >= armed && e.seq_us - armed <= withinUs) {
        out += Match(user, armed, e.seq_us, e.seq_us - armed)
        armed = Disarmed
      }
    }
    (out.result(), PState(armed))
  }

  def apply(ds: Dataset[Ev], aType: String, bType: String,
            withinUs: Long): Dataset[Match] = {
    implicit val outEnc = Encoders.product[Match]
    implicit val stEnc  = Encoders.product[PState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: String, evs: Iterator[Ev], state: GroupState[PState]) =>
          val (out, st) = foldUser(user, evs.toSeq, state.getOption,
            aType, bType, withinUs)
          state.update(st)
          out.iterator
      }
  }
}
