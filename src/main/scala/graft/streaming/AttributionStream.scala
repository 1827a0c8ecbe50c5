package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the stateful twin of the batch
  * `events_attribution` query (oracle-covered there).
  *
  * State per user is ONE scalar pair (the latest click's id and time):
  * O(users) state at any stream volume, the same greedy-optimal
  * property the batch window relies on (a later click always
  * supersedes an earlier one, so only the newest needs keeping).
  * Purchases emit immediately with the credited click when it falls
  * inside the lookback, or unattributed otherwise.
  */
object AttributionStream {

  case class Ev(user_id: Long, ts_us: Long, event_id: Long, event_type: String)
  case class LastClick(click_id: Long, click_us: Long)
  case class Attribution(user_id: Long, purchase_id: Long, purchase_us: Long,
                         click_id: Option[Long], delta_us: Option[Long])

  /** Fold one user's micro-batch: clicks update state, purchases emit.
    * Events sort by (ts, event_id) — the batch query's sequence order —
    * so intra-batch ordering matches regardless of arrival order.
    * Exposed for direct unit testing.
    */
  def foldUser(userId: Long, events: Seq[Ev], last: Option[LastClick],
               lookbackUs: Long): (Seq[Attribution], Option[LastClick]) = {
    val sorted = events.sortBy(e => (e.ts_us, e.event_id))
    var cur = last
    val out = Seq.newBuilder[Attribution]
    sorted.foreach { e =>
      e.event_type match {
        case "click" => cur = Some(LastClick(e.event_id, e.ts_us))
        case "purchase" =>
          val credited = cur.filter(c => e.ts_us - c.click_us <= lookbackUs)
          out += Attribution(userId, e.event_id, e.ts_us,
            credited.map(_.click_id), credited.map(c => e.ts_us - c.click_us))
        case _ => ()
      }
    }
    (out.result(), cur)
  }

  def apply(ds: Dataset[Ev], lookbackUs: Long): Dataset[Attribution] = {
    implicit val outEnc = Encoders.product[Attribution]
    implicit val stEnc  = Encoders.product[LastClick]
    implicit val keyEnc = Encoders.scalaLong
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, events: Iterator[Ev], state: GroupState[LastClick]) =>
          val (out, cur) = foldUser(userId, events.toSeq, state.getOption, lookbackUs)
          cur.foreach(state.update)
          out.iterator
      }
  }
}
