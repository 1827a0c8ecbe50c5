package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key rate limiter — the admission-control primitive an
  * ingestion front door runs against scrapers and runaway producers
  * (the stateful cousin of the batch `events_bot_burst` audit).
  *
  * Fixed-window limiting on EVENT time: each key may admit at most
  * `limit` events per `windowUs` of seq time; excess events emit a
  * dropped=1 decision row (so downstream can count shed load per key).
  * State per key is TWO integer scalars (current window start, count
  * in window): O(keys) at any stream volume, and because the window
  * derives from event time, a replay of the same data reproduces the
  * same admit/drop decisions bit for bit — processing time never
  * enters the verdict.
  */
object RateLimitStream {

  case class Pt(key: String, seq_us: Long, value: Long)
  case class LimState(win_start: Long, in_win: Long)
  case class Decision(key: String, seq_us: Long, value: Long, dropped: Long)

  /** Fold one key's micro-batch in seq order; exposed for unit tests. */
  def foldKey(key: String, pts: Seq[Pt], st: Option[LimState],
              limit: Long, windowUs: Long): (Seq[Decision], LimState) = {
    var s = st.getOrElse(LimState(Long.MinValue, 0L))
    val out = Seq.newBuilder[Decision]
    pts.sortBy(p => (p.seq_us, p.value)).foreach { p =>
      val win = Math.floorDiv(p.seq_us, windowUs) * windowUs
      if (win != s.win_start) s = LimState(win, 0L)
      val admit = s.in_win < limit
      out += Decision(key, p.seq_us, p.value, if (admit) 0L else 1L)
      if (admit) s = s.copy(in_win = s.in_win + 1)
    }
    (out.result(), s)
  }

  def apply(ds: Dataset[Pt], limit: Long, windowUs: Long): Dataset[Decision] = {
    implicit val outEnc = Encoders.product[Decision]
    implicit val stEnc  = Encoders.product[LimState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, pts: Iterator[Pt], state: GroupState[LimState]) =>
          val (out, st) = foldKey(key, pts.toSeq, state.getOption, limit, windowUs)
          state.update(st)
          out.iterator
      }
  }
}
