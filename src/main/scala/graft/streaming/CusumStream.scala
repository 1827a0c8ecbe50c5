package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM change-point detector (Page 1954) — the stateful
  * twin of the batch `events_cusum` query (oracle-covered there).
  *
  * The batch form detects drift against the series' own mean; online,
  * the mean isn't knowable, so the streaming form runs the standard
  * reference-value CUSUM: residual = value - target, and the alarm
  * statistic max(0, S_t) is kept as (cumulative sum - running minimum)
  * — the same recurrence-free re-expression the batch query pins, so
  * every state transition is two integer adds and a min. State per key
  * is THREE scalars (cum, minCum, lastSeq): O(keys) at any stream
  * volume. Points emit an alarm row whenever the statistic exceeds the
  * threshold; arrival order within a micro-batch is repaired by the
  * (seq, value) sort, and cross-batch order is the stream's problem
  * (watermark + ordered sources), exactly like the batch twin's
  * day-grain ordering.
  */
object CusumStream {

  case class Pt(key: String, seq_us: Long, value: Long)
  case class CusumState(cum: Long, min_cum: Long, last_seq: Long)
  case class Alarm(key: String, seq_us: Long, stat: Long, cum: Long)

  /** Fold one key's micro-batch in seq order; exposed for unit tests. */
  def foldKey(key: String, pts: Seq[Pt], st: Option[CusumState],
              target: Long, threshold: Long): (Seq[Alarm], CusumState) = {
    var s = st.getOrElse(CusumState(0L, 0L, Long.MinValue))
    val out = Seq.newBuilder[Alarm]
    pts.sortBy(p => (p.seq_us, p.value)).foreach { p =>
      val cum = s.cum + (p.value - target)
      val minCum = math.min(s.min_cum, cum)
      val stat = cum - minCum
      if (stat > threshold) out += Alarm(key, p.seq_us, stat, cum)
      s = CusumState(cum, minCum, math.max(s.last_seq, p.seq_us))
    }
    (out.result(), s)
  }

  def apply(ds: Dataset[Pt], target: Long, threshold: Long): Dataset[Alarm] = {
    implicit val outEnc = Encoders.product[Alarm]
    implicit val stEnc  = Encoders.product[CusumState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, pts: Iterator[Pt], state: GroupState[CusumState]) =>
          val (out, st) = foldKey(key, pts.toSeq, state.getOption, target, threshold)
          state.update(st)
          out.iterator
      }
  }
}
