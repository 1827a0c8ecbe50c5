package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming z-score anomaly detector — the stateful twin of the batch
  * `events_anomaly_zscore` query (oracle-covered there).
  *
  * Each point is tested against the moments of the points seen BEFORE
  * it, so an outlier can't mask itself. The 3-sigma test runs entirely
  * in integers: |x - s/n| > 3*sd is cross-multiplied to
  * (n*x - s)^2 > 9 * (n*s2 - s^2), so there is no float in the state
  * or the verdict, and replays are bit-deterministic. State per key is
  * FOUR integer scalars (n, sum, sum of squares, last seq): O(keys) at
  * any stream volume. A warm-up floor (min_n) suppresses alarms until
  * the baseline has enough mass.
  */
object ZscoreStream {

  case class Pt(key: String, seq_us: Long, value: Long)
  case class ZState(n: Long, s: Long, s2: Long, last_seq: Long)
  case class Anomaly(key: String, seq_us: Long, value: Long, n_prior: Long)

  /** Fold one key's micro-batch in seq order; exposed for unit tests. */
  def foldKey(key: String, pts: Seq[Pt], st: Option[ZState],
              minN: Long): (Seq[Anomaly], ZState) = {
    var s = st.getOrElse(ZState(0L, 0L, 0L, Long.MinValue))
    val out = Seq.newBuilder[Anomaly]
    pts.sortBy(p => (p.seq_us, p.value)).foreach { p =>
      if (s.n >= minN) {
        val dev = s.n * p.value - s.s            // n*(x - mean)
        val nvar = s.n * s.s2 - s.s * s.s        // n^2 * variance
        if (dev * dev > 9L * nvar)               // (x-mean)^2 > 9*var, times n^2
          out += Anomaly(key, p.seq_us, p.value, s.n)
      }
      s = ZState(s.n + 1, s.s + p.value, s.s2 + p.value * p.value,
        math.max(s.last_seq, p.seq_us))
    }
    (out.result(), s)
  }

  def apply(ds: Dataset[Pt], minN: Long = 5L): Dataset[Anomaly] = {
    implicit val outEnc = Encoders.product[Anomaly]
    implicit val stEnc  = Encoders.product[ZState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, pts: Iterator[Pt], state: GroupState[ZState]) =>
          val (out, st) = foldKey(key, pts.toSeq, state.getOption, minN)
          state.update(st)
          out.iterator
      }
  }
}
