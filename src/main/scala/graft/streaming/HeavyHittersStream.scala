package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters per key via the SPACE-SAVING sketch (Metwally
  * et al. 2005) — bounded-memory "trending items now", the stream twin
  * of the batch top-k family (`text_ngram_topk`, `window_topk_per_group`).
  *
  * Exact streaming top-k needs O(distinct items) state — unbounded on a
  * 100 TB stream. Space-saving keeps exactly `cap` counters per key:
  * a tracked item increments; an untracked item REPLACES the minimum
  * counter, inheriting its count as the overestimation error. The
  * classic guarantees hold: tracked count_max overestimates the true
  * count by at most err, and any item with true frequency > N/cap is
  * guaranteed tracked. State per key is <= cap (item, count, err)
  * triples — O(keys * cap) regardless of stream volume.
  *
  * Determinism: arrival order within a micro-batch is repaired by the
  * (seq_us, item) sort, and the evicted minimum is chosen by
  * (count, item) order — re-running a batch replays identically, which
  * the checkpoint-restart test relies on. Each micro-batch emits the
  * key's current top-`emitK` snapshot stamped with the max seq seen
  * (Append mode, monotone as_of_us — the OhlcStream convention).
  */
object HeavyHittersStream {

  case class Evt(key: String, seq_us: Long, item: String)
  case class Slot(item: String, count: Long, err: Long)
  case class HHState(slots: Seq[Slot], n_seen: Long, last_seq: Long)
  case class HH(key: String, item: String, count_max: Long, count_min: Long,
                rank: Long, n_seen: Long, as_of_us: Long)

  /** Fold one key's micro-batch in seq order; exposed for unit tests. */
  def foldKey(key: String, evts: Seq[Evt], st: Option[HHState],
              cap: Int, emitK: Int): (Seq[HH], HHState) = {
    val s = st.getOrElse(HHState(Seq.empty, 0L, Long.MinValue))
    val slots = scala.collection.mutable.Map[String, (Long, Long)](
      s.slots.map(sl => sl.item -> (sl.count, sl.err)): _*)
    var nSeen = s.n_seen
    var lastSeq = s.last_seq
    evts.sortBy(e => (e.seq_us, e.item)).foreach { e =>
      nSeen += 1
      lastSeq = math.max(lastSeq, e.seq_us)
      slots.get(e.item) match {
        case Some((c, err)) => slots(e.item) = (c + 1, err)
        case None if slots.size < cap => slots(e.item) = (1L, 0L)
        case None =>
          val (minItem, (minC, _)) =
            slots.minBy { case (it, (c, _)) => (c, it) }
          slots.remove(minItem)
          slots(e.item) = (minC + 1, minC)
      }
    }
    val ordered = slots.toSeq
      .map { case (it, (c, err)) => Slot(it, c, err) }
      .sortBy(sl => (-sl.count, sl.item))
    val out = ordered.take(emitK).zipWithIndex.map { case (sl, i) =>
      HH(key, sl.item, sl.count, sl.count - sl.err, i + 1L, nSeen, lastSeq)
    }
    (out, HHState(ordered, nSeen, lastSeq))
  }

  def apply(ds: Dataset[Evt], cap: Int, emitK: Int): Dataset[HH] = {
    implicit val outEnc = Encoders.product[HH]
    implicit val stEnc  = Encoders.product[HHState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, evts: Iterator[Evt], state: GroupState[HHState]) =>
          val (out, st) = foldKey(key, evts.toSeq, state.getOption, cap, emitK)
          state.update(st)
          out.iterator
      }
  }
}
