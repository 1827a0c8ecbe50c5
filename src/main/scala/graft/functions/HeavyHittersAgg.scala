package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator`: bounded
  * k-counter state with the classic guarantees — any item with true
  * frequency > n/(k+1) is PRESENT in the sketch, and each reported
  * count undercounts the truth by at most n/(k+1). Constant memory per
  * group regardless of cardinality, and the merge is the standard
  * sketch-combine (sum counts, then decrement-and-evict down to k), so
  * it runs map-side partial like any algebraic aggregate — the O(1)
  * answer to "top terms per group" when exact counting would shuffle
  * the whole vocabulary.
  *
  * Deterministic given any input order? No — like every MG sketch the
  * COUNTS depend on arrival order, but the k-coverage guarantee does
  * not, which is what QualitySpec asserts (the registered sketch ops
  * are rows-only for exactly this reason).
  */
final class HeavyHittersAgg(k: Int)
  extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    if (buf.contains(v)) buf.updated(v, buf(v) + 1)
    else if (buf.size < k) buf.updated(v, 1L)
    else { // decrement all; evict zeros (the Misra-Gries step)
      buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(key => key -> (a.getOrElse(key, 0L) + b.getOrElse(key, 0L))).toMap
    if (summed.size <= k) summed
    else { // keep top k by (count, key) and subtract the (k+1)-th count
      val cut = summed.toSeq.sortBy { case (key, n) => (-n, key) }
      val threshold = cut(k)._2
      cut.take(k).map { case (key, n) => key -> (n - threshold) }
        .filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object HeavyHittersAgg {
  /** Column form: Misra-Gries top candidates of a string column. */
  def heavyHitters(c: Column, k: Int): Column =
    org.apache.spark.sql.functions.udaf(new HeavyHittersAgg(k)).apply(c)
}
