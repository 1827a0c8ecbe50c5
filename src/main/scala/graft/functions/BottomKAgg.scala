package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}

/** Typed custom aggregate: keep the k SMALLEST long values per group —
  * the bottom-k sketch. Over a uniform hash of record ids this is a
  * deterministic uniform sample (the classic alternative to seeded
  * reservoir sampling: same k rows on every run, every engine), and the
  * union of two groups' sketches is the sketch of the union, so it
  * merges map-side like any algebraic aggregate.
  *
  * Demonstrates the `Aggregator` route from SURVEY §4 for custom
  * aggregation state (bounded k-slot buffer). Scalar hot paths stay
  * builtin/codegen; aggregates with nontrivial state use this API, not
  * row-at-a-time UDFs.
  */
final class BottomKAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    if (buf.length < k) (buf :+ v).sorted
    else if (v < buf(k - 1)) { val b = buf.clone(); b(k - 1) = v; b.sorted }
    else buf

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    (a ++ b).sorted.take(k)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object BottomKAgg {
  /** Column form: bottom-k of a long column. */
  def bottomK(c: Column, k: Int): Column =
    org.apache.spark.sql.functions.udaf(new BottomKAgg(k)).apply(c)
}
