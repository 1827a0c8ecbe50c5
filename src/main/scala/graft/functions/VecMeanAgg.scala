package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-dimension mean of a float-vector column, as ONE
  * array-accumulating aggregate instead of a 64x posexplode into a
  * decimal hash aggregate (the centroid-training subtree the whole
  * vector stack shares).
  *
  * Parity contract (bit-matches the formulation it replaces and the
  * unchanged DuckDB oracles): each element takes the identical
  * double -> DECIMAL(18,12) cast path Spark's Cast uses —
  * BigDecimal.valueOf (shortest Double.toString form), setScale(12,
  * HALF_UP) — and the scaled units accumulate per dimension in a
  * 128-bit (hi, lo) two's-complement pair, so the sum is EXACT at any
  * group size (a single long would saturate at ~9.2M unit-norm rows
  * per group; hi:lo carries to ~1.7e26). finish() emits, per dim,
  * `new BigDecimal(BigInteger(hi:lo), 12).doubleValue / n` — the same
  * bits as `CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,12))) AS
  * DOUBLE) / COUNT(*)` because both divide the correctly-rounded
  * decimal total by the group count in IEEE double arithmetic.
  *
  * Null rows are skipped (a null array contributes no exploded rows in
  * the formulation this replaces); dimension mismatches fail loudly.
  */
final class VecMeanAgg
    extends Aggregator[Array[Float], VecMeanAgg.Buf, Array[Double]] {
  import VecMeanAgg.Buf

  override def zero: Buf = Buf(Array.emptyLongArray, Array.emptyLongArray, 0L)

  private def addScaled(hi: Array[Long], lo: Array[Long], i: Int,
                        vHi: Long, vLo: Long): Unit = {
    val newLo = lo(i) + vLo
    val carry =
      if (vLo != 0L && java.lang.Long.compareUnsigned(newLo, lo(i)) < 0) 1L
      else 0L
    lo(i) = newLo
    hi(i) = hi(i) + vHi + carry
  }

  override def reduce(buf: Buf, v: Array[Float]): Buf = {
    if (v == null) return buf
    val b =
      if (buf.n == 0L && buf.lo.isEmpty)
        Buf(new Array[Long](v.length), new Array[Long](v.length), 0L)
      else buf
    require(v.length == b.lo.length,
      s"VecMeanAgg: dims ${v.length} != ${b.lo.length}")
    var i = 0
    while (i < v.length) {
      val scaled = java.math.BigDecimal.valueOf(v(i).toDouble)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      addScaled(b.hi, b.lo, i, scaled >> 63, scaled)
      i += 1
    }
    Buf(b.hi, b.lo, b.n + 1L)
  }

  override def merge(a: Buf, b: Buf): Buf =
    if (a.n == 0L && a.lo.isEmpty) b
    else if (b.n == 0L && b.lo.isEmpty) a
    else {
      require(a.lo.length == b.lo.length,
        s"VecMeanAgg: dims ${a.lo.length} != ${b.lo.length}")
      var i = 0
      while (i < a.lo.length) {
        addScaled(a.hi, a.lo, i, b.hi(i), b.lo(i))
        i += 1
      }
      Buf(a.hi, a.lo, a.n + b.n)
    }

  override def finish(buf: Buf): Array[Double] =
    if (buf.n == 0L) null
    else {
      val out = new Array[Double](buf.lo.length)
      var i = 0
      while (i < buf.lo.length) {
        val bi = java.math.BigInteger.valueOf(buf.hi(i)).shiftLeft(64)
          .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(buf.lo(i))))
        out(i) = new java.math.BigDecimal(bi, 12).doubleValue() / buf.n.toDouble
        i += 1
      }
      out
    }

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

object VecMeanAgg {
  /** (hi, lo) 128-bit scaled sums per dimension + the group row count. */
  case class Buf(hi: Array[Long], lo: Array[Long], n: Long)

  /** Column form: exact per-dim means of an array<float> column. */
  def vecMean(c: Column): Column =
    org.apache.spark.sql.functions.udaf(
      new VecMeanAgg, ExpressionEncoder[Array[Float]]()).apply(c)
}
