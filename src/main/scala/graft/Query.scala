package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered operator: the Spark query plus (when SQL-expressible)
  * the DuckDB oracle statement the driver hash-compares against.
  */
final case class Query(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None
)

/** Cross-engine determinism helpers.
  *
  * The driver's correctness gate hash-compares Spark output against DuckDB
  * running `oracleSql` on the same parquet — so every float must be
  * BIT-identical, not "close". Policy:
  *
  *  - Never `sum(double)`: partition order makes the last ulp
  *    nondeterministic even Spark-vs-Spark. Instead cast to
  *    `decimal(18,6)` (exact for the source data's precision), sum
  *    exactly (order-independent), then emit `double`. DuckDB mirror:
  *    `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`.
  *  - Averages/stats are derived from those exact decimal sums with plain
  *    IEEE double arithmetic — identical operand bits in both engines give
  *    identical results, no rounding fudge needed.
  *  - Dates/timestamps leave the plan as strings (`yyyy-MM-dd`) or epoch
  *    longs; raw timestamp encodings differ across engines.
  *  - Anything order-sensitive (top-k, row_number) always carries a unique
  *    tiebreak key so the emitted ROW SET is deterministic.
  */
/** The driver's correctness-gate data dir (TESTDATA.md: the harness runs
  * Verify at sf=0.01). The ONE oracle that must name a filesystem path —
  * etl_rowgroup_audit, whose subject is the parquet FILES, not the table
  * rows — derives it from here instead of a scattered string literal, so
  * pointing the gate elsewhere is a one-line change.
  */
object Gate {
  val dir: String = "/root/testdata/sf0.01"
}

object Parity {
  /** Exact order-independent sum of a double column, emitted as double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")

  /** Exact sum of a wider product term (e.g. price*price up to ~1e10).
    * Scale 4 keeps unscaled element values within long range so the
    * decimal sum stays on Spark's compact fast path.
    */
  def dsumWide(c: Column): Column = sum(c.cast("decimal(26,4)")).cast("double")

  /** Mean via exact sum / count — both operands bit-identical cross-engine. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
