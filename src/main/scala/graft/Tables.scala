package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every operator in the engine takes `(SparkSession, sfDir)` and reads
  * `$sfDir/<table>.parquet`; on a real cluster the same code reads the
  * distributed store path. Scans stay lazy so Catalyst pushes filters and
  * prunes columns into the parquet reader.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** Events with `ts` normalized to int64 UTC NANOSECONDS — the engine's
    * ts contract (every temporal operator does integer `ts div 1000` µs
    * arithmetic, and the DuckDB oracles read the same instants via
    * `epoch_us`/`epoch_ns`). Generator output has varied by round
    * between timestamp[ns] parquet (read raw via the `nanosAsLong`
    * session flag → already long) and timestamp[us] (read as
    * TIMESTAMP_NTZ → converted here; the session timezone is pinned
    * UTC, so the NTZ wall clock IS the epoch instant).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // Guard against a generator round writing plain int64 MICROS
        // with no timestamp logical type: that would be silently
        // mis-scaled 1000x here while the DuckDB oracles (epoch_us on
        // real timestamps) stay right. One sampled row per directory
        // (memoized) distinguishes ns-era (~1e18) from µs-era (~1e15).
        tsNanosChecked.computeIfAbsent(d, _ => {
          raw.select(col("ts")).limit(1).collect().headOption.foreach { r =>
            val v = math.abs(r.getLong(0))
            require(v > 1e16,
              s"events.ts at $d is int64 but |$v| is not nanosecond-era; " +
                "generator likely wrote epoch micros without a timestamp type")
          }
          java.lang.Boolean.TRUE
        })
        raw
      case _ => raw.withColumn(
        "ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
  }

  /** Directories whose int64 events.ts magnitude has been validated. */
  private val tsNanosChecked =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
