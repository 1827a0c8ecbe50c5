package graft

import org.apache.spark.sql.SparkSession

/** Single configuration point for every entry main (Verify, Bench, tests).
  *
  * The oracle-parity-critical settings live here so they cannot drift
  * between the correctness gate and the bench:
  *  - UTC session timezone (timestamps hash identically vs DuckDB),
  *  - `nanosAsLong` (events.parquet stores timestamp[ns]; Spark reads the
  *    raw int64 nanos, which is exactly DuckDB's `epoch_ns(ts)`),
  *  - AQE on (runtime skew/coalesce handling — the same knob a 1000-executor
  *    cluster run would rely on),
  *  - shuffle partitions sized to local cores, not the 200 default.
  */
object Session {
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
              Runtime.getRuntime.availableProcessors().toString)): SparkSession = {
    val s = SparkSession
      .builder()
      .withExtensions(new plans.GraftExtensions)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed-table data (catalog sinks, the bucketed dedup index)
      // lands in per-JVM scratch, not whatever cwd the caller ran from
      .config("spark.sql.warehouse.dir", etl.TmpDirs.dir("warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
