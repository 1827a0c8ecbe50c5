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
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = s"$dir/$name"
    // The repair is a full Spark read+write job and must NOT run inside
    // ConcurrentHashMap.compute (the Bucketing.memoBucketed rule: CHM
    // computations must be short and never re-enter the map — a long job
    // under a bin lock stalls unrelated Tables.apply calls from streaming
    // micro-batch threads, and deadlocks if the rewrite path ever touches
    // the memo). computeIfAbsent here only allocates a per-key lock
    // object; the check-then-repair critical section runs under that
    // per-key monitor, so concurrent first-accesses of DIFFERENT tables
    // repair in parallel and a second accessor of the SAME table waits
    // for one repair instead of launching a duplicate.
    val lock = layoutLocks.computeIfAbsent(key, _ => new AnyRef)
    val path = lock.synchronized {
      val prev = layoutFixed.get(key)
      if (prev != null) prev
      else {
        val p = repairLayout(spark, dir, name)
        layoutFixed.put(key, p)
        p
      }
    }
    spark.read.parquet(path)
  }

  /** Per-JVM repaired-layout memo: `dir/name` → path actually read. */
  private val layoutFixed =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-key lock objects guarding the repair critical section. */
  private val layoutLocks =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Ingest-side LAYOUT REPAIR (r15): a parquet file with ONE row group
    * caps every scan of it at ONE task no matter how many cores or
    * executors exist — the exact `single_task_risk` condition
    * etl_rowgroup_audit flags, measured for three rounds as the sf0.1
    * scan bottleneck (20 queries read the 10× corpus FASTER than sf0.1
    * in the r15 sweeps because the driver's sf0.1 files are single-RG).
    * Production fixes this at ingest: compact bad layouts ONCE, then
    * amortize over every downstream read (the Sinks.compact /
    * etl_compact_exec contract, applied to our own inputs). So: on the
    * first access of each table per JVM, a footer-only preflight (one
    * driver-side read of ~kB) detects the single-file single-row-group
    * ≥100k-row shape and rewrites it as 8 ORDER-PRESERVING chunk files
    * (coalesce(1) + maxRecordsPerFile — see the inline comment for why
    * repartition(32) was reverted) into per-JVM scratch; every later
    * scan of that table in this JVM gets 8 independent splits with the
    * original row order/locality intact chunk by chunk. Row SET is
    * identical, so row sets and integer/decimal-exact aggregates are
    * unchanged — the DuckDB oracles keep reading the original files.
    * CAVEAT (floating point): the repair turns a 1-partition scan into
    * up to 8, which reorders partial-aggregate combination, so any
    * query summing DOUBLES can drift by ulps between repair-on and
    * repair-off (the SPARK_GRAFT_NO_LAYOUT_REPAIR A/B) or versus
    * pre-repair rounds' hashes; the A/B validation for such queries
    * compares row sets with a numeric tolerance, not bit-exact hashes.
    * Multi-row-group files (the sf1 stress corpora),
    * directory outputs, and small tables pass through untouched, and
    * any preflight/rewrite failure falls back to the raw path.
    */
  private def repairLayout(s: SparkSession, dir: String, name: String): String = {
    val src = s"$dir/$name.parquet"
    // operational opt-out (also the A/B switch the repair's own
    // validation uses: same queries with and without repair must
    // produce identical row sets)
    if (sys.env.contains("SPARK_GRAFT_NO_LAYOUT_REPAIR")) return src
    try {
      val p = new org.apache.hadoop.fs.Path(src)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.getFileStatus(p).isFile) return src
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        p, s.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val (nrg, rows) = try {
        import scala.jdk.CollectionConverters._
        val b = r.getFooter.getBlocks.asScala.toSeq
        (b.size, b.map(_.getRowCount).sum)
      } finally r.close()
      if (nrg > 1 || rows < 100000L) return src
      val out = graft.etl.TmpDirs.dir(
        s"layout_${graft.etl.Bucketing.dirTag(dir)}_$name")
      // chunked split, NOT round-robin: one writer task emits ~8
      // sequential files via maxRecordsPerFile, so rows keep their
      // original order/locality (a generator-sorted events file stays
      // time-clustered chunk by chunk — zone-map friendly) and the
      // scan gets 8 independent splits. The first cut of this repair
      // used repartition(32) and measured a NET LOSS on the full
      // sweep: +1-1.6 s wins on the heavy aggs but a ~50-100 ms
      // per-query tax on ~150 small queries (2x total sweep CPU) from
      // per-task scan overhead at 3k-row partitions plus destroyed
      // row locality. 8 order-preserving chunks keep the parallel-scan
      // win where it matters and the tax negligible.
      s.read.parquet(src).coalesce(1).write
        .option("maxRecordsPerFile", math.max(1L, (rows + 7) / 8))
        .mode("overwrite").parquet(out)
      out
    } catch { case _: Throwable => src }
  }

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
