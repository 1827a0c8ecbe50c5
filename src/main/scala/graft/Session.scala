package graft

import org.apache.spark.sql.SparkSession

/** Single configuration point for every entry main (Verify, Bench, tests).
  *
  * The oracle-parity-critical settings live here so they cannot drift
  * between the correctness gate and the bench:
  *  - UTC session timezone (timestamps hash identically vs DuckDB),
  *  - `nanosAsLong` (when events.parquet stores timestamp[ns], Spark reads
  *    the raw int64 nanos — exactly DuckDB's `epoch_ns(ts)`; either way
  *    `Tables.events` normalizes ts to int64 UTC nanos),
  *  - AQE on (runtime skew/coalesce handling — the same knob a 1000-executor
  *    cluster run would rely on),
  *  - shuffle partitions sized to local cores, not the 200 default.
  */
object Session {
  /** @param icuCaseMappings re-enable Spark 4's ICU-backed lower/upper
    *   (Turkish dotted-I, final sigma, ligatures) for callers whose
    *   corpus needs full Unicode case semantics more than it needs to
    *   dodge the ICU static-init tax documented below. Default false =
    *   Spark 3.x JVM simple case mapping, byte-identical on ASCII-ish
    *   corpora and to DuckDB's lower().
    */
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
              Runtime.getRuntime.availableProcessors().toString),
            icuCaseMappings: Boolean = false): SparkSession = {
    val s = SparkSession
      .builder()
      .withExtensions(new plans.GraftExtensions)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark 4's ICU case mappings route every lower()/upper() through
      // CollationAwareUTF8String, whose STATIC INIT builds a titlecase
      // table by calling UCharacter.toTitleCase on all 1,114,112 code
      // points (a fresh BreakIterator per call) — a per-JVM tax on the
      // first case-mapped row: ~4s with a healthy JIT, observed minutes
      // when the compiler is busy/starved (exactly the state of a busy
      // executor mid-job). JVM simple case mapping (the Spark 3.x
      // behavior) is byte-identical on this corpus and matches DuckDB's
      // lower(); flip back via the icuCaseMappings builder flag if
      // Turkish-dotted-I / final-sigma semantics matter more than the
      // init tax. Trade-off also surfaced in README ("Unicode case
      // semantics").
      .config("spark.sql.icu.caseMappings.enabled", icuCaseMappings.toString)
      // HotSpot refuses to JIT methods over 8000 bytecodes
      // (-XX:DontCompileHugeMethods), but Spark's default
      // hugeMethodLimit (65535) happily EMITS them — the stage then
      // runs interpreted-bytecode forever. Measured here on the k=100
      // literal-centroid assignment expression (pipeline_semdedup /
      // ann_ivf_trained at sf0.1): whole suite healthy with the limit
      // at 8000 (semdedup 4.9s); the huge emitted method left the same
      // stage orders of magnitude slower. With the limit at 8000 Spark
      // falls back to volcano eval for exactly the stages the JIT
      // would abandon. Ships with the library onto any cluster.
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      // managed-table data (catalog sinks, the bucketed dedup index)
      // lands in per-JVM scratch, not whatever cwd the caller ran from
      .config("spark.sql.warehouse.dir", etl.TmpDirs.dir("warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
