package graft.streaming

import graft.Query
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

/** The streaming BATCH-TWIN gate: seven §2.8 components run as REAL
  * Structured Streaming queries (readStream parquet source →
  * stateful/stateless operators → sink) in Trigger.AvailableNow over
  * the driver's tables, and the flushed sink contents register as
  * ordinary query entries with DuckDB oracles — covering every major
  * operator class: windowed agg, min_by/max_by bars, dedup→agg
  * chains, flatMapGroupsWithState, dropDuplicatesWithinWatermark,
  * stream-static joins, and watermarked stream-stream interval
  * joins. This closes the
  * "spec-proven only" asterisk on the streaming family: the specs pin
  * per-batch semantics with MemoryStream; these entries prove the SAME
  * component, end-to-end through the streaming engine, produces the
  * batch answer on real data — the Dataflow/Beam batch-streaming
  * unification contract (reference: local_directrunner_pipeline.py
  * runs one pipeline in either mode).
  *
  * Output-mode discipline: single-aggregation components run COMPLETE
  * mode (the final state table equals the batch answer exactly); the
  * dedup→agg chain (WindowedDistinctStream) runs APPEND — its contract
  * is "emit each window once, when the watermark passes it", so the
  * oracle mirrors the finalized-window cut: windows whose end exceeds
  * the final watermark (max event time at delay 0) are EXPECTED
  * absent. Both modes are scale-honest: state is per-open-window, the
  * parquet source streams files incrementally, and nothing here
  * collects to the driver.
  */
object StreamTwinQueries {

  private val seq = new java.util.concurrent.atomic.AtomicInteger()

  /** A CLONED session for one twin run (r17, closing the r16 ADVICE
    * gap): the state-store partition tune is a session conf, and
    * setting it on the SHARED session — even save/restored under a
    * lock — leaked 4 shuffle partitions to any batch query another
    * thread issued mid-twin. `newSession()` shares the SparkContext
    * and cached data but owns its conf, so the override is invisible
    * outside the twin by construction instead of by a documented
    * no-concurrent-batch invariant. Every frame in a twin body
    * (stream source, static join sides, sink post-processing) builds
    * against the clone — Tables reads fresh per call, so nothing
    * crosses sessions.
    */
  private def twinSession(s: SparkSession): SparkSession = {
    val ss = s.newSession()
    // State-store sizing (r16, VERDICT r15 #8): a stateful micro-batch
    // loads, updates, commits and snapshots ONE state store PER shuffle
    // partition PER stateful operator — at the batch sizes these twins
    // process (≤100k rows split over ≤4 AvailableNow batches) the
    // box-wide 32 partitions are ~800 rows of state work plus 31
    // partitions of pure store-lifecycle overhead each batch. Sizing
    // state partitions to the stream's throughput is the standard
    // production tune (a per-query deployment choice; results are
    // partition-count-independent, and the cross-batch oracle —
    // cadence, watermarks, state carry, checkpoints — is untouched).
    ss.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"))
    ss
  }

  /** ORDERING CONTRACT (shared by every flatMapGroupsWithState twin
    * below): the fold components repair arrival order by sorting
    * WITHIN a micro-batch, so the twins are exact batch equivalents
    * only when the whole table arrives as ONE micro-batch. That holds
    * here by construction — each table is a single parquet file and no
    * maxFilesPerTrigger is set, so AvailableNow drains it in one batch
    * (asserted for the engine generally by the checkpoint-restart
    * spec, which DOES split batches and exercises cross-batch state
    * carry). A multi-file production source needs the watermark-
    * ordered ingestion the components' scaladocs describe; feeding
    * disordered multi-batch input would mis-fold exactly like feeding
    * a disordered file to the batch query.
    */

  /** Escape glob metacharacters in a literal path so the streaming
    * file source treats it verbatim (the data dir itself may contain
    * [, ], *, {) — then the trailing char-class glob on the FILENAME
    * makes the source list the single file as a one-file directory.
    */
  private def globSafe(dir: String): String =
    dir.replaceAll("([\\[\\]{}*?\\\\])", "\\\\$1")

  /** Streaming read of the events table with the SAME ts normalization
    * contract as graft.Tables.events (int64 UTC nanos), plus an
    * event-time TIMESTAMP column `ts_t` (µs grain — hour/day windows
    * land on identical boundaries in either unit) for
    * watermark/window assignment.
    */
  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    val schema = s.read.parquet(s"$d/events.parquet").schema
    // the streaming file source lists a DIRECTORY (or glob) — the
    // single-file layout streams via a char-class glob on the filename
    val raw = s.readStream.schema(schema).parquet(s"${globSafe(d)}/events.parque[t]")
    val nanos = schema("ts").dataType match {
      case LongType => raw
      case _ => raw.withColumn(
        "ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
    nanos.withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
  }

  /** Events rewritten as 4 TIME-SLICED parquet files and read back as a
    * MULTI-BATCH stream (maxFilesPerTrigger=1): slice i holds ts_us =
    * ts div 1000 in [cut(i), cut(i+1)) on the global MICROSECOND
    * quartile cuts — the µs grain is the one every fold component and
    * oracle tie-breaks on, so events equal at µs can never straddle a
    * boundary (even if a generator round writes sub-µs-distinct nanos)
    * and every event in batch k+1 is strictly later AT µS GRAIN than
    * every event in batches <= k. Slice files get strictly ascending
    * modification times, planted through the Hadoop FS layer
    * (FileSystem.setTimes — the etl_rowgroup_audit rule: fixture
    * plumbing must not silently assume a POSIX local mount) — the
    * streaming file source processes files in modTime order, so
    * delivery IS chronological: the watermark-ordered ingestion the
    * fold components' scaladocs prescribe, realized as code.
    * Consequences the _mb twins ride on: fold state carries across
    * micro-batches with the disorder guards staying armed (any
    * delivery-order slip fails loudly), and a 0-delay watermark never
    * drops a row (the watermark after batch k is below every batch-k+1
    * event by construction). Column contract matches eventsStream:
    * int64 UTC-nanos `ts` + timestamp `ts_t`.
    */
  private val slicedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[streaming] def timeSlicedEventsStream(s: SparkSession, d: String): DataFrame = {
    // r15 (VERDICT r14 Next #4): the slice FILES are deterministic per
    // data dir but were rebuilt by every _mb twin — 11 twins x (one
    // percentile job + 4 filtered writes) of pure fixture tax in each
    // sweep. The build is now memoized per dir (computeIfAbsent gives
    // once-per-JVM semantics; the GraphEdges/trainedCentroids
    // precedent): each twin still gets a FRESH readStream over the
    // shared slices, so engine execution — micro-batch cadence,
    // watermark advance, state carry, checkpointing — is fully
    // re-exercised per query; only the redundant re-write is gone.
    val dir = slicedDirs.computeIfAbsent(d, _ => {
      val out = graft.etl.TmpDirs.dir(s"mbslice_${graft.etl.Bucketing.dirTag(d)}")
      val evb = graft.Tables.events(s, d)
      val cuts = evb.agg(expr("percentile(ts div 1000, array(0.25, 0.5, 0.75))"))
        .first().getSeq[Double](0).map(_.toLong)
      val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
      val hfs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      for (i <- 0 until 4) {
        val sd = s"$out/s$i"
        evb.filter(expr("ts div 1000") >= bounds(i) &&
            expr("ts div 1000") < bounds(i + 1))
          .coalesce(1).write.mode("overwrite").parquet(sd)
        hfs.listStatus(new org.apache.hadoop.fs.Path(sd))
          .filter(_.isFile)
          .foreach(st => hfs.setTimes(st.getPath, 1600000000000L + i * 60000L, -1L))
      }
      out
    })
    val schema = s.read.parquet(s"$dir/s0").schema
    s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(globSafe(dir) + "/s*/*.parquet")
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
  }

  /** Run `out` as a streaming query into an in-memory sink, block
    * until AvailableNow drains the source, return a DataFrame over the
    * sink contents. Hygiene (round-12 ADVICE): the checkpoint dir
    * lives under the per-JVM TmpDirs root and is deleted after the
    * query terminates, and the memory-sink temp view is dropped as
    * soon as the returned DataFrame has resolved against it — so a
    * bench loop neither grows /tmp nor accumulates driver-memory sink
    * tables beyond the one the caller still references.
    */
  private def runToTable(s: SparkSession, out: DataFrame,
                         mode: String): DataFrame = {
    val name = "graft_stream_twin_" + seq.incrementAndGet()
    val ckpt = graft.etl.TmpDirs.dir(name)
    // `s` here is the per-twin CLONED session (every registered twin fn
    // is wrapped in `twinSession` below), so the state-store partition
    // tune is already on this session's conf and nothing needs a
    // save/restore or a lock — the shared session never sees it.
    out.writeStream.format("memory").queryName(name)
      .outputMode(mode).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
      .awaitTermination()
    // Dataset creation analyzes eagerly, so the plan holds the sink
    // relation itself; dropping the catalog name afterwards frees the
    // name and lets the sink rows be GC'd once the caller lets go.
    val df = s.table(name)
    s.catalog.dropTempView(name)
    deleteRecursively(new java.io.File(ckpt))
    df
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** The registered twins: every body runs against a [[twinSession]]
    * clone so the stream-tuned conf never touches the shared session.
    */
  val entries: Seq[(String, Query)] =
    rawEntries.map { case (n, q) =>
      n -> q.copy(fn = (s, d) => q.fn(twinSession(s), d))
    }

  private def rawEntries: Seq[(String, Query)] = Seq(

    // WindowedAgg end-to-end: 1h tumbling count+sum per event type —
    // the streaming twin of window_tumbling, checked against the SAME
    // oracle shape. Complete mode: the sink table is the full window
    // state, which for a drained finite source IS the batch answer.
    "stream_window_tumbling" -> Query(
      (s, d) => {
        val out = WindowedAgg(eventsStream(s, d), "ts_t", "1 hour", "0 seconds")
        runToTable(s, out, "complete")
          .select(unix_micros(col("win_start")).*(1000L).as("win_start_ns"),
            col("event_type"), col("n"), col("sum_value"))
      },
      Some("""SELECT epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS win_start_ns, event_type,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)
    ),

    // MULTI-BATCH ingestion twin (round 13 — VERDICT r12 Next #4): the
    // same tumbling-window aggregate, but the source is REWRITTEN as 4
    // round-robin parquet files streamed one file per micro-batch
    // (maxFilesPerTrigger=1) — so the engine's cross-batch state carry
    // is what the oracle checks, not the one-batch shortcut the other
    // twins document. A complete-mode windowed aggregate is the right
    // component for disordered multi-batch arrival: its contract is
    // order-free (state accumulates until the source drains), unlike
    // the fold twins, whose disorder guard fails loudly instead
    // (SessionizeStream.foldUser require; StreamingSpec pins it).
    "stream_window_tumbling_mb" -> Query(
      (s, d) => {
        val dir = graft.etl.TmpDirs.dir(s"mbev_${graft.etl.Bucketing.dirTag(d)}")
        graft.Tables.events(s, d).repartition(4)
          .write.mode("overwrite").parquet(dir)
        val schema = s.read.parquet(dir).schema
        val ev = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(globSafe(dir))
          .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
        // the watermark delay must cover the source's disorder: the
        // round-robin files interleave the WHOLE corpus window, so the
        // delay spans it — the production rule (delay >= max disorder)
        // stated as code, not a lucky default
        val out = WindowedAgg(ev, "ts_t", "1 hour", "31 days")
        runToTable(s, out, "complete")
          .select(unix_micros(col("win_start")).*(1000L).as("win_start_ns"),
            col("event_type"), col("n"), col("sum_value"))
      },
      Some("""SELECT epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS win_start_ns, event_type,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)
    ),

    // OhlcStream end-to-end: daily OHLC bars per event type through
    // the streaming min_by/max_by windowed aggregate — the streaming
    // twin of window_ohlc (minus the turnover column, which the
    // streaming bar intentionally omits: six scalars of state per
    // bar). Complete mode, day index from the window start.
    "stream_window_ohlc" -> Query(
      (s, d) => {
        val ev = eventsStream(s, d)
          .select(col("ts_t").as("ts"), col("event_type").as("key"),
            col("event_id").as("id"), col("value"))
        val out = OhlcStream(ev, "1 day", "0 seconds")
        runToTable(s, out, "complete")
          .select(col("key").as("event_type"),
            expr("unix_micros(win_start) div 86400000000").as("day"),
            col("open"), col("high"), col("low"), col("close"), col("volume"))
      },
      Some("""WITH ev AS (SELECT event_type, "value" AS v, ts, event_id,
             |             epoch_us(ts) // 86400000000 AS di FROM events),
             |r AS (SELECT event_type, di, v,
             |        ROW_NUMBER() OVER (PARTITION BY event_type, di ORDER BY ts, event_id) AS rna,
             |        ROW_NUMBER() OVER (PARTITION BY event_type, di ORDER BY ts DESC, event_id DESC) AS rnd
             |      FROM ev)
             |SELECT event_type, di AS day,
             |  MAX(CASE WHEN rna = 1 THEN v END) AS open,
             |  MAX(v) AS high, MIN(v) AS low,
             |  MAX(CASE WHEN rnd = 1 THEN v END) AS close,
             |  COUNT(*) AS volume
             |FROM r GROUP BY 1, 2""".stripMargin)
    ),

    // SessionizeStream end-to-end: 6h-gap sessionization through
    // flatMapGroupsWithState — CUSTOM state (one open session per
    // user), not a built-in windowed agg, so this twin proves the
    // explicit-state path against the batch gaps-and-islands oracle.
    // APPEND semantics with NoTimeout: a session emits when a LATER
    // event closes it, so each user's final (still-open) session is
    // EXPECTED absent — the oracle drops each user's last session,
    // making the close-on-next-event contract itself gate-checked.
    // sum_value stays out of the checked projection (the fold
    // accumulates doubles in arrival order; Parity bans order-
    // dependent double sums from hash gates).
    "stream_sessionize" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val ev = eventsStream(s, d)
          .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
          .as[SessionizeStream.Ev](Encoders.product[SessionizeStream.Ev])
        val out = SessionizeStream(ev, 21600000000L)
        runToTable(s, out.toDF(), "append")
          .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
             |g AS (SELECT *, CASE WHEN tus - LAG(tus) OVER w > 21600000000
             |                       OR LAG(tus) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
             |sx AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM g),
             |ses AS (SELECT user_id, sess_id, COUNT(*) AS n_events,
             |          MIN(tus) AS start_us, MAX(tus) AS end_us
             |        FROM sx GROUP BY 1, 2),
             |mx AS (SELECT user_id, MAX(sess_id) AS last_sid FROM ses GROUP BY 1)
             |SELECT ses.user_id, start_us, end_us, n_events
             |FROM ses JOIN mx USING (user_id) WHERE ses.sess_id < mx.last_sid""".stripMargin)
    ),

    // MULTI-BATCH sessionize twin (round 13): the EXPLICIT-STATE fold
    // component (flatMapGroupsWithState) under cross-batch state
    // carry — the hardest streaming contract in the registry. Source =
    // timeSlicedEventsStream (4 chronological micro-batches); every
    // user whose session spans a slice boundary carries open-session
    // state across micro-batches, and the disorder guard
    // (SessionizeStream.foldUser's require) turns any delivery-order
    // slip into a loud failure instead of a silent mis-fold. Same
    // oracle as the one-batch twin: cross-batch carry must be
    // INVISIBLE in the answer.
    "stream_sessionize_mb" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val ev = timeSlicedEventsStream(s, d)
          .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
          .as[SessionizeStream.Ev](Encoders.product[SessionizeStream.Ev])
        val out = SessionizeStream(ev, 21600000000L)
        runToTable(s, out.toDF(), "append")
          .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
             |g AS (SELECT *, CASE WHEN tus - LAG(tus) OVER w > 21600000000
             |                       OR LAG(tus) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
             |sx AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM g),
             |ses AS (SELECT user_id, sess_id, COUNT(*) AS n_events,
             |          MIN(tus) AS start_us, MAX(tus) AS end_us
             |        FROM sx GROUP BY 1, 2),
             |mx AS (SELECT user_id, MAX(sess_id) AS last_sid FROM ses GROUP BY 1)
             |SELECT ses.user_id, start_us, end_us, n_events
             |FROM ses JOIN mx USING (user_id) WHERE ses.sess_id < mx.last_sid""".stripMargin)
    ),

    // EnrichStream end-to-end: the stream-static broadcast join —
    // events stream enriched with the customer dimension (user_id is
    // the generator's custkey space), rolled up per market segment in
    // complete mode. Proves the stateless per-micro-batch join path:
    // no watermark, no state, the dimension re-resolves per batch.
    // left_outer keeps users without a customer row (segment NULL →
    // the oracle's LEFT JOIN mirror), exact-decimal value sums.
    "stream_enrich" -> Query(
      (s, d) => {
        val dim = s.read.parquet(s"$d/customer.parquet")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        val enriched = EnrichStream(
          eventsStream(s, d).select(col("user_id"), col("value")), dim, "user_id")
        val out = enriched.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        runToTable(s, out, "complete")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events LEFT JOIN customer ON user_id = c_custkey
             |GROUP BY 1""".stripMargin)
    ),

    // StreamStreamJoin end-to-end: the watermarked stream-stream
    // interval join — every click matched to the same user's purchases
    // within one hour AFTER it, both sides streaming. Inner interval
    // joins emit matches as they are found (the watermark only bounds
    // STATE, and the 3h delay far exceeds the 1h match window, so
    // nothing evicts before it can match): the drained sink equals the
    // batch interval join exactly, no emission cut needed.
    "stream_stream_join" -> Query(
      (s, d) => {
        val ev = eventsStream(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts_t"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("ts_t"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts_t"))
        val out = StreamStreamJoin(clicks, buys, "user_id", "ts_t",
            windowSec = 3600, watermarkDelay = "3 hours")
          .select(col("l_key").as("user_id"),
            col("l.event_id").as("click_id"), col("r.event_id").as("purchase_id"))
        runToTable(s, out, "append")
      },
      Some("""WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
             |           WHERE event_type = 'click'),
             |p AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
             |      WHERE event_type = 'purchase')
             |SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
             |FROM c JOIN p ON c.user_id = p.user_id
             | AND p.tus >= c.tus AND p.tus <= c.tus + 3600000000""".stripMargin)
    ),

    // StreamingDedup end-to-end: exact content dedup through
    // dropDuplicatesWithinWatermark over an ingest stream of the
    // documents table (arrival clock = doc_id as µs — the monotone
    // ingest order). The checked projection is the HASH SET: the
    // streaming dedup keeps an arbitrary first-encountered row per
    // key (task order), so survivor doc_ids are not deterministic,
    // but one-row-per-distinct-content across micro-batches IS the
    // contract — and is exactly what the oracle checks. The watermark
    // delay (1h of synthetic clock) exceeds the corpus's whole doc_id
    // span, so no hash state evicts mid-run: the twin is global
    // first-wins dedup, the batch dedup_exact semantics.
    "stream_dedup" -> Query(
      (s, d) => {
        val path = s"$d/documents.parquet"
        val schema = s.read.parquet(path).schema
        val docs = s.readStream.schema(schema)
          .parquet(s"${globSafe(d)}/documents.parque[t]")
          // +1s offset: a clock starting AT epoch 0 puts the first doc
          // exactly on the initial watermark and it is dropped as late
          .withColumn("ts_t", timestamp_micros(col("doc_id") + 1000000L))
        val out = StreamingDedup(docs, "ts_t", "text", "1 hour")
          .select(col("content_hash").as("h"))
        runToTable(s, out, "append")
      },
      Some("SELECT DISTINCT md5(text) AS h FROM documents")
    ),

    // WindowedDistinctStream end-to-end: exact hourly distinct users
    // through the dedup→agg two-stateful-operator chain. APPEND mode
    // (complete does not cover streaming dedup): each window emits
    // once when the watermark passes its end, so the final watermark —
    // max event time at delay 0 — cuts the last open window(s); the
    // oracle applies the identical finalized-window condition, making
    // the append contract ITSELF part of what the gate checks.
    "stream_window_distinct" -> Query(
      (s, d) => {
        val out = WindowedDistinctStream(
          eventsStream(s, d), "ts_t", "user_id", "1 hour", "0 seconds")
        runToTable(s, out, "append")
          .select(unix_micros(col("win_start")).*(1000L).as("win_start_ns"),
            col("n_distinct_users"))
      },
      Some("""WITH mx AS (SELECT MAX(epoch_us(ts)) AS wm FROM events),
             |w AS (SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS ws_us, user_id
             |      FROM events)
             |SELECT ws_us * 1000 AS win_start_ns,
             |  COUNT(DISTINCT user_id) AS n_distinct_users
             |FROM w, mx WHERE ws_us + 3600000000 <= mx.wm
             |GROUP BY 1""".stripMargin)
    ),

    // MULTI-BATCH windowed-distinct twin (round 13): the WATERMARKED
    // APPEND dedup→agg chain under cross-batch carry. With
    // chronological slices and a 0-second delay, the watermark after
    // batch k sits below every batch-k+1 event (no late drops by
    // construction); an hour window straddling a slice cut holds both
    // its dedup keys and its aggregate state across the boundary, and
    // each finalized window still emits exactly once. The final
    // watermark equals the one-batch run's, so the finalized-window
    // oracle cut is IDENTICAL — cross-batch carry must be invisible.
    "stream_window_distinct_mb" -> Query(
      (s, d) => {
        val out = WindowedDistinctStream(
          timeSlicedEventsStream(s, d), "ts_t", "user_id", "1 hour", "0 seconds")
        runToTable(s, out, "append")
          .select(unix_micros(col("win_start")).*(1000L).as("win_start_ns"),
            col("n_distinct_users"))
      },
      Some("""WITH mx AS (SELECT MAX(epoch_us(ts)) AS wm FROM events),
             |w AS (SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS ws_us, user_id
             |      FROM events)
             |SELECT ws_us * 1000 AS win_start_ns,
             |  COUNT(DISTINCT user_id) AS n_distinct_users
             |FROM w, mx WHERE ws_us + 3600000000 <= mx.wm
             |GROUP BY 1""".stripMargin)
    ),

    // AttributionStream end-to-end: streaming last-touch attribution
    // through flatMapGroupsWithState — ONE LastClick scalar of state
    // per user. Every purchase emits (append) with the most recent
    // click within the 7-day lookback, or unattributed; a click at the
    // purchase's exact timestamp counts only when its event_id orders
    // BEFORE the purchase (the fold's (ts, event_id) sequence order),
    // which the oracle's tie predicate mirrors exactly.
    "stream_attribution" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val ev = eventsStream(s, d)
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id"), col("event_type"))
          .as[AttributionStream.Ev](Encoders.product[AttributionStream.Ev])
        val out = AttributionStream(ev, 604800000000L)
        runToTable(s, out.toDF(), "append")
          .select(col("user_id"), col("purchase_id"), col("purchase_us"),
            col("click_id"), col("delta_us"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events),
             |p AS (SELECT user_id, event_id AS purchase_id, tus AS p_us FROM e
             |      WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, event_id AS click_id, tus AS c_us FROM e
             |      WHERE event_type = 'click'),
             |j AS (SELECT p.purchase_id, c.click_id, c.c_us,
             |        ROW_NUMBER() OVER (PARTITION BY p.purchase_id
             |                           ORDER BY c.c_us DESC, c.click_id DESC) AS rn
             |      FROM p JOIN c ON p.user_id = c.user_id
             |       AND (c.c_us < p.p_us OR (c.c_us = p.p_us AND c.click_id < p.purchase_id))),
             |best AS (SELECT purchase_id, click_id, c_us FROM j WHERE rn = 1)
             |SELECT p.user_id, p.purchase_id, p.p_us AS purchase_us,
             |  CASE WHEN p.p_us - b.c_us <= 604800000000 THEN b.click_id END AS click_id,
             |  CASE WHEN p.p_us - b.c_us <= 604800000000 THEN p.p_us - b.c_us END AS delta_us
             |FROM p LEFT JOIN best b USING (purchase_id)""".stripMargin)
    ),

    // MULTI-BATCH attribution twin (round 13): the LOOKBACK-state fold
    // (one LastClick scalar per user) under cross-batch carry — a
    // click in slice k must attribute a purchase in slice k+2 through
    // two micro-batch boundaries. timeSlicedEventsStream delivers
    // chronological batches, so the left fold over (ts, event_id)
    // order composes across batches by prefix; the oracle is the
    // one-batch twin's, unchanged.
    "stream_attribution_mb" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val ev = timeSlicedEventsStream(s, d)
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id"), col("event_type"))
          .as[AttributionStream.Ev](Encoders.product[AttributionStream.Ev])
        val out = AttributionStream(ev, 604800000000L)
        runToTable(s, out.toDF(), "append")
          .select(col("user_id"), col("purchase_id"), col("purchase_us"),
            col("click_id"), col("delta_us"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events),
             |p AS (SELECT user_id, event_id AS purchase_id, tus AS p_us FROM e
             |      WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, event_id AS click_id, tus AS c_us FROM e
             |      WHERE event_type = 'click'),
             |j AS (SELECT p.purchase_id, c.click_id, c.c_us,
             |        ROW_NUMBER() OVER (PARTITION BY p.purchase_id
             |                           ORDER BY c.c_us DESC, c.click_id DESC) AS rn
             |      FROM p JOIN c ON p.user_id = c.user_id
             |       AND (c.c_us < p.p_us OR (c.c_us = p.p_us AND c.click_id < p.purchase_id))),
             |best AS (SELECT purchase_id, click_id, c_us FROM j WHERE rn = 1)
             |SELECT p.user_id, p.purchase_id, p.p_us AS purchase_us,
             |  CASE WHEN p.p_us - b.c_us <= 604800000000 THEN b.click_id END AS click_id,
             |  CASE WHEN p.p_us - b.c_us <= 604800000000 THEN p.p_us - b.c_us END AS delta_us
             |FROM p LEFT JOIN best b USING (purchase_id)""".stripMargin)
    ),

    // CusumStream end-to-end: the reference-value CUSUM drift detector
    // through flatMapGroupsWithState — THREE integer scalars of state
    // per key (cumulative residual sum, its running minimum, last
    // seq). Values quantize to integer units (floor(v+0.5)) so state
    // and verdict are pure BIGINT arithmetic on both engines; the
    // alarm statistic is cum - min(prefix cum), the recurrence-free
    // max(0, S_t) re-expression the batch events_cusum pins.
    "stream_cusum" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val pts = eventsStream(s, d)
          .select(col("event_type").as("key"), expr("ts div 1000").as("seq_us"),
            floor(col("value") + 0.5).cast("long").as("value"))
          .as[CusumStream.Pt](Encoders.product[CusumStream.Pt])
        val out = CusumStream(pts, target = 50L, threshold = 2000L)
        runToTable(s, out.toDF(), "append")
          .select(col("key"), col("seq_us"), col("stat"), col("cum"))
      },
      Some("""WITH e AS (SELECT event_type AS key, epoch_us(ts) AS seq_us,
             |             CAST(floor("value" + 0.5) AS BIGINT) AS v, event_id FROM events),
             |w AS (SELECT key, seq_us, v, event_id,
             |        SUM(v - 50) OVER (PARTITION BY key ORDER BY seq_us, v, event_id
             |          ROWS UNBOUNDED PRECEDING) AS cum FROM e),
             |m AS (SELECT *, MIN(cum) OVER (PARTITION BY key ORDER BY seq_us, v, event_id
             |          ROWS UNBOUNDED PRECEDING) AS mn FROM w)
             |SELECT key, seq_us, CAST(cum - mn AS BIGINT) AS stat,
             |  CAST(cum AS BIGINT) AS cum FROM m
             |WHERE cum - mn > 2000""".stripMargin)
    ),

    // MULTI-BATCH CUSUM twin (round 13): the drift detector's three
    // integer scalars (cum, prefix-min, last seq) carried across
    // micro-batch boundaries — an alarm whose cum crossed the
    // threshold mid-corpus must fire identically when the prefix
    // arrives in an earlier batch. Chronological slices, oracle
    // unchanged.
    "stream_cusum_mb" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val pts = timeSlicedEventsStream(s, d)
          .select(col("event_type").as("key"), expr("ts div 1000").as("seq_us"),
            floor(col("value") + 0.5).cast("long").as("value"))
          .as[CusumStream.Pt](Encoders.product[CusumStream.Pt])
        val out = CusumStream(pts, target = 50L, threshold = 2000L)
        runToTable(s, out.toDF(), "append")
          .select(col("key"), col("seq_us"), col("stat"), col("cum"))
      },
      Some("""WITH e AS (SELECT event_type AS key, epoch_us(ts) AS seq_us,
             |             CAST(floor("value" + 0.5) AS BIGINT) AS v, event_id FROM events),
             |w AS (SELECT key, seq_us, v, event_id,
             |        SUM(v - 50) OVER (PARTITION BY key ORDER BY seq_us, v, event_id
             |          ROWS UNBOUNDED PRECEDING) AS cum FROM e),
             |m AS (SELECT *, MIN(cum) OVER (PARTITION BY key ORDER BY seq_us, v, event_id
             |          ROWS UNBOUNDED PRECEDING) AS mn FROM w)
             |SELECT key, seq_us, CAST(cum - mn AS BIGINT) AS stat,
             |  CAST(cum AS BIGINT) AS cum FROM m
             |WHERE cum - mn > 2000""".stripMargin)
    ),

    // ZscoreStream end-to-end: the prior-moments 3-sigma detector
    // through flatMapGroupsWithState — FOUR integer scalars of state
    // per key; each point is judged against the moments of the points
    // BEFORE it via the cross-multiplied integer test
    // (n·x − s)² > 9(n·s2 − s²), so no float ever enters state or
    // verdict on either engine.
    "stream_zscore" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val pts = eventsStream(s, d)
          .select(col("event_type").as("key"), expr("ts div 1000").as("seq_us"),
            floor(col("value") + 0.5).cast("long").as("value"))
          .as[ZscoreStream.Pt](Encoders.product[ZscoreStream.Pt])
        val out = ZscoreStream(pts, minN = 5L)
        runToTable(s, out.toDF(), "append")
          .select(col("key"), col("seq_us"), col("value"), col("n_prior"))
      },
      Some("""WITH e AS (SELECT event_type AS key, epoch_us(ts) AS seq_us,
             |             CAST(floor("value" + 0.5) AS BIGINT) AS v, event_id FROM events),
             |w AS (SELECT key, seq_us, v,
             |        COUNT(*) OVER wpre AS n,
             |        COALESCE(SUM(v) OVER wpre, 0) AS s,
             |        COALESCE(SUM(v*v) OVER wpre, 0) AS s2
             |      FROM e WINDOW wpre AS (PARTITION BY key ORDER BY seq_us, v, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |SELECT key, seq_us, v AS value, n AS n_prior FROM w
             |WHERE n >= 5 AND (n*v - s)*(n*v - s) > 9*(n*s2 - s*s)""".stripMargin)
    ),

    // MULTI-BATCH z-score twin (round 13): the prior-moments state
    // (n, sum, sum-of-squares, last seq) accumulated across batches —
    // a point early in batch k+1 is judged against moments whose mass
    // arrived in batches <= k. Chronological slices, oracle unchanged.
    "stream_zscore_mb" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val pts = timeSlicedEventsStream(s, d)
          .select(col("event_type").as("key"), expr("ts div 1000").as("seq_us"),
            floor(col("value") + 0.5).cast("long").as("value"))
          .as[ZscoreStream.Pt](Encoders.product[ZscoreStream.Pt])
        val out = ZscoreStream(pts, minN = 5L)
        runToTable(s, out.toDF(), "append")
          .select(col("key"), col("seq_us"), col("value"), col("n_prior"))
      },
      Some("""WITH e AS (SELECT event_type AS key, epoch_us(ts) AS seq_us,
             |             CAST(floor("value" + 0.5) AS BIGINT) AS v, event_id FROM events),
             |w AS (SELECT key, seq_us, v,
             |        COUNT(*) OVER wpre AS n,
             |        COALESCE(SUM(v) OVER wpre, 0) AS s,
             |        COALESCE(SUM(v*v) OVER wpre, 0) AS s2
             |      FROM e WINDOW wpre AS (PARTITION BY key ORDER BY seq_us, v, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |SELECT key, seq_us, v AS value, n AS n_prior FROM w
             |WHERE n >= 5 AND (n*v - s)*(n*v - s) > 9*(n*s2 - s*s)""".stripMargin)
    ),

    // RateLimitStream end-to-end: per-key fixed-window admission
    // control on EVENT time (5 events per user per hour; excess emits
    // dropped=1 decision rows) — TWO integer scalars of state per key.
    // Because admission counts only admitted events, the first `limit`
    // events of each (user, hour window) in (ts, event_id) order admit
    // and everything after drops — exactly the oracle's ROW_NUMBER cut.
    // The Pt.value slot carries event_id, making the fold's (seq,
    // value) sort a total order on both engines.
    "stream_rate_limit" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val pts = eventsStream(s, d)
          .select(col("user_id").cast("string").as("key"),
            expr("ts div 1000").as("seq_us"), col("event_id").as("value"))
          .as[RateLimitStream.Pt](Encoders.product[RateLimitStream.Pt])
        val out = RateLimitStream(pts, limit = 5L, windowUs = 3600000000L)
        runToTable(s, out.toDF(), "append")
          .select(col("key"), col("seq_us"), col("value").as("event_id"),
            col("dropped"))
      },
      Some("""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS key, epoch_us(ts) AS seq_us,
             |             event_id FROM events),
             |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY key, seq_us // 3600000000
             |                                   ORDER BY seq_us, event_id) AS rn FROM e)
             |SELECT key, seq_us, event_id, CAST(rn > 5 AS BIGINT) AS dropped
             |FROM w""".stripMargin)
    ),

    // MULTI-BATCH rate-limit twin (round 13): the ADMISSION-counter
    // fold (per-user tumbling-hour admit count) under cross-batch
    // carry — an hour window straddling a slice cut must keep its
    // admit count across the micro-batch boundary or rows 6+ of the
    // hour would be re-admitted. Chronological delivery via
    // timeSlicedEventsStream; oracle unchanged from the one-batch
    // twin.
    "stream_rate_limit_mb" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val pts = timeSlicedEventsStream(s, d)
          .select(col("user_id").cast("string").as("key"),
            expr("ts div 1000").as("seq_us"), col("event_id").as("value"))
          .as[RateLimitStream.Pt](Encoders.product[RateLimitStream.Pt])
        val out = RateLimitStream(pts, limit = 5L, windowUs = 3600000000L)
        runToTable(s, out.toDF(), "append")
          .select(col("key"), col("seq_us"), col("value").as("event_id"),
            col("dropped"))
      },
      Some("""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS key, epoch_us(ts) AS seq_us,
             |             event_id FROM events),
             |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY key, seq_us // 3600000000
             |                                   ORDER BY seq_us, event_id) AS rn FROM e)
             |SELECT key, seq_us, event_id, CAST(rn > 5 AS BIGINT) AS dropped
             |FROM w""".stripMargin)
    ),

    // PatternDetectStream end-to-end: the CEP two-step pattern (a view
    // FOLLOWED BY a purchase within 30 minutes, consume-on-match) —
    // ONE long of state per user, no event buffering. The oracle
    // replays the consume-chain with a recursive CTE: each match's
    // successor is the FIRST later purchase with a re-arming view in
    // [prev_match, purchase), which is exact because a FAILED purchase
    // never mutates state (too-late arms only get later relative to
    // later purchases) — so only matched purchases advance the scan.
    "stream_pattern" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val ev = eventsStream(s, d)
          .select(col("user_id").cast("string").as("user"),
            expr("ts div 1000").as("seq_us"), col("event_type").as("etype"))
          .as[PatternDetectStream.Ev](Encoders.product[PatternDetectStream.Ev])
        val out = PatternDetectStream(ev, "view", "purchase", 1800000000L)
        runToTable(s, out.toDF(), "append")
          .select(col("user"), col("a_us"), col("b_us"), col("lag_us"))
      },
      Some("""WITH RECURSIVE
             |v AS (SELECT CAST(user_id AS VARCHAR) AS u, epoch_us(ts) AS tus FROM events
             |      WHERE event_type = 'view'),
             |b AS (SELECT CAST(user_id AS VARCHAR) AS u, epoch_us(ts) AS tus FROM events
             |      WHERE event_type = 'purchase'),
             |m(u, b_ts, a_ts) AS (
             |  SELECT u, b_ts, (SELECT MAX(v.tus) FROM v WHERE v.u = q.u AND v.tus < q.b_ts) AS a_ts
             |  FROM (SELECT uu.u, (SELECT MIN(b.tus) FROM b WHERE b.u = uu.u AND EXISTS (
             |          SELECT 1 FROM v WHERE v.u = uu.u
             |           AND v.tus >= b.tus - 1800000000 AND v.tus < b.tus)) AS b_ts
             |        FROM (SELECT DISTINCT u FROM b) uu) q
             |  WHERE q.b_ts IS NOT NULL
             |  UNION
             |  SELECT u, b_ts, (SELECT MAX(v.tus) FROM v WHERE v.u = q.u
             |                    AND v.tus >= q.prev_b AND v.tus < q.b_ts) AS a_ts
             |  FROM (SELECT m.u, m.b_ts AS prev_b,
             |          (SELECT MIN(b.tus) FROM b WHERE b.u = m.u AND b.tus > m.b_ts AND EXISTS (
             |             SELECT 1 FROM v WHERE v.u = m.u
             |              AND v.tus >= GREATEST(m.b_ts, b.tus - 1800000000) AND v.tus < b.tus)) AS b_ts
             |        FROM m) q
             |  WHERE q.b_ts IS NOT NULL
             |)
             |SELECT u AS "user", a_ts AS a_us, b_ts AS b_us, b_ts - a_ts AS lag_us FROM m""".stripMargin)
    ),

    // MULTI-BATCH CEP twin (round 13): consume-on-match state across
    // micro-batch boundaries — a view that arms in batch k must match
    // (and be consumed by) a purchase in batch k+1, and a match must
    // NOT re-fire later. StreamingSpec pins the carried-arm semantics
    // with MemoryStream; this entry proves it end-to-end on real data.
    // Chronological slices, recursive-CTE oracle unchanged.
    "stream_pattern_mb" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val ev = timeSlicedEventsStream(s, d)
          .select(col("user_id").cast("string").as("user"),
            expr("ts div 1000").as("seq_us"), col("event_type").as("etype"))
          .as[PatternDetectStream.Ev](Encoders.product[PatternDetectStream.Ev])
        val out = PatternDetectStream(ev, "view", "purchase", 1800000000L)
        runToTable(s, out.toDF(), "append")
          .select(col("user"), col("a_us"), col("b_us"), col("lag_us"))
      },
      Some("""WITH RECURSIVE
             |v AS (SELECT CAST(user_id AS VARCHAR) AS u, epoch_us(ts) AS tus FROM events
             |      WHERE event_type = 'view'),
             |b AS (SELECT CAST(user_id AS VARCHAR) AS u, epoch_us(ts) AS tus FROM events
             |      WHERE event_type = 'purchase'),
             |m(u, b_ts, a_ts) AS (
             |  SELECT u, b_ts, (SELECT MAX(v.tus) FROM v WHERE v.u = q.u AND v.tus < q.b_ts) AS a_ts
             |  FROM (SELECT uu.u, (SELECT MIN(b.tus) FROM b WHERE b.u = uu.u AND EXISTS (
             |          SELECT 1 FROM v WHERE v.u = uu.u
             |           AND v.tus >= b.tus - 1800000000 AND v.tus < b.tus)) AS b_ts
             |        FROM (SELECT DISTINCT u FROM b) uu) q
             |  WHERE q.b_ts IS NOT NULL
             |  UNION
             |  SELECT u, b_ts, (SELECT MAX(v.tus) FROM v WHERE v.u = q.u
             |                    AND v.tus >= q.prev_b AND v.tus < q.b_ts) AS a_ts
             |  FROM (SELECT m.u, m.b_ts AS prev_b,
             |          (SELECT MIN(b.tus) FROM b WHERE b.u = m.u AND b.tus > m.b_ts AND EXISTS (
             |             SELECT 1 FROM v WHERE v.u = m.u
             |              AND v.tus >= GREATEST(m.b_ts, b.tus - 1800000000) AND v.tus < b.tus)) AS b_ts
             |        FROM m) q
             |  WHERE q.b_ts IS NOT NULL
             |)
             |SELECT u AS "user", a_ts AS a_us, b_ts AS b_us, b_ts - a_ts AS lag_us FROM m""".stripMargin)
    ),

    // HeavyHittersStream end-to-end: trending event types per user
    // shard through the space-saving sketch — state is exactly `cap`
    // (item, count, err) slots per key, emitted as a ranked snapshot
    // per micro-batch. The item domain here (5 event types) sits under
    // cap=8, so the sketch runs in its EXACT regime at every sf and the
    // oracle is the true ranked count table with count_min = count_max
    // — what the gate checks is the end-to-end engine path plus the
    // snapshot/rank/bound emission contract; the eviction semantics
    // (min-slot replace, error inheritance, count_min < count_max) are
    // StreamingSpec-pinned where the item domain exceeds cap.
    "stream_heavy_hitters" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val evts = eventsStream(s, d)
          .select((col("user_id") % 16).cast("string").as("key"),
            expr("ts div 1000").as("seq_us"), col("event_type").as("item"))
          .as[HeavyHittersStream.Evt](Encoders.product[HeavyHittersStream.Evt])
        val out = HeavyHittersStream(evts, cap = 8, emitK = 3)
        runToTable(s, out.toDF(), "append")
          .select(col("key"), col("item"), col("count_max"), col("count_min"),
            col("rank"), col("n_seen"), col("as_of_us"))
      },
      Some("""WITH e AS (SELECT CAST(user_id % 16 AS VARCHAR) AS key, event_type AS item,
             |             epoch_us(ts) AS seq_us FROM events),
             |cnt AS (SELECT key, item, COUNT(*) AS c FROM e GROUP BY 1, 2),
             |tot AS (SELECT key, COUNT(*) AS n_seen, MAX(seq_us) AS as_of_us FROM e GROUP BY 1),
             |r AS (SELECT key, item, c,
             |        ROW_NUMBER() OVER (PARTITION BY key ORDER BY c DESC, item) AS rnk FROM cnt)
             |SELECT r.key, r.item, r.c AS count_max, r.c AS count_min,
             |  CAST(r.rnk AS BIGINT) AS rank, t.n_seen, t.as_of_us
             |FROM r JOIN tot t USING (key) WHERE r.rnk <= 3""".stripMargin)
    ),

    // MULTI-BATCH heavy-hitters twin (round 13): the space-saving
    // sketch's snapshot-per-micro-batch contract under cross-batch
    // accumulation. Four chronological batches emit four ranked
    // snapshots per key; the checked projection keeps each key's
    // LATEST snapshot (max (as_of_us, n_seen) — as_of_us is strictly
    // increasing across batches at the µs slice grain, and the n_seen
    // tie-break makes the cut robust even against a hypothetical
    // same-instant double snapshot: more-events-seen wins), so the
    // answer equals the one-batch twin's oracle while the
    // intermediate snapshots prove the sketch counts ACCUMULATED
    // across batch boundaries instead of restarting per batch.
    "stream_heavy_hitters_mb" -> Query(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val evts = timeSlicedEventsStream(s, d)
          .select((col("user_id") % 16).cast("string").as("key"),
            expr("ts div 1000").as("seq_us"), col("event_type").as("item"))
          .as[HeavyHittersStream.Evt](Encoders.product[HeavyHittersStream.Evt])
        val out = HeavyHittersStream(evts, cap = 8, emitK = 3)
        val snaps = runToTable(s, out.toDF(), "append")
        val wk = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
        snaps.withColumn("final_snap",
            max(struct(col("as_of_us"), col("n_seen"))).over(wk))
          .filter(col("as_of_us") === col("final_snap.as_of_us") &&
            col("n_seen") === col("final_snap.n_seen"))
          .select(col("key"), col("item"), col("count_max"), col("count_min"),
            col("rank"), col("n_seen"), col("as_of_us"))
      },
      Some("""WITH e AS (SELECT CAST(user_id % 16 AS VARCHAR) AS key, event_type AS item,
             |             epoch_us(ts) AS seq_us FROM events),
             |cnt AS (SELECT key, item, COUNT(*) AS c FROM e GROUP BY 1, 2),
             |tot AS (SELECT key, COUNT(*) AS n_seen, MAX(seq_us) AS as_of_us FROM e GROUP BY 1),
             |r AS (SELECT key, item, c,
             |        ROW_NUMBER() OVER (PARTITION BY key ORDER BY c DESC, item) AS rnk FROM cnt)
             |SELECT r.key, r.item, r.c AS count_max, r.c AS count_min,
             |  CAST(r.rnk AS BIGINT) AS rank, t.n_seen, t.as_of_us
             |FROM r JOIN tot t USING (key) WHERE r.rnk <= 3""".stripMargin)
    )
  )
}
