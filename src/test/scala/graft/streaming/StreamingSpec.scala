package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("WindowedAgg aggregates tumbling windows over a MemoryStream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val agg = WindowedAgg(events, "ts", "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("winagg").start()
    try {
      in.addData(
        (ts("2024-01-01 00:00:30"), "click", 1.0),
        (ts("2024-01-01 00:01:30"), "click", 2.0),
        (ts("2024-01-01 00:06:30"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("winagg")
        .select(col("win_start").cast("string"), col("event_type"), col("n"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows === Set(
        ("2024-01-01 00:00:00", "click", 2L, 3.0),
        ("2024-01-01 00:05:00", "view", 1L, 5.0)))
      // second batch lands in an existing window
      in.addData((ts("2024-01-01 00:02:00"), "click", 4.0))
      q.processAllAvailable()
      val n2 = spark.table("winagg")
        .filter(col("event_type") === "click").select("n").collect()(0).getLong(0)
      assert(n2 === 3L)
    } finally q.stop()
  }

  test("WindowedDistinctStream counts a user once per window across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val events = in.toDF().toDF("ts", "user")
    val agg = WindowedDistinctStream(events, "ts", "user", "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("windistinct").start()
    try {
      // u1 appears three times (twice in batch 1, once in batch 2) in
      // the same window — it must count ONCE; u2 once; the dedup state
      // must carry across the batch boundary
      in.addData((ts("2024-01-01 00:00:30"), "u1"),
        (ts("2024-01-01 00:01:30"), "u1"),
        (ts("2024-01-01 00:02:00"), "u2"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:03:00"), "u1"),
        (ts("2024-01-01 00:06:00"), "u1"))
      q.processAllAvailable()
      val rows = spark.table("windistinct")
        .select(col("win_start").cast("string"), col("n_distinct_users"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows === Set(
        ("2024-01-01 00:00:00", 2L),   // u1 deduped across batches, u2
        ("2024-01-01 00:05:00", 1L)))  // u1 counts again in a NEW window
    } finally q.stop()
  }

  test("WindowedAgg with a slide emits hopping windows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = WindowedAgg(in.toDF().toDF("ts", "event_type", "value"),
      "ts", "1 minute", "10 minutes", slide = Some("30 seconds"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("hopagg").start()
    try {
      in.addData((ts("2024-01-01 00:00:45"), "click", 2.0))
      q.processAllAvailable()
      val wins = spark.table("hopagg")
        .select(col("win_start").cast("string")).collect().map(_.getString(0)).sorted.toSeq
      // one event, two overlapping 1-min windows 30 s apart
      assert(wins === Seq("2024-01-01 00:00:00", "2024-01-01 00:00:30"))
    } finally q.stop()
  }

  test("SessionizeStream.foldUser splits on gaps and carries state") {
    import SessionizeStream._
    val gap = 1000L
    val evs = Seq(Ev(1, 0, 1.0), Ev(1, 500, 2.0), Ev(1, 5000, 3.0))
    val (closed, open) = foldUser(1, evs, None, gap)
    assert(closed === Seq(SessionOut(1, 0, 500, 2, 3.0)))
    assert(open === Some(OpenSession(5000, 5000, 1, 3.0)))
    // state from a previous batch extends into this one
    val (closed2, open2) = foldUser(1, Seq(Ev(1, 5500, 1.0)), open, gap)
    assert(closed2.isEmpty)
    assert(open2 === Some(OpenSession(5000, 5500, 2, 4.0)))
  }

  test("SessionizeStream.foldUser fails loudly on cross-batch event-time disorder") {
    import SessionizeStream._
    // a later micro-batch delivering an event OLDER than the carried
    // open session's end would silently mis-sessionize — the fold must
    // throw instead (VERDICT r12: turn the one-batch assumption into a
    // loud guard)
    val open = Some(OpenSession(1000, 2000, 2, 5.0))
    val ex = intercept[IllegalArgumentException] {
      foldUser(1, Seq(Ev(1, 1500, 1.0)), open, 1000000L)
    }
    assert(ex.getMessage.contains("cross-batch event-time disorder"))
    // the boundary case (event exactly at the open end) stays legal
    val (_, o2) = foldUser(1, Seq(Ev(1, 2000, 1.0)), open, 1000000L)
    assert(o2.exists(_.n_events == 3))
  }

  test("StreamingDedup drops repeated content within the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val out = StreamingDedup(in.toDF().toDF("ts", "text"), "ts", "text", "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      in.addData(
        (ts("2024-01-01 00:00:00"), "alpha"),
        (ts("2024-01-01 00:00:10"), "alpha"),
        (ts("2024-01-01 00:00:20"), "beta"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:10:00"), "alpha")) // dup across batches
      q.processAllAvailable()
      val texts = spark.table("dedup_stream").select("text")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(texts === Seq("alpha", "beta"))
    } finally q.stop()
  }

  test("AttributionStream.foldUser credits the latest in-lookback click") {
    import AttributionStream._
    val lb = 1000L
    // out-of-order arrival: the later click sorts first by ts and wins
    val evs = Seq(
      Ev(1, 900, 30, "purchase"), Ev(1, 100, 10, "click"), Ev(1, 500, 20, "click"),
      Ev(1, 5000, 40, "purchase")) // stale: last click 4500us ago > lookback
    val (out, st) = foldUser(1, evs, None, lb)
    assert(out === Seq(
      Attribution(1, 30, 900, Some(20), Some(400)),
      Attribution(1, 40, 5000, None, None)))
    assert(st === Some(LastClick(20, 500)))
  }

  test("AttributionStream carries click state across micro-batches") {
    import AttributionStream._
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = AttributionStream(in.toDS(), lookbackUs = 1000000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("attr_stream").start()
    try {
      in.addData(Ev(7, 100, 1, "click"))
      q.processAllAvailable()
      in.addData(Ev(7, 500000, 2, "purchase"),       // credits click 1 from batch 1
                 Ev(8, 600000, 3, "purchase"))       // no click ever -> unattributed
      q.processAllAvailable()
      val rows = spark.table("attr_stream")
        .select("purchase_id", "click_id", "delta_us").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sorted.toSeq
      assert(rows === Seq((2L, 1L), (3L, -1L)))
    } finally q.stop()
  }

  test("OhlcStream emits one bar per window with event-time open/close") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long, Double)]
    val bars = OhlcStream(in.toDF().toDF("ts", "key", "id", "value"),
      "5 minutes", "10 minutes")
    val q = bars.writeStream.outputMode("complete")
      .format("memory").queryName("ohlc_stream").start()
    try {
      // out-of-order arrival: the OPEN must be the earliest event TIME
      // (value 7.0 at 00:00:10), not the first arrival (9.0)
      in.addData(
        (ts("2024-01-01 00:03:00"), "k", 2, 9.0),
        (ts("2024-01-01 00:00:10"), "k", 1, 7.0),
        (ts("2024-01-01 00:04:00"), "k", 3, 3.0))
      q.processAllAvailable()
      val r = spark.table("ohlc_stream")
        .select(col("win_start").cast("string"), col("open"), col("high"),
          col("low"), col("close"), col("volume")).collect()
        .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2),
          x.getDouble(3), x.getDouble(4), x.getLong(5))).toSet
      assert(r === Set(("2024-01-01 00:00:00", 7.0, 9.0, 3.0, 3.0, 3L)))
    } finally q.stop()
  }

  test("CusumStream.foldKey alarms exactly when cum - running min exceeds the threshold") {
    import CusumStream._
    // target 10: residuals -1, -2, +15, +15 -> cum -1, -3, 12, 27 with
    // running min -3 after p2, so stats 0, 0, 15, 30
    val pts = Seq(Pt("a", 1, 9), Pt("a", 2, 8), Pt("a", 3, 25), Pt("a", 4, 25))
    val (out, st) = foldKey("a", pts, None, target = 10L, threshold = 10L)
    assert(out === Seq(Alarm("a", 3, 15, 12), Alarm("a", 4, 30, 27)))
    assert(st.cum === 27L && st.min_cum === -3L && st.last_seq === 4L)
  }

  test("CusumStream carries drift state across micro-batches") {
    import CusumStream._
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Pt]
    val out = CusumStream(in.toDS(), target = 10L, threshold = 10L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cusum_stream").start()
    try {
      // batch 1: in-control points — builds state, no alarm
      in.addData(Pt("k", 1, 9), Pt("k", 2, 8))
      q.processAllAvailable()
      assert(spark.table("cusum_stream").count() === 0L)
      // batch 2: the drift only crosses the threshold when batch 1's
      // carried (cum=-3, min=-3) state is included: +8 then +7
      // residuals -> stats 8, 15
      in.addData(Pt("k", 3, 18), Pt("k", 4, 17))
      q.processAllAvailable()
      val rows = spark.table("cusum_stream")
        .select("seq_us", "stat").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows === Seq((4L, 15L)))
    } finally q.stop()
  }

  test("HeavyHittersStream.foldKey keeps <= cap slots with the space-saving bounds") {
    import HeavyHittersStream._
    // cap 2: a,a,b fills both slots; c evicts the min (b, count 1) and
    // inherits its count as err -> c tracked at (2, err 1)
    val evts = Seq(Evt("k", 1, "a"), Evt("k", 2, "a"), Evt("k", 3, "b"),
      Evt("k", 4, "c"))
    val (out, st) = foldKey("k", evts, None, cap = 2, emitK = 2)
    assert(st.slots.size === 2 && st.n_seen === 4L)
    assert(out === Seq(
      HH("k", "a", 2, 2, 1, 4, 4),
      HH("k", "c", 2, 1, 2, 4, 4)))
    // guarantee: any item with true freq > n/cap is tracked (a: 2 > 4/2 is
    // false here, but a is tracked anyway; the bound count_min <= true <=
    // count_max holds for every emitted row)
    assert(out.forall(h => h.count_min <= h.count_max))
  }

  test("HeavyHittersStream carries sketch state across micro-batches") {
    import HeavyHittersStream._
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Evt]
    val out = HeavyHittersStream(in.toDS(), cap = 3, emitK = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("hh_stream").start()
    try {
      in.addData(Evt("k", 1, "x"), Evt("k", 2, "x"), Evt("k", 3, "y"))
      q.processAllAvailable()
      // batch 2 only beats x's carried count because batch 1's state is in
      in.addData(Evt("k", 4, "y"), Evt("k", 5, "y"), Evt("k", 6, "z"))
      q.processAllAvailable()
      val rows = spark.table("hh_stream")
        .select("as_of_us", "item", "count_max", "rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      assert(rows === Seq(
        (3L, "x", 2L, 1L), (3L, "y", 1L, 2L),
        (6L, "y", 3L, 1L), (6L, "x", 2L, 2L)).sorted)
    } finally q.stop()
  }

  test("WindowedAgg file-source run survives a checkpointed restart without loss or duplication") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft_ckpt").toFile.getAbsolutePath
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(inDir).mkdirs()
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))

    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val _ = Files.writeString(java.nio.file.Paths.get(s"$inDir/$name"), lines.mkString("\n"))
    }

    // append-mode parquet sink: a window is emitted exactly once, when
    // the watermark passes its end — the file-source offsets + sink log
    // in the checkpoint are what make that exactly-once across restarts
    def start() = WindowedAgg(
        spark.readStream.schema(schema).json(inDir), "ts", "1 minute", "30 seconds")
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt).start()

    writeBatch("b1.json", Seq(
      """{"ts":"2024-01-01T00:00:10","event_type":"a","value":1.0}""",
      """{"ts":"2024-01-01T00:00:20","event_type":"a","value":2.0}""",
      """{"ts":"2024-01-01T00:01:10","event_type":"b","value":4.0}"""))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // restart from the checkpoint; the new file advances the watermark
    // past both batch-1 windows, so they flush in the SECOND run even
    // though their rows were only ever read in the first
    writeBatch("b2.json", Seq(
      """{"ts":"2024-01-01T00:05:00","event_type":"a","value":8.0}"""))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.schema(StructType(Seq(
        StructField("win_start", TimestampType), StructField("win_end", TimestampType),
        StructField("event_type", StringType), StructField("n", LongType),
        StructField("sum_value", DoubleType)))).parquet(outDir)
      .select(col("win_start").cast("string"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    // exactly once each: no lost windows, no duplicated windows
    assert(rows.sorted === Seq(
      ("2024-01-01 00:00:00", "a", 2L, 3.0),
      ("2024-01-01 00:01:00", "b", 1L, 4.0)))

    // a third run re-reads NO old files (checkpoint remembers offsets):
    // output is unchanged after an idle restart
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.read.parquet(outDir).count() === 2)
  }

  test("IdempotentSink survives a replayed micro-batch without duplicating rows") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft_sink").toFile.getAbsolutePath
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(inDir).mkdirs()
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))

    def start() = spark.readStream.schema(schema).json(inDir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(IdempotentSink.overwriteByBatch(outDir) _)
      .start()

    Files.writeString(java.nio.file.Paths.get(s"$inDir/b1.json"), Seq(
      """{"ts":"2024-01-01T00:00:10","event_type":"a","value":1.0}""",
      """{"ts":"2024-01-01T00:00:20","event_type":"b","value":2.0}""").mkString("\n"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(IdempotentSink.readBack(spark, outDir).count() === 2)

    // simulate a crash AFTER the sink write but BEFORE the batch commit:
    // deleting the newest checkpoint commit marker makes the restart
    // replay the batch — the at-least-once window every real deployment
    // has to survive. A plain append sink would now double the rows.
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) crc.delete() // leftover checksum twin trips Spark's
    // checkpoint-ownership guard (rename onto an existing .crc looks like
    // a concurrent writer)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val afterReplay = IdempotentSink.readBack(spark, outDir)
    assert(afterReplay.count() === 2, "replayed batch must not duplicate rows")

    // normal progress still lands new batches alongside the replayed one
    Files.writeString(java.nio.file.Paths.get(s"$inDir/b2.json"),
      """{"ts":"2024-01-01T00:01:00","event_type":"c","value":3.0}""")
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    val fin = IdempotentSink.readBack(spark, outDir)
    assert(fin.count() === 3)
    assert(fin.select("batch_id").distinct().count() === 2)
  }

  test("StreamStreamJoin matches within the interval and respects the bound") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val imp = MemoryStream[(Long, Timestamp)]   // impressions (key, ts)
    val clk = MemoryStream[(Long, Timestamp)]   // clicks (key, ts)
    val out = StreamStreamJoin(
      imp.toDF().toDF("key", "ts"), clk.toDF().toDF("key", "ts"),
      "key", "ts", windowSec = 60)
    val q = out.select(col("l.key").as("key"),
        col("l_ts").cast("string"), col("r_ts").cast("string"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin").start()
    try {
      imp.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")))
      clk.addData(
        (1L, ts("2024-01-01 00:00:30")),  // within 60s -> joins
        (2L, ts("2024-01-01 00:02:00")),  // past the 60s bound -> dropped
        (3L, ts("2024-01-01 00:00:10")))  // no impression -> dropped
      q.processAllAvailable()
      val rows = spark.table("ssjoin").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(rows === Set((1L, "2024-01-01 00:00:00", "2024-01-01 00:00:30")))
    } finally q.stop()
  }

  test("EnrichStream joins a stream to a broadcast static dim per batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dim = Seq(("click", 1), ("view", 2)).toDF("event_type", "type_code")
    val in = MemoryStream[(Timestamp, String, Double)]
    val out = EnrichStream(in.toDF().toDF("ts", "event_type", "value"), dim, "event_type")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    try {
      in.addData(
        (ts("2024-01-01 00:00:00"), "click", 1.0),
        (ts("2024-01-01 00:00:10"), "view", 2.0),
        (ts("2024-01-01 00:00:20"), "scroll", 3.0)) // no dim row -> null code
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("event_type", "type_code").collect()
        .map(r => (r.getString(0), Option(r.get(1)))).toSet
      assert(rows === Set(
        ("click", Some(1)), ("view", Some(2)), ("scroll", None)))
    } finally q.stop()
  }

  test("SessionizeStream emits closed sessions across MemoryStream batches") {
    import SessionizeStream._
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = SessionizeStream(in.toDS(), gapUs = 1000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      in.addData(Ev(7, 0, 1.0), Ev(7, 800, 1.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0) // still open
      in.addData(Ev(7, 100000, 9.0)) // far past the gap -> closes session 1
      q.processAllAvailable()
      val rows = spark.table("sessions").as[SessionOut].collect().toSeq
      assert(rows === Seq(SessionOut(7, 0, 800, 2, 2.0)))
    } finally q.stop()
  }

  test("ZscoreStream.foldKey tests each point against the PRIOR moments only") {
    import ZscoreStream._
    // baseline 10,12,11,9,10 (n=5, mean 10.4, var 1.04): 50 is ~39 sd
    // out -> alarm; the very same 50 then joins the baseline, and a
    // second 50 is within 3 sd of the contaminated stats -> no alarm
    // masking the first (each point judged on what came before it).
    val base = Seq(10L, 12L, 11L, 9L, 10L).zipWithIndex
      .map { case (v, i) => Pt("a", i + 1L, v) }
    val (out, st) = foldKey("a", base :+ Pt("a", 6, 50) :+ Pt("a", 7, 50),
      None, minN = 5L)
    assert(out === Seq(Anomaly("a", 6, 50, 5)))
    assert(st.n === 7L && st.s === 152L && st.last_seq === 7L)
  }

  test("ZscoreStream carries integer moments across micro-batches") {
    import ZscoreStream._
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Pt]
    val out = ZscoreStream(in.toDS(), minN = 5L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("zscore_stream").start()
    try {
      // batch 1: below the warm-up floor -> no alarms, state builds
      in.addData(Pt("k", 1, 10), Pt("k", 2, 12), Pt("k", 3, 11))
      q.processAllAvailable()
      assert(spark.table("zscore_stream").count() === 0L)
      // batch 2: two more baseline points reach n=5, then the spike
      // alarms ONLY because batch 1's carried (n, s, s2) is included
      in.addData(Pt("k", 4, 9), Pt("k", 5, 10), Pt("k", 6, 50))
      q.processAllAvailable()
      val rows = spark.table("zscore_stream").as[Anomaly].collect().toSeq
      assert(rows === Seq(Anomaly("k", 6, 50, 5)))
    } finally q.stop()
  }

  test("PatternDetectStream.foldUser arms on A, matches first B in window, consumes") {
    import PatternDetectStream._
    val evs = Seq(
      Ev("u", 100, "view"),          // arms at 100
      Ev("u", 150, "view"),          // re-arms at 150 (freshest A wins)
      Ev("u", 400, "purchase"),      // within 300 of 150 -> match, consume
      Ev("u", 500, "purchase"),      // disarmed -> no match
      Ev("u", 900, "view"),          // re-arms
      Ev("u", 1500, "purchase"))     // 600 > 300 window -> no match
    val (out, st) = foldUser("u", evs, None, "view", "purchase", withinUs = 300L)
    assert(out === Seq(Match("u", 150, 400, 250)))
    assert(st.armed_a_us === 900L, "the late-B view stays armed for a future B")
  }

  test("PatternDetectStream's armed A survives a micro-batch boundary") {
    import PatternDetectStream._
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = PatternDetectStream(in.toDS(), "view", "purchase", withinUs = 1000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("pattern_stream").start()
    try {
      // batch 1: A only -> nothing emitted, arm carried in state
      in.addData(Ev("k", 100, "view"), Ev("k", 200, "other"))
      q.processAllAvailable()
      assert(spark.table("pattern_stream").count() === 0L)
      // batch 2: B matches ONLY via the carried arm; the second B
      // finds the pattern consumed
      in.addData(Ev("k", 800, "purchase"), Ev("k", 900, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("pattern_stream").as[Match].collect().toSeq
      assert(rows === Seq(Match("k", 100, 800, 700)))
    } finally q.stop()
  }

  test("RateLimitStream.foldKey admits up to the limit per event-time window") {
    import RateLimitStream._
    // window = 100us, limit 2: seqs 10,20,30 in window 0 -> third drops;
    // seq 110 opens window 100 -> admits again
    val pts = Seq(Pt("a", 10, 1), Pt("a", 20, 2), Pt("a", 30, 3), Pt("a", 110, 4))
    val (out, st) = foldKey("a", pts, None, limit = 2L, windowUs = 100L)
    assert(out.map(d => (d.seq_us, d.dropped)) ===
      Seq((10L, 0L), (20L, 0L), (30L, 1L), (110L, 0L)))
    assert(st.win_start === 100L && st.in_win === 1L)
  }

  test("RateLimitStream's window count survives a micro-batch boundary") {
    import RateLimitStream._
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Pt]
    val out = RateLimitStream(in.toDS(), limit = 2L, windowUs = 1000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ratelimit_stream").start()
    try {
      // batch 1 admits two events of window 0
      in.addData(Pt("k", 100, 1), Pt("k", 200, 2))
      q.processAllAvailable()
      // batch 2: same event-time window -> dropped ONLY because the
      // carried in-window count says the budget is spent; the next
      // window admits again
      in.addData(Pt("k", 300, 3), Pt("k", 1100, 4))
      q.processAllAvailable()
      val rows = spark.table("ratelimit_stream").as[Decision].collect()
        .map(d => (d.seq_us, d.dropped)).sorted.toSeq
      assert(rows === Seq((100L, 0L), (200L, 0L), (300L, 1L), (1100L, 0L)))
    } finally q.stop()
  }

  test("SessionizeStream's open-session state survives a checkpointed kill-and-restart") {
    // The multi-batch twin proves cross-BATCH carry inside one run;
    // this proves cross-RUN carry: a session left OPEN when the first
    // query stops must close correctly in a second query started on the
    // same checkpoint — exactly-once for flatMapGroupsWithState state
    // across a restart (round-13 verdict Next #4).
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Encoders
    val root = Files.createTempDirectory("graft_sess_ckpt").toFile.getAbsolutePath
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(inDir).mkdirs()
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts_us", LongType), StructField("value", DoubleType)))

    def start() = {
      val ev = spark.readStream.schema(schema).json(inDir)
        .as[SessionizeStream.Ev](Encoders.product[SessionizeStream.Ev])
      SessionizeStream(ev, gapUs = 60000000L).toDF()
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt).start()
    }

    // run 1: both users end the run with OPEN sessions (nothing emitted)
    val _ = Files.writeString(java.nio.file.Paths.get(s"$inDir/b1.json"), Seq(
      """{"user_id":1,"ts_us":0,"value":1.0}""",
      """{"user_id":1,"ts_us":30000000,"value":2.0}""",
      """{"user_id":2,"ts_us":0,"value":5.0}""").mkString("\n"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // run 2 (fresh query on the same checkpoint): user 1's first event
    // EXTENDS the session opened in run 1 (20s < 60s gap) before a
    // 150s gap closes it — the closed session mixes run-1 and run-2
    // events, which only works if the open-session state was restored
    // from the checkpoint; user 2's event closes the run-1 singleton.
    val _ = Files.writeString(java.nio.file.Paths.get(s"$inDir/b2.json"), Seq(
      """{"user_id":1,"ts_us":50000000,"value":3.0}""",
      """{"user_id":1,"ts_us":200000000,"value":4.0}""",
      """{"user_id":2,"ts_us":300000000,"value":6.0}""").mkString("\n"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.parquet(outDir)
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(rows === Seq((1L, 0L, 50000000L, 3L), (2L, 0L, 0L, 1L)))

    // idle restart: checkpointed offsets re-read nothing, no duplicates
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.read.parquet(outDir).count() === 2)
  }

  test("AttributionStream's last-click state survives a checkpointed kill-and-restart") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Encoders
    val root = Files.createTempDirectory("graft_attr_ckpt").toFile.getAbsolutePath
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(inDir).mkdirs()
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts_us", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType)))

    def start() = {
      val ev = spark.readStream.schema(schema).json(inDir)
        .as[AttributionStream.Ev](Encoders.product[AttributionStream.Ev])
      AttributionStream(ev, lookbackUs = 100000000L).toDF()
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt).start()
    }

    // run 1: a click and nothing else — ALL signal is in the state
    val _ = Files.writeString(java.nio.file.Paths.get(s"$inDir/b1.json"),
      """{"user_id":1,"ts_us":0,"event_id":10,"event_type":"click"}""")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.schema(StructType(Seq(StructField("purchase_id", LongType))))
      .parquet(outDir).count() === 0)

    // run 2: the first purchase credits the RUN-1 click (state restored
    // from the checkpoint — there is no other place it could come from),
    // the second falls outside the lookback, the third credits a fresh
    // run-2 click.
    val _ = Files.writeString(java.nio.file.Paths.get(s"$inDir/b2.json"), Seq(
      """{"user_id":1,"ts_us":50000000,"event_id":20,"event_type":"purchase"}""",
      """{"user_id":1,"ts_us":150000000,"event_id":21,"event_type":"purchase"}""",
      """{"user_id":1,"ts_us":160000000,"event_id":11,"event_type":"click"}""",
      """{"user_id":1,"ts_us":170000000,"event_id":22,"event_type":"purchase"}""").mkString("\n"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.parquet(outDir)
      .select("purchase_id", "click_id", "delta_us")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq.sortBy(_._1)
    assert(rows === Seq(
      (20L, Some(10L), Some(50000000L)),
      (21L, None, None),
      (22L, Some(11L), Some(10000000L))))
  }

  test("timeSlicedEventsStream delivers the whole table in >= 4 micro-batches") {
    val d = "/root/testdata/sf0.001"
    val ev = StreamTwinQueries.timeSlicedEventsStream(spark, d)
    val name = "mbslice_probe"
    val ckpt = graft.etl.TmpDirs.dir(name + "_ckpt")
    val q = ev.writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      q.awaitTermination()
      // one slice file per micro-batch: the _mb twins' cross-batch
      // claims are only claims if the engine actually saw >1 batch
      val fed = q.recentProgress.filter(_.numInputRows > 0)
      assert(fed.length >= 4, s"expected >= 4 fed micro-batches, got ${fed.length}")
      // the slices partition the table exactly (no dropped/duplicated
      // boundary rows), and ts stays the int64-nanos contract
      val got = spark.table(name).count()
      val want = graft.Tables.events(spark, d).count()
      assert(got === want)
    } finally {
      q.stop()
      spark.catalog.dropTempView(name): Unit
    }
  }
}
