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
}
