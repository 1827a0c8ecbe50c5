package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation over a stream of events —
  * the Structured Streaming twin of the batch `window_tumbling` query
  * (same semantics, oracle-covered there; this path is ScalaTest-
  * verified with MemoryStream).
  *
  * Works on any input with an event-time timestamp column plus
  * `event_type` / `value`: `readStream` sources and batch DataFrames
  * alike (Spark plans the same logical agg either way).
  *
  * At scale: state is bounded by the watermark (late rows beyond it are
  * dropped and their window state evicted), and the agg is map-side
  * partial before the (window, event_type) shuffle.
  */
object WindowedAgg {

  /** `slide` < `windowDur` gives hopping windows (each event lands in
    * windowDur/slide windows — the streaming twin of the batch
    * `window_hopping` query); the default slide = window is tumbling.
    */
  def apply(events: DataFrame, tsCol: String, windowDur: String,
            watermarkDelay: String, slide: Option[String] = None): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur, slide.getOrElse(windowDur)), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))
}
