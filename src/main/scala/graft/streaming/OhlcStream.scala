package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming OHLC bars — the tumbling-window twin of the batch
  * `window_ohlc` query (oracle-covered there at day grain).
  *
  * Open/close ride `min_by`/`max_by` over (event-time, tiebreak id)
  * INSIDE the windowed aggregate, so the whole bar is one stateful
  * aggregation with watermark-bounded state: state per (key, window)
  * is six scalars, evicted when the watermark passes the window end,
  * and the bar is emitted exactly once in append mode — the same
  * exactly-once-per-window contract WindowedAgg pins. No
  * foreachBatch, no custom state: the declarative form Structured
  * Streaming already knows how to checkpoint and restart.
  */
object OhlcStream {

  /** events: (ts timestamp, key string, id long, value double) */
  def apply(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("key"), window(col("ts"), windowLen))
      .agg(
        min_by(col("value"), struct(col("ts"), col("id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("id"))).as("close"),
        count(lit(1)).as("volume"))
      .select(col("key"),
        col("window.start").as("win_start"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
}
