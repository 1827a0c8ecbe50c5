package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication by content hash.
  *
  * `dropDuplicatesWithinWatermark` keys the state on the md5 of the
  * text and lets the watermark EVICT hash state older than the delay —
  * the property that makes streaming dedup feasible at corpus scale
  * (unbounded `dropDuplicates` state grows forever).
  */
object StreamingDedup {

  /** @param events  streaming DataFrame with an event-time column and a
    *                text payload column
    */
  def apply(events: DataFrame, tsCol: String, textCol: String,
            watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("content_hash", md5(col(textCol)))
      .dropDuplicatesWithinWatermark("content_hash")
}
