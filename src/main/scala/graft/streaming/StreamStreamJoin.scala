package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: match each left event to
  * right events of the same key within `windowSec` AFTER it — the
  * "click joined to the impression that preceded it" shape.
  *
  * Both sides carry watermarks and the join condition bounds the
  * right-side event time relative to the left's, so Spark can prove
  * when a row can no longer match and EVICT its state — without the
  * time bound a stream-stream join buffers both streams forever.
  */
object StreamStreamJoin {

  /** @param left  streaming frame with (key, ts, ...) — the earlier event
    * @param right streaming frame with (key, ts, ...) — the later event
    */
  def apply(left: DataFrame, right: DataFrame, key: String, tsCol: String,
            windowSec: Int, watermarkDelay: String = "30 seconds"): DataFrame = {
    val l = left.withWatermark(tsCol, watermarkDelay)
      .select(col(key).as("l_key"), col(tsCol).as("l_ts"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("l"))
    val r = right.withWatermark(tsCol, watermarkDelay)
      .select(col(key).as("r_key"), col(tsCol).as("r_ts"),
        struct(right.columns.toIndexedSeq.map(col): _*).as("r"))
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"interval $windowSec seconds"))
  }
}
