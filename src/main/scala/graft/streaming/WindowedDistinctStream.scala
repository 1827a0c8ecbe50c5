package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT distinct-user count per tumbling window — the streaming DAU
  * counter: a watermarked per-(window, user) dedup feeds a watermarked
  * windowed count, so each user contributes once per window no matter
  * how many events (or duplicate deliveries) arrive, across
  * micro-batch boundaries included.
  *
  * This is the two-stateful-operator chain Structured Streaming
  * supports natively (dedup -> windowed agg, one watermark governing
  * both): dedup state is one entry per ACTIVE (window, user) — evicted
  * at the watermark, never corpus-sized — and the downstream agg holds
  * one counter per open window. The approximate alternative at extreme
  * cardinality is HeavyHittersStream's sketch; this operator is the
  * exact-semantics baseline.
  */
object WindowedDistinctStream {

  def apply(events: DataFrame, tsCol: String, userCol: String,
            windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .select(window(col(tsCol), windowDur).as("win"), col(userCol).as("u"),
        col(tsCol).as("ts_ev"))
      .dropDuplicates("win", "u")
      .groupBy(col("win"))
      .agg(count(lit(1)).as("n_distinct_users"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("n_distinct_users"))
}
