package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment join: a stream of events joined to a
  * (small) static dimension frame — the streaming half of the classic
  * "enrich the event firehose with reference data" pipeline.
  *
  * The static side is marked broadcast, so each micro-batch is a
  * stateless map-side hash join: no streaming state, no watermark
  * needed, and the plan scales with the stream alone. Spark re-resolves
  * the static side per batch, which is exactly the semantics a
  * slowly-changing reference table wants.
  */
object EnrichStream {

  def apply(events: DataFrame, dim: DataFrame, key: String,
            joinType: String = "left_outer"): DataFrame =
    events.join(broadcast(dim), Seq(key), joinType)
}
