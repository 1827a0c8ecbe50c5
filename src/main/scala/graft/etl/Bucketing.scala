package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed managed tables — the pre-shuffle that makes repeated joins
  * and aggregations on the same key shuffle-free at read time.
  *
  * At 100 TB the dominant cost of fact⋈fact joins is the shuffle; a
  * table bucketed (and sorted) on the join key is hash-partitioned on
  * disk once, so every later join/agg on that key reads co-located
  * buckets with NO Exchange in the plan (verified in EtlSpec).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }
}
