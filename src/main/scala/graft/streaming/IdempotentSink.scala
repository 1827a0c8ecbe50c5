package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once STREAM SINK semantics via deterministic overwrite.
  *
  * Structured Streaming's checkpoint gives exactly-once *state* (source
  * offsets + operator state), but a plain `foreachBatch` side effect is
  * only at-least-once: if the job dies after the write but before the
  * batch commit is recorded, the restart REPLAYS the batch and a naive
  * append sink duplicates every row. The standard fix, implemented
  * here: key the write by `batchId` and make it an overwrite — a
  * replayed batch rewrites the same directory with the same rows, so
  * the sink converges to the same state no matter how many times a
  * batch is attempted. (This is the idempotent-writer half of the
  * exactly-once contract; Delta/Iceberg implement the same idea with a
  * txn log keyed on (appId, batchId).)
  *
  * At scale the per-batch directory is also the natural retention /
  * provenance unit: downstream readers see `batch_id=N` as a partition
  * column and can reprocess or expire whole batches.
  */
object IdempotentSink {

  /** `foreachBatch` handler: overwrite-by-batch-id parquet writer. */
  def overwriteByBatch(outDir: String)(df: DataFrame, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Read the sink back as one DataFrame, `batch_id` as a column. */
  def readBack(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", outDir).parquet(outDir)
}
