package graft.multimodal

import graft.SparkTestSession
import graft.multimodal.FrameFeatures.{FrameFeature, FramePayload}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def frames() = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("n_frames", ceil(length(col("payload")) / 64.0).cast("int"))
      .withColumn("frame_id",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(4))))
      .select(col("doc_id"), col("frame_id").cast("long").as("frame_id"),
        expr("substring(payload, frame_id*64 + 1, 64)").as("payload"))
      .as[FramePayload]
  }

  test("FrameFeatures.extract is deterministic and typed") {
    val a = FrameFeatures.extract(frames()).collect().sortBy(f => (f.doc_id, f.frame_id))
    val b = FrameFeatures.extract(frames()).collect().sortBy(f => (f.doc_id, f.frame_id))
    assert(a.length > 500)
    assert(a.toSeq === b.toSeq)
    assert(a.forall(f => f.width >= 320 && f.height >= 240 &&
      f.mean_luma >= 0.0 && f.mean_luma <= 1.0))
  }

  test("mm_frame_sample plumbing and FrameFeatures agree on frame counts") {
    val viaQuery = graft.SparkEntry.queries("mm_frame_sample")(spark, "/root/testdata/sf0.001").count()
    val viaTyped = FrameFeatures.extract(frames()).count()
    assert(viaQuery === viaTyped)
  }
}
