package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Hashing
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    ev.select($"event_id", unix_micros($"ts").as("us"), $"ts").orderBy($"event_id").show(3, false)
    spark.range(1).select(
      Hashing.md5Long60(lit("hello")).as("h60"),
      Hashing.md5Long32(lit("hello")).as("h32")).show(false)
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li.agg(sum($"l_extendedprice".cast("decimal(18,6)")).cast("double").as("s"),
           sum(($"l_extendedprice"*(lit(1)-$"l_discount")).cast("decimal(18,6)")).cast("double").as("s2"))
      .show(false)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.filter($"doc_id" < 3).select($"doc_id",
      Hashing.simHash60(split($"text","\\s+")).as("simhash"),
      Hashing.positionalFingerprint(split($"text","\\s+")).as("fp")).orderBy("doc_id").show(false)
    spark.stop()
  }
}
