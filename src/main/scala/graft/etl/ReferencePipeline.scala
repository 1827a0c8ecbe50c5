package graft.etl

import graft.Session
import org.apache.spark.sql.functions._

/** Runnable end-to-end analog of the reference pipeline: schema'd CSV in,
  * raw table + per-key aggregate table out.
  *
  * Mirrors reference dataflow_pipeline.py stage for stage:
  *  - ReadFromText(skip_header_lines=1) + parse_method (lines 153-163,
  *    57-99)            -> CsvIngest.readWithJsonSchema (schema declared
  *                         once on the splittable scan, not re-parsed
  *                         per line),
  *  - raw BigQuerySink WRITE_TRUNCATE (167-179)
  *                      -> Sinks.parquet(..., Truncate),
  *  - project -> KV -> GroupByKey -> sum (187-206)
  *                      -> groupBy(key).agg(sum, count) (map-side
  *                         partial combine; the Beam formulation
  *                         materializes every group's values),
  *  - transformed sink (210-222) -> second truncate-mode table.
  *
  * Usage: runMain graft.etl.ReferencePipeline <in.csv> <outDir>
  * With no args, runs a self-contained demo from the documents table.
  */
object ReferencePipeline {

  /** Listings-style schema (reference resources/schema.json shape). */
  val demoSchemaJson: String =
    """{"fields": [
      |  {"name": "doc_id",  "type": "INTEGER", "mode": "REQUIRED"},
      |  {"name": "lang",    "type": "STRING"},
      |  {"name": "source",  "type": "STRING"},
      |  {"name": "n_chars", "type": "INTEGER"}
      |]}""".stripMargin

  def main(args: Array[String]): Unit = {
    val spark = Session.local()
    val (inCsv, outDir) = args match {
      case Array(i, o) => (i, o)
      case _ =>
        // demo input: dump the documents table to CSV first
        val out = "/root/repo/target/tmp/refpipe"
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .write.mode("overwrite").option("header", "true").csv(s"$out/in")
        (s"$out/in", s"$out/out")
    }

    val counts = Pipeline
      .from(s => CsvIngest.readWithJsonSchema(s, inCsv, demoSchemaJson))
      .branch("raw")(identity)(df =>
        Sinks.parquet(df, s"$outDir/raw", Sinks.Truncate))
      .branch("transform")(df =>
        df.groupBy(col("source"))
          .agg(count(lit(1)).as("count_listings"), sum(col("n_chars")).as("sum_chars")))(df =>
        Sinks.parquet(df, s"$outDir/transform", Sinks.Truncate))
      .run(spark, cacheSource = true)

    println(s"[reference-pipeline] rows written per branch: $counts")
    spark.stop()
  }
}
