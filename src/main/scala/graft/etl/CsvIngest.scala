package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema'd CSV ingestion — the Spark-native form of the reference's
  * `ReadFromText(skip_header_lines=1)` + per-line `csv.reader` parse
  * (reference dataflow_pipeline.py:153-163, 57-99).
  *
  * Where the reference re-parses the schema JSON for EVERY line inside a
  * Map fn, here the schema is declared once on the scan: Spark's CSV
  * datasource handles quoting/escaping/UTF-8 natively, splits the file
  * across executors, and Catalyst prunes unused columns at the reader.
  */
object CsvIngest {

  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true, multiLine: Boolean = false): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("quote", "\"")
      .option("escape", "\"")
      // multiLine makes the file NON-splittable (one task per file) —
      // only opt in when quoted fields truly embed newlines; the default
      // keeps a 1 TB CSV splittable across executors.
      .option("multiLine", multiLine.toString)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** End-to-end analog of the reference's DataIngestion helper: JSON
    * schema string in, typed distributed DataFrame out.
    */
  def readWithJsonSchema(spark: SparkSession, path: String, schemaJson: String): DataFrame =
    read(spark, path, Schemas.fromBigQueryJson(schemaJson))
}
