package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

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

  /** PERMISSIVE parse with VISIBLE malformed-row capture: a row that
    * fails the schema keeps its raw line in `corruptCol` instead of
    * being silently nulled away (plain PERMISSIVE mode's behavior) —
    * the analog of the reference's per-line parse where a bad record
    * surfaces as an exception, not a null. Split the result with
    * `deadLetterSplit` and route the bad branch to a quarantine sink.
    */
  def readWithCorrupt(spark: SparkSession, path: String, schema: StructType,
                      header: Boolean = true,
                      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema.add(corruptCol, StringType))
      .csv(path)

  /** (good rows without the marker column, dead-letter rows). The frame
    * is cached first: Spark refuses to filter a raw CSV scan on ONLY the
    * internal corrupt-record column (SPARK-21610), and the cache also
    * keeps the two branches consistent with one parse pass. Cache
    * ownership: registered through graft.Caches — call
    * `graft.Caches.releaseAll()` after both branches are materialized,
    * or the parse cache lives for the session.
    */
  def deadLetterSplit(df: DataFrame,
                      corruptCol: String = "_corrupt_record"): (DataFrame, DataFrame) = {
    val parsed = graft.Caches.scoped(df)
    (parsed.filter(col(corruptCol).isNull).drop(corruptCol),
      parsed.filter(col(corruptCol).isNotNull))
  }
}
