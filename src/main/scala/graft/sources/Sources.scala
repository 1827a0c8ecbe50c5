package graft.sources

import graft.etl.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Unified typed readers. Every reader takes the schema ONCE (Spark
  * StructType or the reference's BigQuery-style JSON declaration) so
  * Catalyst can prune/push into the scan; all formats are splittable
  * by default.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    graft.etl.CsvIngest.read(spark, path, schema, header)

  /** JSON-lines (one object per line) — the interchange format LLM
    * corpora ship in. Schema declared, not inferred: inference would
    * scan the data twice and guess types.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def jsonlWithJsonSchema(spark: SparkSession, path: String, schemaJson: String): DataFrame =
    jsonl(spark, path, Schemas.fromBigQueryJson(schemaJson))
}
