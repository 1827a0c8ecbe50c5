package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** BigQuery-style JSON schema → Spark StructType.
  *
  * The reference declares table schemas as a JSON object
  * `{"fields": [{"name": ..., "type": ..., "mode": ...}, ...]}` and parses
  * them with `parse_table_schema_from_json` (reference
  * dataflow_pipeline.py:37-55, 77). We map the same declaration directly
  * onto Catalyst types so the CSV reader, the sinks, and downstream plans
  * all share one declared schema — Catalyst then prunes/pushes against it
  * for free.
  *
  * Parsed with Jackson (already on the Spark classpath) — handles quoted
  * braces, any key order, and nested RECORD fields.
  */
object Schemas {

  private def sparkType(field: JsonNode): DataType =
    field.get("type").asText().toUpperCase match {
      case "STRING"                 => StringType
      case "INTEGER" | "INT64"      => LongType
      case "FLOAT" | "FLOAT64"      => DoubleType
      case "NUMERIC"                => DecimalType(38, 9)
      case "BOOLEAN" | "BOOL"       => BooleanType
      case "TIMESTAMP" | "DATETIME" => TimestampType
      case "DATE"                   => DateType
      case "BYTES"                  => BinaryType
      case "RECORD" | "STRUCT"      => structOf(field.get("fields"))
      case other => throw new IllegalArgumentException(s"unsupported field type: $other")
    }

  private def structOf(fields: JsonNode): StructType = {
    require(fields != null && fields.isArray && fields.size > 0,
      "schema json has no fields array")
    StructType(fields.elements().asScala.map { f =>
      val name     = f.get("name").asText()
      val nullable = Option(f.get("mode")).forall(_.asText().toUpperCase != "REQUIRED")
      val base     = sparkType(f)
      val repeated = Option(f.get("mode")).exists(_.asText().toUpperCase == "REPEATED")
      StructField(name, if (repeated) ArrayType(base) else base, nullable)
    }.toArray)
  }

  /** Parse `{"fields": [...]}` (or a bare field array). */
  def fromBigQueryJson(json: String): StructType = {
    val root = new ObjectMapper().readTree(json)
    structOf(if (root.has("fields")) root.get("fields") else root)
  }
}
