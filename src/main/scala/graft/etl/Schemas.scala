package graft.etl

import org.apache.spark.sql.types._

/** BigQuery-style JSON schema → Spark StructType.
  *
  * The reference declares table schemas as a JSON array of
  * `{"name": ..., "type": ..., "mode": ...}` fields and parses them with
  * `parse_table_schema_from_json` (reference dataflow_pipeline.py:37-55,
  * 77). We map the same declaration directly onto Catalyst types so the
  * CSV reader, the sinks, and downstream plans all share one declared
  * schema — Catalyst then prunes/pushes against it for free.
  */
object Schemas {

  private def sparkType(bq: String): DataType = bq.toUpperCase match {
    case "STRING"                => StringType
    case "INTEGER" | "INT64"     => LongType
    case "FLOAT" | "FLOAT64"     => DoubleType
    case "NUMERIC"               => DecimalType(38, 9)
    case "BOOLEAN" | "BOOL"      => BooleanType
    case "TIMESTAMP" | "DATETIME" => TimestampType
    case "DATE"                  => DateType
    case "BYTES"                 => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported field type: $other")
  }

  /** Parse `[{"name": "x", "type": "STRING", "mode": "NULLABLE"}, ...]`.
    * Minimal recursive-descent over the JSON array — no library deps.
    */
  def fromBigQueryJson(json: String): StructType = {
    val fieldRe =
      """\{[^}]*?"name"\s*:\s*"([^"]+)"[^}]*?"type"\s*:\s*"([^"]+)"[^}]*?\}""".r
    val modeRe = """"mode"\s*:\s*"([^"]+)"""".r
    val fields = fieldRe.findAllMatchIn(json).map { m =>
      val obj      = m.matched
      val nullable = modeRe.findFirstMatchIn(obj).forall(_.group(1).toUpperCase != "REQUIRED")
      StructField(m.group(1), sparkType(m.group(2)), nullable)
    }.toArray
    require(fields.nonEmpty, s"no fields parsed from schema json: $json")
    StructType(fields)
  }
}
