package graft.etl

import graft.{Query, Tables}
import org.apache.spark.sql.functions._

/** The reference's observable ETL surface as oracle-checked queries.
  *
  * Reference shape (dataflow_pipeline.py:149-222): CSV read with a
  * JSON-declared schema, fan-out to a raw sink and a transformed
  * (project -> key-value -> GroupByKey -> per-key sum) sink.
  */
object EtlQueries {

  /** BigQuery-style schema for the customer CSV round-trip. */
  private val customerSchemaJson =
    """{"fields": [
      |  {"name": "c_custkey",    "type": "INTEGER", "mode": "REQUIRED"},
      |  {"name": "c_name",       "type": "STRING",  "mode": "NULLABLE"},
      |  {"name": "c_nationkey",  "type": "INTEGER", "mode": "NULLABLE"},
      |  {"name": "c_acctbal",    "type": "FLOAT",   "mode": "NULLABLE"},
      |  {"name": "c_mktsegment", "type": "STRING",  "mode": "NULLABLE"}
      |]}""".stripMargin

  val entries: Seq[(String, Query)] = Seq(

    // Beam ReadFromText(skip_header_lines=1) + parse_method analog
    // (reference dataflow_pipeline.py:57-99,153): dump the customer table
    // to headered CSV, re-ingest it through the JSON-schema'd CSV reader,
    // and emit the typed projection. The oracle is the straight parquet
    // projection — green iff the CSV round-trip is lossless and typed.
    "etl_ingest_schema" -> Query(
      (s, d) => {
        val csvDir = TmpDirs.dir(s"ingest_${Bucketing.dirTag(d)}")
        Tables.customer(s, d)
          .write.mode("overwrite").option("header", "true").csv(csvDir)
        CsvIngest.readWithJsonSchema(s, csvDir, customerSchemaJson)
      },
      Some("""SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
             |       c_acctbal, c_mktsegment
             |FROM customer""".stripMargin)
    ),

    // Flagship: the reference's one real transformation — project ->
    // key-value -> GroupByKey -> per-key sum+count
    // (dataflow_pipeline.py:187-206, neighbourhood/listings analog).
    "etl_groupby_count" -> Query(
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars")),
      Some("""SELECT source, COUNT(*) AS n_docs,
             |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY source""".stripMargin)
    ),

    // One source fanned out to two branches (raw passthrough + aggregate),
    // union-tagged — the reference's two-sink pipeline as one checkable
    // result set (dataflow_pipeline.py:167-222).
    "etl_multi_branch" -> Query(
      (s, d) => {
        val o = Tables.orders(s, d)
        val raw = o.select(
          lit("raw").as("branch"),
          col("o_orderkey").cast("string").as("k"),
          col("o_totalprice").as("v"))
        val agg = o.groupBy(col("o_orderstatus"))
          .agg(sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("v"))
          .select(lit("agg").as("branch"), col("o_orderstatus").as("k"), col("v"))
        raw.unionAll(agg)
      },
      Some("""SELECT 'raw' AS branch, CAST(o_orderkey AS VARCHAR) AS k, o_totalprice AS v FROM orders
             |UNION ALL
             |SELECT 'agg' AS branch, o_orderstatus AS k,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS v
             |FROM orders GROUP BY o_orderstatus""".stripMargin)
    )
  )
}
