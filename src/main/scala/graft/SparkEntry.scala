package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7.
  *
  * Every operator registers here as a `(SparkSession, sfDir) => DataFrame`
  * plus, when SQL-expressible, a DuckDB oracle statement the driver
  * hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Ordered registration list — exposed so QueriesSmokeSpec can prove
    * NO key registers twice (a duplicate would silently shadow the
    * earlier implementation when folded into the Map below).
    */
  private[graft] val modules: Seq[(String, Query)] =
    etl.EtlQueries.entries ++
      etl.IngestQueries.entries ++
      etl.GovernanceQueries.entries ++
      operators.Relational.entries ++
      operators.Temporal.entries ++
      operators.Extended.entries ++
      operators.Analytics.entries ++
      operators.Analytics2.entries ++
      operators.Analytics3.entries ++
      operators.TpchMore.entries ++
      operators.Graph.entries ++
      operators.Graph2.entries ++
      dedup.DedupQueries.entries ++
      dedup.DedupCalibration.entries ++
      similarity.SimilarityQueries.entries ++
      similarity.VectorOps.entries ++
      text.TextQueries.entries ++
      text.CorpusQueries.entries ++
      text.RetrievalQueries.entries ++
      multimodal.MultimodalQueries.entries ++
      streaming.StreamTwinQueries.entries

  /** Flagship: the reference's project -> GroupByKey -> per-key sum+count
    * (dataflow_pipeline.py:187-206) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("etl_groupby_count")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map { case (name, q) => name -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver falls back to a rows-only check).
    */
  def oracleSql: Map[String, String] =
    modules.collect { case (name, Query(_, Some(sql))) => name -> sql }.toMap
}
