package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Table sinks with the reference's write dispositions.
  *
  * The reference writes to BigQuery with CREATE_IF_NEEDED +
  * WRITE_TRUNCATE (reference dataflow_pipeline.py:167-179) and to local
  * CSV in DirectRunner mode (local_directrunner_pipeline.py:112-114).
  * Spark's equivalent warehouse-grade sink is partitioned parquet;
  * csv/json cover the export paths.
  */
object Sinks {

  sealed trait Disposition { def mode: SaveMode }
  /** WRITE_TRUNCATE: replace table contents. */
  case object Truncate extends Disposition { val mode = SaveMode.Overwrite }
  /** WRITE_APPEND: add to existing contents. */
  case object Append extends Disposition { val mode = SaveMode.Append }
  /** WRITE_EMPTY: fail if data already present. */
  case object FailIfExists extends Disposition { val mode = SaveMode.ErrorIfExists }

  /** Managed-catalog-table sink — the closest Spark analog of the
    * reference's named-table write (`BigQuerySink(dataset.table,
    * CREATE_IF_NEEDED, WRITE_TRUNCATE)`, reference
    * dataflow_pipeline.py:167-179): `saveAsTable` creates the table if
    * absent (CREATE_IF_NEEDED), and the disposition decides what happens
    * to existing contents (Truncate replaces them, Append adds,
    * FailIfExists errors). On a cluster the same call targets the shared
    * metastore; locally it is the session catalog + warehouse dir.
    */
  def table(df: DataFrame, name: String, disposition: Disposition = Truncate): Unit =
    df.write.mode(disposition.mode).saveAsTable(name)

  def parquet(df: DataFrame, path: String, disposition: Disposition = Truncate,
              partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(disposition.mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def csv(df: DataFrame, path: String, disposition: Disposition = Truncate): Unit =
    df.write.mode(disposition.mode).option("header", "true").csv(path)

  def json(df: DataFrame, path: String, disposition: Disposition = Truncate): Unit =
    df.write.mode(disposition.mode).json(path)
}
