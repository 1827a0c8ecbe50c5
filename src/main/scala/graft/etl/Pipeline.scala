package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Composable batch pipeline: one source fanned out to N transformed
  * sinks — the reference's shape (raw branch + aggregated branch off one
  * CSV read, reference dataflow_pipeline.py:149-222), generalized.
  *
  * The source DataFrame is shared across branches; Spark recomputes or
  * reuses the scan per action, and callers can `.persist()` the source
  * when branch count × scan cost justifies caching. Runs identically on
  * local[N] and a cluster (the reference needs two separate scripts for
  * DirectRunner vs Dataflow; here the runner is just the master URL).
  */
final case class Pipeline(
    source: SparkSession => DataFrame,
    branches: Seq[(String, DataFrame => DataFrame, DataFrame => Unit)] = Nil
) {

  def branch(name: String)(transform: DataFrame => DataFrame)(sink: DataFrame => Unit): Pipeline =
    copy(branches = branches :+ ((name, transform, sink)))

  /** Execute all branches; returns branch name → row count written.
    * Each branch output is persisted across its two actions (sink +
    * count) so the branch plan — and the source scan — runs once, and
    * the reported count is exactly the rows written.
    */
  def run(spark: SparkSession, cacheSource: Boolean = false): Map[String, Long] = {
    val src = if (cacheSource && branches.size > 1) source(spark).persist() else source(spark)
    try branches.map { case (name, transform, sink) =>
      val out = transform(src).persist()
      try { sink(out); name -> out.count() }
      finally { out.unpersist(); () }
    }.toMap
    finally if (cacheSource && branches.size > 1) { src.unpersist(); () }
  }
}

object Pipeline {
  def from(source: SparkSession => DataFrame): Pipeline = Pipeline(source)
}
