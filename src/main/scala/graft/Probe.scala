package graft

/** Scratch main: dump formatted plans for the headline queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Session.local()
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Seq("q1_agg", "q3_top_revenue", "q5_regional_join", "join_broadcast_dim",
      "sort_topk_global", "window_topk_per_group", "asof_join",
      "dedup_minhash_lsh", "ann_bruteforce_topk").foreach { name =>
      println(s"\n===================== $name =====================")
      println(SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
