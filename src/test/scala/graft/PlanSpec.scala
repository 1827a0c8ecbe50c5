package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the properties that keep these queries fast
  * at 100 TB, pinned as assertions so a refactor can't silently lose
  * them (SURVEY §5 audit, round 3).
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(FormattedMode)

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "scan must prune unused columns")
  }

  test("q5_regional_join broadcasts every dimension") {
    val p = plan("q5_regional_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 5, p.take(2000))
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    assert(plan("sort_topk_global").contains("TakeOrderedAndProject"))
  }

  test("per-group top-k gets WindowGroupLimit rank pushdown") {
    assert(plan("window_topk_per_group").contains("WindowGroupLimit"))
  }

  test("broadcast dim join has no shuffle on the fact side") {
    val p = plan("join_broadcast_dim")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("ann brute force broadcasts the probe set") {
    assert(plan("ann_bruteforce_topk").contains("BroadcastNestedLoopJoin"))
  }

  test("ntile deciles rank via distributed range sort, not a global window") {
    val p = plan("window_ntile_decile")
    assert(p.contains("rangepartitioning"), "expected a range repartition of the data")
    assert(!p.contains("ntile("), "must not fall back to the single-partition global ntile")
  }

  test("ngram top-k gets WindowGroupLimit rank pushdown") {
    assert(plan("text_ngram_topk").contains("WindowGroupLimit"))
  }

  test("stratified sample scan prunes to the projected columns") {
    val p = plan("etl_stratified_sample")
    assert(p.contains("ReadSchema"), p.take(500))
    assert(!p.contains("text:string") && !p.contains("n_chars"),
      "sample scan must not read unprojected document columns")
  }

  test("partitioned sink output gets partition pruning on read") {
    import org.apache.spark.sql.functions.col
    // materialize the partitioned layout once
    SparkEntry.queries("etl_sink_roundtrip")(spark, sf).queryExecution.toRdd.count()
    val dir = etl.TmpDirs.dir("sinkrt_sf0.001")
    val p = spark.read.parquet(dir).filter(col("source") === "src3")
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("PartitionFilters: [isnotnull(source"), p.take(1500))
  }
}
