package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the approximate operators: the correctness gate
  * proves they compute WHAT they claim deterministically; these tests
  * prove the claims are WORTH computing — ANN candidates actually
  * contain the true neighbors, sketches actually land near the exact
  * answers. Deterministic inputs => these are stable numbers, so the
  * floors are tight enough to catch a degenerate hash/probe choice
  * (a 6-plane single-table LSH scored 0.12 here; the shipped 5x3
  * multi-table index scores 0.74).
  */
class QualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def topkSets(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sf)
      .select(col("qid").cast("long"), col("vec_id").cast("long"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  private def meanRecallAt5(name: String): Double = {
    val truth = topkSets("ann_bruteforce_topk")
    val got = topkSets(name)
    val recalls = truth.map { case (q, t) => got.getOrElse(q, Set.empty).count(t).toDouble / 5 }
    recalls.sum / recalls.size
  }

  test("ann_lsh_topk recall@5 vs brute force clears 0.5") {
    val r = meanRecallAt5("ann_lsh_topk")
    assert(r >= 0.5, s"LSH mean recall@5 = $r")
  }

  test("ann_ivf_topk recall@5 vs brute force clears 0.4") {
    val r = meanRecallAt5("ann_ivf_topk")
    assert(r >= 0.4, s"IVF mean recall@5 = $r")
  }

  test("approx_count_distinct lands within 5% of exact per group") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
    // agg_distinct counts parts/supps; recompute the exact twin of each
    // approximated column directly so the pairing is explicit
    val exactDf = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
    val joined = approx.join(exactDf, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (ap, ep) = (r.getAs[Long]("approx_parts"), r.getAs[Long]("exact_parts"))
      val (ao, eo) = (r.getAs[Long]("approx_orders"), r.getAs[Long]("exact_orders"))
      assert(math.abs(ap - ep).toDouble / ep <= 0.05, s"parts: approx $ap vs exact $ep")
      assert(math.abs(ao - eo).toDouble / eo <= 0.05, s"orders: approx $ao vs exact $eo")
    }
  }

  test("approx_percentile lands within 2% of the exact percentile per group") {
    val approx = SparkEntry.queries("agg_approx_percentiles")(spark, sf)
    val exact = SparkEntry.queries("agg_percentiles")(spark, sf)
      .select(col("l_returnflag"), col("p50"), col("p99"))
    val joined = approx.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      def rel(a: Double, e: Double) = math.abs(a - e) / e
      assert(rel(r.getAs[Double]("p50_approx"), r.getAs[Double]("p50")) <= 0.02,
        s"p50 drift: $r")
      assert(rel(r.getAs[Double]("p99_approx"), r.getAs[Double]("p99")) <= 0.02,
        s"p99 drift: $r")
    }
  }
}
