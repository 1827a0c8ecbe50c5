package graft

import graft.operators.GraphEdges
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-14 wedge-family hub guards (SURVEY §5 round-14
  * notes): the (degree, id) orientation behind graph_triangles /
  * graph_clustering_coeff is a strict total-order orientation and
  * output-preserving vs the id-oriented enumeration, and the
  * oracle-mirrored HubCap on wedge centers is a no-op at gate scale
  * while provably binding (and binding ONLY on hub centers) on a
  * planted hub corpus.
  */
class GraphGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("fwdByDegree orients every pair exactly once, low (deg,id) -> high") {
    val pairs = GraphEdges.pairs(spark, sf).select(col("pa"), col("pb"))
    val fwd = GraphEdges.fwdByDegree(spark, sf)
    assert(fwd.count() === pairs.count(), "orientation must be a bijection on pairs")
    val deg = GraphEdges.deg(spark, sf)
    val bad = fwd
      .join(deg.select(col("u").as("s"), col("deg").as("ds")), Seq("s"))
      .join(deg.select(col("u").as("t"), col("deg").as("dt2")), Seq("t"))
      .filter(!(col("ds") < col("dt2") ||
        (col("ds") === col("dt2") && col("s") < col("t"))))
    assert(bad.count() === 0L, "every oriented edge must satisfy rank(s) < rank(t)")
    // the carried dt column IS t's degree (wedge ordering depends on it)
    val drift = fwd.join(deg.select(col("u").as("t"), col("deg")), Seq("t"))
      .filter(col("dt") =!= col("deg"))
    assert(drift.count() === 0L)
  }

  test("oriented triangle enumeration equals the id-oriented enumeration") {
    val oriented = SparkEntry.queries("graph_triangles")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the pre-r14 plan, recomputed independently: id-canonical wedges
    // (a<b<c by construction) closed against the edge set
    val e = GraphEdges.pairs(spark, sf).select(col("pa"), col("pb"))
    val naive = e.select(col("pa").as("a"), col("pb").as("b"))
      .join(e.select(col("pa").as("b"), col("pb").as("c")), Seq("b"))
      .join(e.select(col("pa").as("a"), col("pb").as("c")), Seq("a", "c"), "left_semi")
      .select(col("a"), col("b"), col("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(oriented === naive)
    assert(naive.nonEmpty, "gate corpus must actually contain triangles")
  }

  test("HubCap is a no-op on the gate corpus (max degree far below 64)") {
    val maxDeg = GraphEdges.deg(spark, sf).agg(max(col("deg"))).first().getLong(0)
    assert(maxDeg <= GraphEdges.HubCap / 2,
      s"gate max degree $maxDeg should leave 2x headroom under HubCap=${GraphEdges.HubCap} " +
        "(if a generator round densifies the graph, the mirrored cap keeps the gate " +
        "green but this margin check should be revisited)")
    // and therefore the capped adamic-adar equals the uncapped recomputation
    val capped = SparkEntry.queries("graph_adamic_adar")(spark, sf)
      .select(col("a"), col("b"), col("cn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val edges = GraphEdges.pairs(spark, sf).select(col("pa"), col("pb"))
    val sym = edges.select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(edges.select(col("pb").as("u"), col("pa").as("v")))
    val unc = sym.select(col("u").as("z"), col("v").as("a"))
      .join(sym.select(col("u").as("z"), col("v").as("b")), Seq("z"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cn"))
    val uncapped = unc.join(edges,
        unc("a") === edges("pa") && unc("b") === edges("pb"), "left_anti")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped === uncapped)
  }

  test("HubCap binds on a planted hub and drops ONLY hub-centered evidence") {
    import spark.implicits._
    // hub part 1000 co-purchased (support 2) with parts 1..70 -> its
    // symmetric degree 70 > HubCap; parts 1 and 2 ALSO share the
    // non-hub neighbor 2000 (degree 2)
    val rows = (1 to 70).flatMap { i =>
      Seq((2L * i, 1000L), (2L * i, i.toLong),
        (2L * i + 1, 1000L), (2L * i + 1, i.toLong))
    } ++ Seq((1001L, 2000L), (1001L, 1L), (1002L, 2000L),
      (1002L, 1L), (1003L, 2000L), (1003L, 2L), (1004L, 2000L), (1004L, 2L))
    val dir = etl.TmpDirs.dir("graphguard_hub")
    rows.toDF("l_orderkey", "l_partkey").write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val scored = SparkEntry.queries("graph_adamic_adar")(spark, dir)
      .select(col("a"), col("b"), col("cn")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(scored.nonEmpty)
    // (1,2): common neighbors are the hub (dropped) and 2000 (kept) ->
    // survives with cn = 1, the hub's evidence gone
    assert(scored.get((1L, 2L)) === Some(1L),
      s"pair (1,2) must keep exactly the non-hub common neighbor; got $scored")
    // (3,4): ONLY common neighbor is the hub -> the pair must not be
    // scored at all
    assert(!scored.contains((3L, 4L)),
      "a pair whose only common neighbor is the capped hub must be absent")
  }
}
