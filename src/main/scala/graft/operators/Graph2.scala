package graft.operators

import graft.Query
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph wave 2 over the part co-purchase graph (same edge derivation
  * as graph_pagerank: undirected part pairs bought together in >= 2
  * orders): Katz centrality, 2-hop reach, and the rich-club density
  * curve. Same scale discipline as Graph.scala — every iteration is an
  * edges-vs-ranks equi-join plus a partial agg on the destination key
  * (O(E) messages), and all scores are scaled integers so the engines
  * agree bit for bit.
  */
object Graph2 {

  private val Q = 1000000000000L // rank quantum (graph_pagerank's)

  /** Undirected co-purchase edges, one row per direction — read from
    * the shared materialized index ([[GraphEdges]]), not re-derived.
    */
  private def sym(s: SparkSession, d: String): DataFrame = GraphEdges.sym(s, d)

  // e/sym are AS MATERIALIZED (r19): DuckDB inlines plain CTEs into
  // every reference — graph_components' recursive walk re-derived the
  // whole co-purchase self-join once per iteration, and the iterative
  // katz/reach chains reference sym 3+ times (identical rows, same fix
  // as the dedup cluster oracles).
  private val symSql =
    """li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |      FROM li a JOIN li b
      |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |sym AS MATERIALIZED (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e)""".stripMargin

  val entries: Seq[(String, Query)] = Seq(

    // KATZ CENTRALITY, 3 damped iterations: c_{t+1}(u) = Q + sum over
    // neighbors of c_t(v) div 8 (beta = Q, alpha = 1/8 — dyadic, so
    // the div is exact and both engines produce identical integers).
    // Unlike PageRank there's no degree normalization: Katz rewards
    // being near well-connected mass, the influence flavor used for
    // catalog anchors. Each iteration = one equi-join + one partial
    // agg on the destination key, O(E) messages.
    "graph_katz" -> Query(
      (s, d) => {
        val e = graft.Caches.scoped(sym(s, d))
        val nodes = e.select(col("u")).distinct()
        def step(c: DataFrame): DataFrame =
          nodes.join(
              e.join(c.withColumnRenamed("u", "v"), Seq("v"))
                .groupBy(col("u"))
                .agg(sum(expr("katz div 8")).as("m")),
              Seq("u"), "left")
            .select(col("u"), (lit(Q) + coalesce(col("m"), lit(0L))).as("katz"))
        val c0 = nodes.select(col("u"), lit(Q).as("katz"))
        step(step(step(c0))).select(col("u").as("node"), col("katz").as("katz_q"))
      },
      Some(s"""WITH $symSql,
             |nodes AS (SELECT DISTINCT u FROM sym),
             |c0 AS (SELECT u, CAST($Q AS BIGINT) AS katz FROM nodes),
             |c1 AS (SELECT n.u, $Q + COALESCE(SUM(c0.katz // 8), 0) AS katz
             |       FROM nodes n LEFT JOIN sym ON sym.u = n.u
             |       LEFT JOIN c0 ON c0.u = sym.v GROUP BY 1),
             |c2 AS (SELECT n.u, $Q + COALESCE(SUM(c1.katz // 8), 0) AS katz
             |       FROM nodes n LEFT JOIN sym ON sym.u = n.u
             |       LEFT JOIN c1 ON c1.u = sym.v GROUP BY 1),
             |c3 AS (SELECT n.u, $Q + COALESCE(SUM(c2.katz // 8), 0) AS katz
             |       FROM nodes n LEFT JOIN sym ON sym.u = n.u
             |       LEFT JOIN c2 ON c2.u = sym.v GROUP BY 1)
             |SELECT u AS node, CAST(katz AS BIGINT) AS katz_q FROM c3""".stripMargin)
    ),

    // 2-HOP REACH: how many distinct nodes each node can touch within
    // two hops THROUGH NON-HUB intermediates (direct neighbors +
    // friends-of-friends that are not already neighbors or self) — the
    // influence-radius metric for seed selection. The middle vertex of
    // the wedge join is capped at [[graft.operators.GraphEdges.HubCap]]
    // (mirrored in the oracle SQL): reach THROUGH a hub is the hub's
    // own reach, not the node's — and an uncapped hub middle explodes
    // deg² (u, w) rows, measured 8.7× superlinear on the committed
    // power-law corpus. Capped wedge volume is ≤ 64·2|E|, linear in
    // edges; no-op at gate scale (max degree 6-13). Dedup happens on
    // (u, w) pairs, never on neighbor SETS in one buffer.
    "graph_reach_2hop" -> Query(
      (s, d) => {
        val e = graft.Caches.scoped(sym(s, d))
        val deg = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        val mid = e.join(
          deg.filter(col("deg") <= GraphEdges.HubCap)
            .select(col("u").as("v")), Seq("v"), "left_semi")
        val two = mid.select(col("u"), col("v").as("z"))
          .join(e.select(col("u").as("z"), col("v").as("w")), Seq("z"))
          .filter(col("u") =!= col("w"))
          .select(col("u"), col("w")).distinct()
          .join(e.select(col("u"), col("v").as("w")), Seq("u", "w"),
            "left_anti")
          .groupBy(col("u")).agg(count(lit(1)).as("n2"))
        deg.join(two, Seq("u"), "left")
          .select(col("u").as("node"), col("deg"),
            coalesce(col("n2"), lit(0L)).as("n_2hop"),
            (col("deg") + coalesce(col("n2"), lit(0L))).as("reach"))
      },
      Some(s"""WITH $symSql,
             |deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY 1),
             |two AS (SELECT t.u, COUNT(*) AS n2 FROM (
             |          SELECT DISTINCT s1.u, s2.v AS w
             |          FROM sym s1 JOIN sym s2 ON s2.u = s1.v
             |          JOIN deg dz ON dz.u = s1.v
             |            AND dz.deg <= ${GraphEdges.HubCap}
             |          WHERE s2.v <> s1.u) t
             |        WHERE NOT EXISTS (SELECT 1 FROM sym n
             |          WHERE n.u = t.u AND n.v = t.w)
             |        GROUP BY 1)
             |SELECT deg.u AS node, CAST(deg AS BIGINT) AS deg,
             |  CAST(COALESCE(n2, 0) AS BIGINT) AS n_2hop,
             |  CAST(deg + COALESCE(n2, 0) AS BIGINT) AS reach
             |FROM deg LEFT JOIN two ON two.u = deg.u""".stripMargin)
    ),

    // RICH-CLUB CURVE: among nodes with degree > k, how dense is the
    // subgraph they span — the does-the-core-trade-with-itself audit
    // (hub assortativity) at k in {2,4,8,16}. Degree table joins onto
    // both edge endpoints, then a x4 threshold explode partial-aggs
    // map-side; density is integer bp of the complete-graph edge count.
    "graph_rich_club" -> Query(
      (s, d) => {
        val e = graft.Caches.scoped(sym(s, d))
        val deg = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        val ks = array(Seq(2, 4, 8, 16).map(lit): _*)
        val nk = deg.select(col("deg"), explode(ks).as("k"))
          .filter(col("deg") > col("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("n_nodes"))
        val ek = e.filter(col("u") < col("v"))
          .join(deg.select(col("u"), col("deg").as("da")), Seq("u"))
          .join(deg.select(col("u").as("v"), col("deg").as("db")), Seq("v"))
          .select(explode(ks).as("k"), col("da"), col("db"))
          .filter(col("da") > col("k") && col("db") > col("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("n_edges"))
        nk.join(ek, Seq("k"), "left")
          .select(col("k").cast("long").as("k"), col("n_nodes"),
            coalesce(col("n_edges"), lit(0L)).as("n_edges"),
            when(col("n_nodes") >= 2,
              expr("coalesce(n_edges, 0) * 2 * 10000 div (n_nodes * (n_nodes - 1))"))
              .otherwise(lit(0L)).as("density_bp"))
      },
      Some(s"""WITH $symSql,
             |deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY 1),
             |ks AS (SELECT unnest([2, 4, 8, 16]) AS k),
             |nk AS (SELECT k, COUNT(*) AS n_nodes FROM deg, ks
             |       WHERE deg > k GROUP BY 1),
             |ek AS (SELECT k, COUNT(*) AS n_edges
             |       FROM sym JOIN deg da ON da.u = sym.u
             |       JOIN deg db ON db.u = sym.v
             |       CROSS JOIN ks
             |       WHERE sym.u < sym.v AND da.deg > k AND db.deg > k
             |       GROUP BY 1)
             |SELECT CAST(nk.k AS BIGINT) AS k,
             |  CAST(n_nodes AS BIGINT) AS n_nodes,
             |  CAST(COALESCE(n_edges, 0) AS BIGINT) AS n_edges,
             |  CAST(CASE WHEN n_nodes >= 2
             |    THEN COALESCE(n_edges, 0) * 2 * 10000 // (n_nodes * (n_nodes - 1))
             |    ELSE 0 END AS BIGINT) AS density_bp
             |FROM nk LEFT JOIN ek ON ek.k = nk.k""".stripMargin)
    ),

    // CONNECTED COMPONENTS over the co-purchase graph — the exact
    // connectivity primitive the approximate community entries (LPA,
    // modularity) sit on top of, and the graph twin of
    // vec_cluster_components: per-node minimum-reachable-id labels via
    // the shared min-label-propagation + pointer-jumping fold
    // (O(|E|·diameter-ish) messages with the jump squaring progress;
    // converged-or-throw, never silently wrong). Reuses
    // dedup.DedupQueries.connectedComponents — one implementation, two
    // registered domains (embedding near-dup clusters / product graph).
    // Oracle: recursive CTE with set-semantics UNION, bounded the same
    // way BFS's is.
    "graph_components" -> Query(
      (s, d) => {
        val p = GraphEdges.pairs(s, d)
          .select(col("pa").as("da"), col("pb").as("db"))
        graft.dedup.DedupQueries.connectedComponents(p)
          .select(col("doc_id").as("node"), col("cluster_id").as("component_id"))
      },
      Some(s"""WITH RECURSIVE $symSql,
             |nodes AS (SELECT DISTINCT u AS node FROM sym),
             |walk(node, lbl) AS (
             |  SELECT node, node FROM nodes
             |  UNION
             |  SELECT s.v, w.lbl FROM walk w JOIN sym s ON s.u = w.node)
             |SELECT node, MIN(lbl) AS component_id FROM walk GROUP BY node""".stripMargin)
    )
  )
}
