package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.functions._

/** Iterative link analysis (PageRank) — the graph family beyond
  * connected components.
  *
  * The graph is the part CO-PURCHASE graph (nodes = parts, undirected
  * edges = pairs bought together in >= 2 orders — basket_pairs'
  * candidate machinery), read from the SHARED materialized edge index
  * ([[GraphEdges]]) every query in the family amortizes: the lineitem
  * self-join is paid once per data dir, not once per query. The ranks
  * answer "which products anchor the catalog". Two damped power
  * iterations with ALL arithmetic in scaled integers — rank quantum
  * 1e-12 of total mass — so every engine computes bit-identical ranks:
  * contribution = r div deg, damping = (85·Σ) div 100, teleport =
  * (15·(Q div n)) div 100. The scalars (n and the constants derived
  * from it) ride the DAG as a broadcast 1-row frame
  * ([[GraphEdges.withScalars]]) — no separate driver-side count job;
  * each iteration is one edges⋈ranks equi-join + one partial agg on
  * the destination key — the Pregel message-passing shape in vanilla
  * DataFrame ops.
  */
object Graph {

  private val Q = 1000000000000L // total rank mass (integer quantum)

  val entries: Seq[(String, Query)] = Seq(

    "graph_pagerank" -> Query(
      (s, d) => {
        val edges = graft.Caches.scoped(GraphEdges.sym(s, d))
        val deg = graft.Caches.scoped(
          edges.groupBy(col("u")).agg(count(lit(1)).as("deg")))
        // n and the teleport constants fold into the DAG as a 1-row
        // broadcast — the query is ONE job, no scalar-probe action
        val k = deg.agg(count(lit(1)).as("n"))
          .select(expr(s"${Q}L div n").as("r0"),
            expr(s"(15L * (${Q}L div n)) div 100L").as("base"))
        var ranks = GraphEdges.withScalars(
            deg.select(col("u").as("node"), col("deg")), k)
          .select(col("node"), col("deg"), col("r0").as("r"))
        (1 to 2).foreach { _ =>
          val contrib = ranks.select(col("node").as("u"), expr("r div deg").as("c"))
          val inSum = edges.join(contrib, Seq("u"))
            .groupBy(col("v")).agg(sum(col("c")).as("sum_c"))
          ranks = GraphEdges.withScalars(
              deg.select(col("u").as("node"), col("deg"))
                .join(inSum, col("node") === col("v"), "left_outer"), k)
            .select(col("node"), col("deg"),
              (col("base") +
                expr("coalesce(sum_c, 0L) * 85 div 100")).as("r"))
        }
        ranks.select(col("node").as("part"), col("deg"), col("r").as("rank_q"))
      },
      Some(s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |          FROM li a JOIN li b
             |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |edges AS (SELECT pa AS u, pb AS v FROM pairs
             |          UNION ALL SELECT pb, pa FROM pairs),
             |deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY 1),
             |nn AS (SELECT COUNT(*) AS n FROM deg),
             |k AS (SELECT n, $Q // n AS r0, (15 * ($Q // n)) // 100 AS base FROM nn),
             |r1 AS (SELECT d.u AS node, d.deg,
             |         k.base + COALESCE(CAST(s.sum_c AS BIGINT), 0) * 85 // 100 AS r
             |       FROM deg d CROSS JOIN k
             |       LEFT JOIN (SELECT e.v, SUM(k2.r0 // d2.deg) AS sum_c
             |                  FROM edges e
             |                  JOIN deg d2 ON e.u = d2.u CROSS JOIN k k2
             |                  GROUP BY e.v) s ON d.u = s.v),
             |r2 AS (SELECT d.u AS node, d.deg,
             |         k.base + COALESCE(CAST(s.sum_c AS BIGINT), 0) * 85 // 100 AS r
             |       FROM deg d CROSS JOIN k
             |       LEFT JOIN (SELECT e.v, SUM(r1.r // d2.deg) AS sum_c
             |                  FROM edges e
             |                  JOIN deg d2 ON e.u = d2.u
             |                  JOIN r1 ON r1.node = e.u
             |                  GROUP BY e.v) s ON d.u = s.v)
             |SELECT node AS part, deg, r AS rank_q FROM r2""".stripMargin)
    ),

    // TRIANGLE enumeration over the co-purchase graph — the clustering
    // signal (closed wedges) community detection and graph-quality
    // audits start from. Edges are oriented low→high by (degree, id) —
    // the "forward" algorithm — so each triangle is found exactly once
    // at its minimum-rank vertex: one equi-join builds the wedges (two
    // out-edges of the same source), one left-semi equi-join closes
    // them against the oriented edge set, and the output re-sorts each
    // triple by id, so the result set is IDENTICAL to the id-oriented
    // enumeration (oracle unchanged). The orientation is the hub
    // guard: per-vertex wedge fan-out is the out-degree, which the
    // (degree, id) order bounds at O(√|E|) for any graph — on the
    // committed power-law corpus (tools/gen_powerlaw.py, hub degree
    // 12.9k) the id-oriented wedge join pays Σ deg² = 388M rows where
    // this one stays near-linear. Never a cross product. r15: the
    // close output is the shared materialized [[GraphEdges.triangles]]
    // frame — clustering_coeff reads the same buckets instead of
    // re-running the wedge join.
    "graph_triangles" -> Query(
      (s, d) => GraphEdges.triangles(s, d),
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |      FROM li a JOIN li b
             |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
             |SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
             |FROM e e1 JOIN e e2 ON e2.pa = e1.pb
             |WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.pa = e1.pa AND e3.pb = e2.pb)""".stripMargin)
    ),

    // LINK PREDICTION scoring: common-neighbor count and neighbor-set
    // Jaccard for every existing edge — the similarity features
    // recommendation and graph-cleanup pipelines rank candidate links
    // by. Wedges come from ONE equi-join of the symmetric adjacency
    // list on the shared center, with centers capped at
    // [[GraphEdges.HubCap]] (mirrored in the oracle SQL): a hub center
    // explodes deg² pairs while carrying no discriminative signal (a
    // part bought with everything predicts nothing), so the cap keeps
    // wedge volume ≤ 64·2|E| — linear in edges, never a cross product
    // (no-op at gate scale, max degree 6-13). Pair counts collapse in
    // a map-side partial agg and join back onto the edge list with
    // broadcast-size degree tables riding along. The Jaccard ships in
    // integer basis points ((10000·cn) div (deg_a + deg_b − cn)) so no
    // float ever crosses the oracle boundary.
    "graph_link_predict" -> Query(
      (s, d) => {
        val edges = graft.Caches.scoped(
          GraphEdges.pairs(s, d).select(col("pa"), col("pb")))
        val sym = edges.select(col("pa").as("u"), col("pb").as("v"))
          .unionAll(edges.select(col("pb").as("u"), col("pa").as("v")))
        val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        val ctr = sym.join(
          deg.filter(col("deg") <= GraphEdges.HubCap).select(col("u")), Seq("u"),
          "left_semi")
        val cn = ctr.select(col("u").as("c"), col("v").as("a"))
          .join(ctr.select(col("u").as("c"), col("v").as("b")), Seq("c"))
          .filter(col("a") < col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cn"))
        edges
          .join(cn, col("pa") === col("a") && col("pb") === col("b"), "left_outer")
          .select(col("pa"), col("pb"), coalesce(col("cn"), lit(0L)).as("cn"))
          .join(deg.select(col("u").as("pa"), col("deg").as("deg_a")), Seq("pa"))
          .join(deg.select(col("u").as("pb"), col("deg").as("deg_b")), Seq("pb"))
          .select(col("pa"), col("pb"), col("cn"), col("deg_a"), col("deg_b"),
            expr("(cn * 10000) div (deg_a + deg_b - cn)").as("jacc_bp"))
      },
      Some(s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |      FROM li a JOIN li b
             |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |sym AS (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
             |deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY 1),
             |cn AS (SELECT s1.v AS a, s2.v AS b, COUNT(*) AS cn
             |       FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
             |       JOIN deg dz ON dz.u = s1.u AND dz.deg <= ${GraphEdges.HubCap}
             |       GROUP BY 1, 2)
             |SELECT e.pa, e.pb, COALESCE(cn.cn, 0) AS cn,
             |  da.deg AS deg_a, db.deg AS deg_b,
             |  (COALESCE(cn.cn, 0) * 10000) // (da.deg + db.deg - COALESCE(cn.cn, 0)) AS jacc_bp
             |FROM e
             |LEFT JOIN cn ON cn.a = e.pa AND cn.b = e.pb
             |JOIN deg da ON da.u = e.pa
             |JOIN deg db ON db.u = e.pb""".stripMargin)
    ),

    // Bounded-hop BFS: minimum hop distance from a seed set (every ~97th
    // part) over the co-purchase graph, k=3 — the blast-radius /
    // recommendation-neighborhood query. Frontier-style iteration: each
    // hop is ONE equi-join frontier⋈edges, a distinct, and an anti-join
    // against the visited set, so per-level work is bounded by |V| and
    // never re-expands settled nodes — the property that keeps level-sync
    // BFS alive on a billion-edge graph (the naive "union all paths" plan
    // multiplies by avg-degree per hop). Oracle: recursive CTE with
    // set-semantics UNION, which bounds the DuckDB side the same way.
    "graph_bfs_khop" -> Query(
      (s, d) => {
        val edges = graft.Caches.scoped(GraphEdges.sym(s, d))
        var visited = graft.Caches.scoped(
          edges.select(col("u").as("node")).distinct()
            .filter(col("node") % 97 === 0)
            .withColumn("dist", lit(0L)))
        var frontier = visited
        (1 to 3).foreach { i =>
          frontier = graft.Caches.scoped(
            frontier.join(edges, col("node") === col("u"))
              .select(col("v").as("node")).distinct()
              .join(visited, Seq("node"), "left_anti")
              .withColumn("dist", lit(i.toLong)))
          visited = graft.Caches.scoped(visited.unionAll(frontier))
        }
        visited
      },
      Some("""WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |pairs AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |          FROM li a JOIN li b
             |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |e AS MATERIALIZED (SELECT pa AS u, pb AS v FROM pairs
             |      UNION ALL SELECT pb, pa FROM pairs),
             |r AS (SELECT DISTINCT u AS node, 0 AS d FROM e WHERE u % 97 = 0
             |      UNION
             |      SELECT e.v, r.d + 1 FROM r JOIN e ON e.u = r.node WHERE r.d < 3)
             |SELECT node, CAST(MIN(d) AS BIGINT) AS dist FROM r GROUP BY node""".stripMargin)
    ),

    // Label propagation (2 synchronous LPA rounds) over the co-purchase
    // graph — community detection one rung cheaper than modularity
    // methods: every node starts as its own community and repeatedly
    // adopts the MODE of its neighbors' labels (ties -> smallest
    // label, so each round is deterministic). Per round the plan is
    // one edges⋈labels equi-join + two partial aggs — the same Pregel
    // message-passing shape as pagerank, O(|E|) messages, never
    // all-pairs; rounds are a config constant. The deterministic
    // min-of-(count desc, label) vote is a struct min, so the
    // per-node choice combines map-side.
    "graph_label_prop" -> Query(
      (s, d) => {
        val edges = graft.Caches.scoped(GraphEdges.sym(s, d))
        var labels = edges.select(col("u").as("node")).distinct()
          .select(col("node"), col("node").as("lbl"))
        (1 to 2).foreach { _ =>
          labels = edges
            .join(labels.select(col("node").as("v"), col("lbl")), Seq("v"))
            .groupBy(col("u"), col("lbl")).agg(count(lit(1)).as("cnt"))
            .groupBy(col("u"))
            .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l"))).as("best"))
            .select(col("u").as("node"), col("best.l").as("lbl"))
        }
        labels
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |          FROM li a JOIN li b
             |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |edges AS (SELECT pa AS u, pb AS v FROM pairs
             |          UNION ALL SELECT pb, pa FROM pairs),
             |l0 AS (SELECT DISTINCT u AS node FROM edges),
             |l1 AS (SELECT u AS node, lbl FROM (
             |    SELECT e.u, l.node AS lbl, COUNT(*) AS cnt,
             |      ROW_NUMBER() OVER (PARTITION BY e.u ORDER BY COUNT(*) DESC, l.node) AS rn
             |    FROM edges e JOIN l0 l ON e.v = l.node
             |    GROUP BY e.u, l.node) WHERE rn = 1),
             |l2 AS (SELECT u AS node, lbl FROM (
             |    SELECT e.u, l.lbl, COUNT(*) AS cnt,
             |      ROW_NUMBER() OVER (PARTITION BY e.u ORDER BY COUNT(*) DESC, l.lbl) AS rn
             |    FROM edges e JOIN l1 l ON e.v = l.node
             |    GROUP BY e.u, l.lbl) WHERE rn = 1)
             |SELECT node, lbl FROM l2""".stripMargin)
    ),

    // k-CORE decomposition (k=2, three synchronous peel rounds): drop
    // nodes with degree < k, recompute degrees on the surviving
    // subgraph, repeat — the standard dense-substructure filter that
    // strips the long tail of barely-connected nodes before community
    // or embedding work. Each round is two semi-joins (edge survives
    // iff BOTH endpoints survive) + one map-side-combinable degree
    // agg — O(|E|) per round, never all-pairs; round count is a
    // config constant (a fixpoint loop at 100 TB runs the same plan
    // per round under AQE).
    "graph_kcore" -> Query(
      (s, d) => {
        val edges = graft.Caches.scoped(GraphEdges.sym(s, d))
        // each round's survivor set feeds TWO semi-joins in the next
        // round — cache it, or round N recomputes rounds 1..N-1 twice
        // over (2^rounds blowup; measured 4.3s -> 2.5s at sf0.1)
        var surv = graft.Caches.scoped(edges.groupBy(col("u"))
          .agg(count(lit(1)).as("dg")).filter(col("dg") >= 2))
        (1 to 2).foreach { _ =>
          surv = graft.Caches.scoped(edges
            .join(surv.select(col("u")), Seq("u"), "left_semi")
            .join(surv.select(col("u").as("v")), Seq("v"), "left_semi")
            .groupBy(col("u"))
            .agg(count(lit(1)).as("dg")).filter(col("dg") >= 2))
        }
        surv.select(col("u").as("node"), col("dg").as("core_deg"))
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |          FROM li a JOIN li b
             |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |edges AS (SELECT pa AS u, pb AS v FROM pairs
             |          UNION ALL SELECT pb, pa FROM pairs),
             |a1 AS (SELECT u, COUNT(*) AS dg FROM edges GROUP BY 1 HAVING COUNT(*) >= 2),
             |a2 AS (SELECT e.u, COUNT(*) AS dg FROM edges e
             |       WHERE e.u IN (SELECT u FROM a1) AND e.v IN (SELECT u FROM a1)
             |       GROUP BY 1 HAVING COUNT(*) >= 2),
             |a3 AS (SELECT e.u, COUNT(*) AS dg FROM edges e
             |       WHERE e.u IN (SELECT u FROM a2) AND e.v IN (SELECT u FROM a2)
             |       GROUP BY 1 HAVING COUNT(*) >= 2)
             |SELECT u AS node, dg AS core_deg FROM a3""".stripMargin)
    ),

    // MODULARITY audit of the LPA communities (Newman 2004): per
    // community, internal-edge count L_c, degree mass d_c, and the
    // community's modularity numerator 4·m·L_c − d_c² — the INTEGER
    // scaling of Q_c = L_c/m − (d_c/2m)², so the partition-quality
    // score that decides whether the communities are real structure or
    // noise hash-checks exactly (Q = Σ q_num / 4m²; values here stay
    // far inside BIGINT — widen to DECIMAL(38) beyond ~10^9 edges).
    // Work on top of the 2-round LPA labels: two label joins on the
    // canonical pair list + two map-side-combinable aggs.
    "graph_modularity" -> Query(
      (s, d) => {
        val pairs = graft.Caches.scoped(
          GraphEdges.pairs(s, d).select(col("pa"), col("pb")))
        val edges = graft.Caches.scoped(
          pairs.select(col("pa").as("u"), col("pb").as("v"))
            .unionAll(pairs.select(col("pb").as("u"), col("pa").as("v"))))
        var labels = edges.select(col("u").as("node")).distinct()
          .select(col("node"), col("node").as("lbl"))
        (1 to 2).foreach { _ =>
          labels = edges
            .join(labels.select(col("node").as("v"), col("lbl")), Seq("v"))
            .groupBy(col("u"), col("lbl")).agg(count(lit(1)).as("cnt"))
            .groupBy(col("u"))
            .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l"))).as("best"))
            .select(col("u").as("node"), col("best.l").as("lbl"))
        }
        val lab = graft.Caches.scoped(labels)
        val m = pairs.agg(count(lit(1)).as("m"))
        val internal = pairs
          .join(lab.select(col("node").as("pa"), col("lbl").as("la")), Seq("pa"))
          .join(lab.select(col("node").as("pb"), col("lbl").as("lb")), Seq("pb"))
          .filter(col("la") === col("lb"))
          .groupBy(col("la").as("community")).agg(count(lit(1)).as("l_c"))
        val degMass = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
          .join(lab.select(col("node").as("u"), col("lbl")), Seq("u"))
          .groupBy(col("lbl").as("community"))
          .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("d_c"))
        GraphEdges.withScalars(
            degMass.join(internal, Seq("community"), "left"), m)
          .select(col("community"), col("n_nodes"),
            coalesce(col("l_c"), lit(0L)).as("l_c"), col("d_c"),
            (lit(4L) * col("m") * coalesce(col("l_c"), lit(0L))
              - col("d_c") * col("d_c")).as("q_num"))
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |          FROM li a JOIN li b
             |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |edges AS (SELECT pa AS u, pb AS v FROM pairs
             |          UNION ALL SELECT pb, pa FROM pairs),
             |l0 AS (SELECT DISTINCT u AS node FROM edges),
             |l1 AS (SELECT u AS node, lbl FROM (
             |    SELECT e.u, l.node AS lbl, COUNT(*) AS cnt,
             |      ROW_NUMBER() OVER (PARTITION BY e.u ORDER BY COUNT(*) DESC, l.node) AS rn
             |    FROM edges e JOIN l0 l ON e.v = l.node
             |    GROUP BY e.u, l.node) WHERE rn = 1),
             |l2 AS (SELECT u AS node, lbl FROM (
             |    SELECT e.u, l.lbl, COUNT(*) AS cnt,
             |      ROW_NUMBER() OVER (PARTITION BY e.u ORDER BY COUNT(*) DESC, l.lbl) AS rn
             |    FROM edges e JOIN l1 l ON e.v = l.node
             |    GROUP BY e.u, l.lbl) WHERE rn = 1),
             |mm AS (SELECT COUNT(*) AS m FROM pairs),
             |intl AS (SELECT la.lbl AS community, COUNT(*) AS l_c
             |         FROM pairs p
             |         JOIN l2 la ON la.node = p.pa
             |         JOIN l2 lb ON lb.node = p.pb
             |         WHERE la.lbl = lb.lbl GROUP BY 1),
             |dm AS (SELECT l2.lbl AS community, COUNT(*) AS n_nodes,
             |         CAST(SUM(dg.deg) AS BIGINT) AS d_c
             |       FROM (SELECT u, COUNT(*) AS deg FROM edges GROUP BY 1) dg
             |       JOIN l2 ON l2.node = dg.u GROUP BY 1)
             |SELECT dm.community, dm.n_nodes,
             |  CAST(COALESCE(intl.l_c, 0) AS BIGINT) AS l_c, dm.d_c,
             |  CAST(4 * mm.m * COALESCE(intl.l_c, 0) - dm.d_c * dm.d_c AS BIGINT) AS q_num
             |FROM dm LEFT JOIN intl USING (community) CROSS JOIN mm""".stripMargin)
    ),

    // PERSONALIZED PageRank from a seed set (the recommendation/
    // similar-items primitive: random walks that RESTART at the seeds,
    // so mass concentrates near them instead of spreading globally).
    // Same scaled-integer discipline as graph_pagerank (quantum 1e-12,
    // integer div floors identically cross-engine); the restart mass
    // goes only to seed nodes (parts with id % 100 == 0), iterations
    // are the same edges-join-ranks + destination partial agg. Two
    // iterations, O(E) messages each — the plan a 100 TB walk runs.
    // The seed count folds into the DAG as a broadcast scalar.
    "graph_ppr" -> Query(
      (s, d) => {
        val edges = graft.Caches.scoped(GraphEdges.sym(s, d))
        val deg = graft.Caches.scoped(
          edges.groupBy(col("u")).agg(count(lit(1)).as("deg")))
        val k = deg.filter(col("u") % 100 === 0)
          .agg(count(lit(1)).as("ns"))
          .select(expr(s"${Q}L div greatest(ns, 1L)").as("ss"))
          .select(col("ss"), expr("(15L * ss) div 100L").as("rst"))
        var ranks = GraphEdges.withScalars(deg, k)
          .select(col("u").as("node"), col("deg"),
            when(col("u") % 100 === 0, col("ss")).otherwise(lit(0L)).as("r"))
        (1 to 2).foreach { _ =>
          val contrib = ranks.select(col("node").as("u"), expr("r div deg").as("c"))
          val inSum = edges.join(contrib, Seq("u"))
            .groupBy(col("v")).agg(sum(col("c")).as("sum_c"))
          ranks = GraphEdges.withScalars(
              deg.select(col("u").as("node"), col("deg"))
                .join(inSum, col("node") === col("v"), "left_outer"), k)
            .select(col("node"), col("deg"),
              (when(col("node") % 100 === 0, col("rst")).otherwise(lit(0L)) +
                expr("coalesce(sum_c, 0L) * 85 div 100")).as("r"))
        }
        ranks.select(col("node").as("part"), col("deg"), col("r").as("ppr_q"))
      },
      Some(s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |          FROM li a JOIN li b
             |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |edges AS (SELECT pa AS u, pb AS v FROM pairs
             |          UNION ALL SELECT pb, pa FROM pairs),
             |deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY 1),
             |k AS (SELECT 1000000000000 // GREATEST(COUNT(*), 1) AS ss,
             |        (15 * (1000000000000 // GREATEST(COUNT(*), 1))) // 100 AS rst
             |      FROM deg WHERE u % 100 = 0),
             |r0 AS (SELECT d.u AS node, d.deg,
             |         CASE WHEN d.u % 100 = 0 THEN k.ss ELSE 0 END AS r
             |       FROM deg d CROSS JOIN k),
             |r1 AS (SELECT d.u AS node, d.deg,
             |         CASE WHEN d.u % 100 = 0 THEN k.rst ELSE 0 END
             |           + COALESCE(CAST(s.sum_c AS BIGINT), 0) * 85 // 100 AS r
             |       FROM deg d CROSS JOIN k
             |       LEFT JOIN (SELECT e.v, SUM(r0.r // d2.deg) AS sum_c
             |                  FROM edges e
             |                  JOIN deg d2 ON e.u = d2.u
             |                  JOIN r0 ON r0.node = e.u
             |                  GROUP BY e.v) s ON d.u = s.v),
             |r2 AS (SELECT d.u AS node, d.deg,
             |         CASE WHEN d.u % 100 = 0 THEN k.rst ELSE 0 END
             |           + COALESCE(CAST(s.sum_c AS BIGINT), 0) * 85 // 100 AS r
             |       FROM deg d CROSS JOIN k
             |       LEFT JOIN (SELECT e.v, SUM(r1.r // d2.deg) AS sum_c
             |                  FROM edges e
             |                  JOIN deg d2 ON e.u = d2.u
             |                  JOIN r1 ON r1.node = e.u
             |                  GROUP BY e.v) s ON d.u = s.v)
             |SELECT node AS part, deg, r AS ppr_q FROM r2""".stripMargin)
    ),

    // LOCAL CLUSTERING COEFFICIENT distribution — how "community-like"
    // each node's neighborhood is (cc = 2*tri/(deg*(deg-1))): the
    // structural audit that separates hub-and-spoke catalogs from
    // clustered ones before community detection is attempted. Per-node
    // triangle counts come from the SHARED materialized triangle frame
    // ([[GraphEdges.triangles]] — the same (degree, id)-oriented wedge
    // join + semi-join close graph_triangles emits, paid ONCE per dir;
    // r14 VERDICT Next #2: this query re-ran the full wedge
    // enumeration, 0.33→1.03 s at sf0.1): each triangle explodes to
    // its three corners — identical counts to the id orientation, so
    // the oracle is unchanged. The coefficient ships in integer basis
    // points and rolls into a <=11-bucket histogram. Nodes of degree
    // < 2 have no defined cc and are excluded identically by both
    // engines.
    "graph_clustering_coeff" -> Query(
      (s, d) => {
        val tri = GraphEdges.triangles(s, d)
          .select(explode(array(col("a"), col("b"), col("c"))).as("u"))
          .groupBy(col("u")).agg(count(lit(1)).as("tri"))
        val deg = GraphEdges.deg(s, d).filter(col("deg") >= 2)
        deg.join(tri, Seq("u"), "left")
          .select(col("deg"), coalesce(col("tri"), lit(0L)).as("tri"))
          .select(expr("tri * 20000 div (deg * (deg - 1))").as("cc_bp"))
          .groupBy(expr("cc_bp div 1000").as("bucket"))
          .agg(count(lit(1)).as("n_nodes"),
            min(col("cc_bp")).as("min_bp"), max(col("cc_bp")).as("max_bp"))
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |      FROM li a JOIN li b
             |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |t3 AS (SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
             |       FROM e e1 JOIN e e2 ON e2.pa = e1.pb
             |       WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.pa = e1.pa AND e3.pb = e2.pb)),
             |tri AS (SELECT u, COUNT(*) AS tri FROM (
             |          SELECT a AS u FROM t3 UNION ALL SELECT b FROM t3 UNION ALL SELECT c FROM t3)
             |        GROUP BY 1),
             |deg AS (SELECT u, COUNT(*) AS deg FROM (
             |          SELECT pa AS u FROM e UNION ALL SELECT pb FROM e)
             |        GROUP BY 1 HAVING COUNT(*) >= 2),
             |cc AS (SELECT CAST(COALESCE(tri.tri, 0) * 20000 // (deg.deg * (deg.deg - 1)) AS BIGINT) AS cc_bp
             |       FROM deg LEFT JOIN tri USING (u))
             |SELECT CAST(cc_bp // 1000 AS BIGINT) AS bucket, COUNT(*) AS n_nodes,
             |  MIN(cc_bp) AS min_bp, MAX(cc_bp) AS max_bp
             |FROM cc GROUP BY 1""".stripMargin)
    ),

    // DEGREE ASSORTATIVITY of the co-purchase graph — do hubs connect
    // to hubs (r > 0, social-network-like) or to leaves (r < 0,
    // hub-and-spoke catalogs)? Newman's r is the Pearson correlation
    // of endpoint degrees over the symmetric edge list: every sum
    // (n, sx, sy, sxx, syy, sxy) is an exact integer, only the final
    // correlation is floating, rounded 6dp — the events_autocorr
    // discipline. Two broadcast degree attaches + one scalar agg.
    "graph_assortativity" -> Query(
      (s, d) => {
        val sym = graft.Caches.scoped(GraphEdges.sym(s, d))
        val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        sym
          .join(deg.select(col("u"), col("deg").as("x")), Seq("u"))
          .join(deg.select(col("u").as("v"), col("deg").as("y")), Seq("v"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
            sum(col("x") * col("y")).as("sxy"))
          .select(col("n").as("n_directed_edges"),
            round((col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy"))
              / (sqrt(col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx"))
                * sqrt(col("n").cast("double") * col("syy") - col("sy").cast("double") * col("sy"))),
              6).as("assortativity"))
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |          FROM li a JOIN li b
             |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |sym AS (SELECT pa AS u, pb AS v FROM pairs
             |        UNION ALL SELECT pb, pa FROM pairs),
             |deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY 1),
             |j AS (SELECT dx.deg AS x, dy.deg AS y
             |      FROM sym JOIN deg dx ON sym.u = dx.u JOIN deg dy ON sym.v = dy.u),
             |m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             |        SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy FROM j)
             |SELECT CAST(n AS BIGINT) AS n_directed_edges,
             |  ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |    / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             |     * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS assortativity
             |FROM m""".stripMargin)
    ),

    // DEGREE DISTRIBUTION of the co-purchase graph in log2 buckets —
    // the first diagnostic run on any production graph: a heavy
    // power-law tail predicts which downstream ops (wedge joins,
    // label propagation) need hub-capping or salting. floor(log2 deg)
    // is computed as length(bin(deg)) - 1 — pure string/integer ops,
    // where float log2 differs in the last ulp at exact powers of two
    // between engines. One edge agg + one <=64-bucket rollup.
    "graph_degree_stats" -> Query(
      (s, d) => {
        val pairs = GraphEdges.pairs(s, d)
        val edges = pairs.select(col("pa").as("u"))
          .unionAll(pairs.select(col("pb").as("u")))
        edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
          .select((length(bin(col("deg"))) - 1).cast("long").as("bucket"),
            col("deg"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_nodes"),
            min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |          FROM li a JOIN li b
             |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |edges AS (SELECT pa AS u FROM pairs UNION ALL SELECT pb FROM pairs),
             |deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY 1)
             |SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
             |  COUNT(*) AS n_nodes, MIN(deg) AS min_deg, MAX(deg) AS max_deg
             |FROM deg GROUP BY 1""".stripMargin)
    ),

    // HITS hubs-and-authorities (Kleinberg) over the BIPARTITE
    // supplier->part purchase graph — the mutual-recursion ranking
    // PageRank can't express: a part is authoritative when bought by
    // strong hubs, a supplier is a strong hub when it stocks
    // authoritative parts. Two pinned power iterations in the ppr
    // scaled-integer discipline (quantum 1e-12); each mass sum is
    // renormalized to ~Q by DIV-FIRST integer division (x div
    // greatest(S div Q, 1)) so magnitudes stay bounded at any corpus
    // size — no BIGINT overflow at 100x, no float drift. Per
    // iteration: one equi-join edges><scores + one partial agg, with
    // the three mass totals AND the hub seed crossing as broadcast
    // 1-row scalar joins — O(E) messages and ONE job, the same scale
    // shape as graph_pagerank.
    "graph_hits" -> Query(
      (s, d) => {
        // NOT persisted: the distinct ends in an Exchange, and all five
        // consumers (k, a1, h1, a2, pdeg) carry the IDENTICAL subtree,
        // so ReuseExchange materializes the shuffle once and every
        // consumer re-reads it — cheaper than a cold cache that
        // parallel stages race to populate
        val e = Tables.lineitem(s, d)
          .select(col("l_suppkey").as("sup"), col("l_partkey").as("part"))
          .distinct()
        val k = e.agg(count_distinct(col("sup")).as("ns"))
          .select(expr(s"${Q}L div greatest(ns, 1L)").as("hub0"))
        val a1 = GraphEdges.withScalars(
            e.groupBy(col("part")).agg(count(lit(1)).as("cnt")), k)
          .select(col("part"), (col("cnt") * col("hub0")).as("a"))
        val s1 = a1.agg(sum(col("a")).as("sa"))
        val an1 = GraphEdges.withScalars(a1, s1)
          .select(col("part"), expr(s"a div greatest(sa div ${Q}L, 1L)").as("a"))
        val h1 = e.join(an1, Seq("part"))
          .groupBy(col("sup")).agg(sum(col("a")).as("h"))
        val s2 = h1.agg(sum(col("h")).as("sh"))
        val hn1 = GraphEdges.withScalars(h1, s2)
          .select(col("sup"), expr(s"h div greatest(sh div ${Q}L, 1L)").as("h"))
        val a2 = e.join(hn1, Seq("sup"))
          .groupBy(col("part")).agg(sum(col("h")).as("a"))
        val s3 = a2.agg(sum(col("a")).as("sa"))
        GraphEdges.withScalars(a2, s3)
          .join(e.groupBy(col("part")).agg(count(lit(1)).as("pdeg")), Seq("part"))
          .select(col("part"), col("pdeg"),
            expr(s"a div greatest(sa div ${Q}L, 1L)").as("auth_q"))
      },
      Some("""WITH e AS (SELECT DISTINCT l_suppkey AS sup, l_partkey AS part FROM lineitem),
             |k AS (SELECT 1000000000000 // GREATEST(COUNT(DISTINCT sup), 1) AS hub0 FROM e),
             |a1 AS (SELECT part, COUNT(*) * k.hub0 AS a FROM e CROSS JOIN k GROUP BY part, k.hub0),
             |s1 AS (SELECT SUM(a) AS sa FROM a1),
             |an1 AS (SELECT part, a // GREATEST(sa // 1000000000000, 1) AS a
             |        FROM a1 CROSS JOIN s1),
             |h1 AS (SELECT e.sup, SUM(an1.a) AS h FROM e JOIN an1 USING (part) GROUP BY 1),
             |s2 AS (SELECT SUM(h) AS sh FROM h1),
             |hn1 AS (SELECT sup, h // GREATEST(sh // 1000000000000, 1) AS h
             |        FROM h1 CROSS JOIN s2),
             |a2 AS (SELECT e.part, SUM(hn1.h) AS a FROM e JOIN hn1 USING (sup) GROUP BY 1),
             |s3 AS (SELECT SUM(a) AS sa FROM a2),
             |pd AS (SELECT part, COUNT(*) AS pdeg FROM e GROUP BY 1)
             |SELECT a2.part, CAST(pd.pdeg AS BIGINT) AS pdeg,
             |  CAST(a2.a // GREATEST(s3.sa // 1000000000000, 1) AS BIGINT) AS auth_q
             |FROM a2 CROSS JOIN s3 JOIN pd ON pd.part = a2.part""".stripMargin)
    ),

    // ADAMIC-ADAR link prediction over the co-purchase graph: candidate
    // (non-edge) pairs from the wedge equi-join, scored Σ 1/ln(deg(z))
    // over common neighbors z — the degree-weighted upgrade of
    // graph_link_predict's Jaccard (rare shared neighbors count more).
    // Each identical per-wedge double term is cast DECIMAL(18,12) so
    // the per-pair sum is exact and order-independent; existing edges
    // are removed by an anti-join. Wedge CENTERS are capped at
    // [[GraphEdges.HubCap]] (mirrored in the oracle SQL, the
    // stop-shingle pattern): a hub center contributes deg² candidate
    // pairs and near-zero AA mass each (1/ln(deg) → 0 is exactly WHY
    // Adamic-Adar down-weights hubs), so the cap removes the quadratic
    // blowup while keeping the high-signal scores — candidate work is
    // Σ_{deg≤64} deg² ≤ 64·2|E|, linear in edges. No-op at gate scale
    // (max degree 6-13). A common neighbor always has deg >= 2, so
    // ln(deg) > 0.
    "graph_adamic_adar" -> Query(
      (s, d) => {
        val edges = graft.Caches.scoped(
          GraphEdges.pairs(s, d).select(col("pa"), col("pb")))
        val sym = edges.select(col("pa").as("u"), col("pb").as("v"))
          .unionAll(edges.select(col("pb").as("u"), col("pa").as("v")))
        val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        val ctr = sym.join(
          deg.filter(col("deg") <= GraphEdges.HubCap)
            .select(col("u"), col("deg").as("degz")), Seq("u"))
        val wed = ctr.select(col("u").as("z"), col("v").as("a"), col("degz"))
          .join(sym.select(col("u").as("z"), col("v").as("b")), Seq("z"))
          .filter(col("a") < col("b"))
        val scored = wed.groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("cn"),
            round(sum((lit(1.0) / log(col("degz").cast("double")))
              .cast("decimal(18,12)")).cast("double"), 6).as("aa"))
        scored.join(edges,
            scored("a") === edges("pa") && scored("b") === edges("pb"),
            "left_anti")
      },
      Some(s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |      FROM li a JOIN li b
             |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |sym AS (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
             |deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY 1),
             |w AS (SELECT s1.v AS a, s2.v AS b, s1.u AS z, dz.deg AS degz
             |      FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
             |      JOIN deg dz ON dz.u = s1.u AND dz.deg <= ${GraphEdges.HubCap}),
             |sc AS (SELECT w.a, w.b, COUNT(*) AS cn,
             |        ROUND(CAST(SUM(CAST(1.0 / ln(CAST(w.degz AS DOUBLE))
             |          AS DECIMAL(18,12))) AS DOUBLE), 6) AS aa
             |       FROM w GROUP BY 1, 2)
             |SELECT a, b, cn, aa FROM sc
             |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = sc.a AND e.pb = sc.b)""".stripMargin)
    )
  )
}
