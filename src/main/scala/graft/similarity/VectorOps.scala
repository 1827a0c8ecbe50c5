package graft.similarity

import graft.{Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space cluster-quality audits (SURVEY §2.4): simplified
  * silhouette, nearest-centroid confusion, and kNN-graph hubness — the
  * monitoring battery a labeled/clustered vector corpus needs before
  * the labels are trusted for curation decisions.
  *
  * Scale shape: label centroids are a |labels| x 64 table (broadcast
  * material); per-vector distances come from ONE cross join against
  * that broadcast with a map-side-combinable partial aggregation, so
  * the only shuffle is n x |labels| rows keyed by vec_id — no
  * vector-vector pair ever materializes.
  */
object VectorOps {

  /** Per-label centroid mean VECTORS: exact decimal sums, then one
    * double division per dim — identical bits cross-engine
    * (functions.VecMeanAgg replicates the per-dim
    * CAST(SUM(decimal(18,12)) AS DOUBLE)/COUNT(*) formulation as ONE
    * array-accumulating aggregate, replacing the 64x posexplode +
    * decimal hash agg + array regroup; the partial buffers are still
    * map-side-combined, so the only shuffle stays |labels| rows).
    */
  private def centroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .groupBy(col("label").as("clabel"))
      .agg(graft.functions.VecMeanAgg.vecMean(col("embedding")).as("ms"))

  private val centSql =
    """SELECT label AS clabel, i.i AS dim,
      |    CAST(SUM(CAST(CAST(embedding[i.i] AS DOUBLE) AS DECIMAL(18,12))) AS DOUBLE)
      |      / COUNT(*) AS m
      |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) i
      |  GROUP BY 1, 2""".stripMargin

  /** Squared distance from every vector to every label centroid:
    * (vec_id, label, clabel, d2).
    *
    * The centroid table regroups to one 64-double array per clabel so
    * the distance is ONE codegen'd loop per (vector, centroid) row
    * (plans/VectorExpressions.SqDistToCentroid — decimal-exact, bit-
    * matching the per-dim aggregate it replaced and the oracle's dist
    * CTE). That collapses the former n x |labels| x 64 posexplode
    * fan-out + decimal SUM (and the repartition that fan-out needed)
    * to n x |labels| rows with no aggregation at this level — measured
    * full-query 2.8 s -> 1.5 s at sf0.1 and 5.8 s -> 4.1 s at the 10x
    * corpus (the residual is the shared posexplode centroid-TRAINING
    * subtree, whose map-side partials are already the scale-correct
    * shape — see centroids above).
    */
  private def centDists(s: SparkSession, d: String): DataFrame =
    // repartition before the |labels|-way fan-out: the per-row work is
    // |labels| decimal-exact 64-dim loops, and off a ~1-split scan the
    // whole stretch would run on one core (the round-11 pair-family
    // rule; event-log measured the single-task stage at 3.0 s of the
    // 4.3 s total at sf1 before this exchange)
    Tables.embeddings(s, d).repartition(col("vec_id"))
      .crossJoin(broadcast(centroids(s, d)))
      .select(col("vec_id"), col("label"), col("clabel"),
        graft.plans.VectorExpressions.sqDistToCentroid(
          col("embedding"), col("ms")).as("d2"))

  private val distSql =
    s"""cent AS ($centSql),
      |dist AS (SELECT e.vec_id, e.label, c.clabel,
      |    CAST(SUM(CAST((CAST(e.embedding[c.dim] AS DOUBLE) - c.m)
      |        * (CAST(e.embedding[c.dim] AS DOUBLE) - c.m)
      |        AS DECIMAL(18,12))) AS DOUBLE) AS d2
      |  FROM embeddings e CROSS JOIN cent c
      |  GROUP BY 1, 2, 3)""".stripMargin

  val entries: Seq[(String, Query)] = Seq(

    // SIMPLIFIED SILHOUETTE per label: s = (b - a) / max(a, b) with
    // a = distance to own-label centroid, b = nearest other centroid —
    // the linear-time stand-in for the O(n^2) silhouette, the standard
    // cluster-cohesion readout. Negative share flags labels whose
    // members sit closer to a rival centroid (label noise).
    "vec_simplified_silhouette" -> Query(
      (s, d) => {
        val per = centDists(s, d).groupBy(col("vec_id"), col("label"))
          .agg(max(when(col("clabel") === col("label"), col("d2"))).as("a2"),
            min(when(col("clabel") =!= col("label"), col("d2"))).as("b2"))
        val sil = per.select(col("label"),
          ((sqrt(col("b2")) - sqrt(col("a2")))
            / greatest(sqrt(col("a2")), sqrt(col("b2")))).as("sil"))
        sil.groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            round(sum(col("sil").cast("decimal(18,12)")).cast("double")
              / count(lit(1)), 4).as("mean_sil"),
            sum(when(col("sil") < 0, 1L).otherwise(0L)).as("n_neg"))
          .select(col("label"), col("n_vecs"), col("mean_sil"),
            expr("n_neg * 10000 div n_vecs").as("neg_bp"))
      },
      Some(s"""WITH $distSql,
             |per AS (SELECT vec_id, label,
             |    MAX(CASE WHEN clabel = label THEN d2 END) AS a2,
             |    MIN(CASE WHEN clabel <> label THEN d2 END) AS b2
             |  FROM dist GROUP BY 1, 2),
             |sil AS (SELECT label,
             |    (sqrt(b2) - sqrt(a2)) / GREATEST(sqrt(a2), sqrt(b2)) AS sil
             |  FROM per)
             |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             |  ROUND(CAST(SUM(CAST(sil AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 4)
             |    AS mean_sil,
             |  CAST(SUM(CASE WHEN sil < 0 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
             |    AS BIGINT) AS neg_bp
             |FROM sil GROUP BY 1""".stripMargin)
    ),

    // NEAREST-CENTROID CONFUSION MATRIX: classify every vector by its
    // closest label centroid and cross-tabulate against the true label
    // — the label-quality audit that localizes WHICH classes bleed
    // into each other (the diagonal is the centroid-classifier
    // accuracy). Assignment picks rank 1 of (d2, clabel) per vector —
    // the clabel tiebreak keeps the row set deterministic.
    "vec_centroid_confusion" -> Query(
      (s, d) => {
        // rank-1 of (d2, clabel) per vector as min_by over the ordering
        // struct — one map-side-combinable hash agg instead of a
        // row_number window's exchange+sort; label is per-vec constant,
        // so adding it to the keys changes nothing but keeps it selected
        val assigned = centDists(s, d)
          .groupBy(col("vec_id"), col("label"))
          .agg(min_by(col("clabel"), struct(col("d2"), col("clabel"))).as("assigned"))
          .select(col("label"), col("assigned"))
        val tot = assigned.groupBy(col("label")).agg(count(lit(1)).as("n_label"))
        assigned.groupBy(col("label"), col("assigned"))
          .agg(count(lit(1)).as("n"))
          .join(tot, Seq("label"))
          .select(col("label"), col("assigned"), col("n"),
            expr("n * 10000 div n_label").as("share_bp"))
      },
      Some(s"""WITH $distSql,
             |a AS (SELECT label, clabel AS assigned
             |      FROM (SELECT label, clabel,
             |              ROW_NUMBER() OVER (PARTITION BY vec_id
             |                ORDER BY d2, clabel) AS rn
             |            FROM dist) WHERE rn = 1),
             |tot AS (SELECT label, COUNT(*) AS n_label FROM a GROUP BY 1)
             |SELECT a.label, assigned, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(COUNT(*) * 10000 // MAX(n_label) AS BIGINT) AS share_bp
             |FROM a JOIN tot ON tot.label = a.label
             |GROUP BY 1, 2""".stripMargin)
    ),

    // kNN-GRAPH HUBNESS: the in-degree histogram of the LSH-built
    // top-3 cosine graph. High-hubness corpora (a few vectors inside
    // everyone's neighbor list) break graph-based semantic dedup and
    // ANN recall — this is the one-glance monitor. Reuses
    // vec_knn_graph's banded candidate plan; the add-on is two
    // vec_id-keyed aggregations.
    "vec_knn_hubness" -> Query(
      (s, d) => {
        val graph = SimilarityQueries.entries.toMap.apply("vec_knn_graph").fn(s, d)
        val deg = Tables.embeddings(s, d).select(col("vec_id"))
          .join(graph.select(col("dst").as("vec_id"), col("src")),
            Seq("vec_id"), "left")
          .groupBy(col("vec_id")).agg(count(col("src")).as("in_degree"))
        deg.groupBy(col("in_degree")).agg(count(lit(1)).as("n_vecs"))
      },
      SimilarityQueries.entries.toMap.apply("vec_knn_graph").oracle.map(gSql =>
        s"""WITH deg AS (SELECT e.vec_id, COUNT(g.src) AS in_degree
           |  FROM embeddings e LEFT JOIN ($gSql) g ON g.dst = e.vec_id
           |  GROUP BY 1)
           |SELECT CAST(in_degree AS BIGINT) AS in_degree,
           |  CAST(COUNT(*) AS BIGINT) AS n_vecs
           |FROM deg GROUP BY 1""".stripMargin)
    ),

    // METRIC-CHOICE AUDIT: for each probe, how much the top-5 result
    // set changes between cosine, raw dot product (MIPS), and
    // euclidean ranking — the one-glance answer to "does my corpus
    // need normalization before ANN indexing". One broadcast of the
    // probe set over one corpus scan computes all three scores; the
    // overlap join touches 3x5 rows per probe. Scores break ties on
    // vec_id, so every ranking is a deterministic row set.
    "ann_metric_compare" -> Query(
      (s, d) => {
        import graft.functions.VectorFunctions
        val probes = Tables.embeddings(s, d).filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val dot = VectorFunctions.dot(col("qv"), col("embedding"))
        val l2 = aggregate(
          zip_with(transform(col("qv"), x => x.cast("double")),
            transform(col("embedding"), x => x.cast("double")),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)
        val scored = graft.Caches.scoped(Tables.embeddings(s, d)
          .join(broadcast(probes), col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id"), dot.as("dot"),
            (dot / (VectorFunctions.norm(col("qv"))
              * VectorFunctions.norm(col("embedding")))).as("cos"),
            l2.as("l2")))
        def top5(score: org.apache.spark.sql.Column, asc: Boolean) = {
          val ord = if (asc) Seq(score.asc, col("vec_id").asc)
                    else Seq(score.desc, col("vec_id").asc)
          scored.withColumn("rn",
              row_number().over(Window.partitionBy(col("qid")).orderBy(ord: _*)))
            .filter(col("rn") <= 5).select(col("qid"), col("vec_id"))
        }
        val tc = top5(col("cos"), asc = false)
        val td = top5(col("dot"), asc = false)
        val tl = top5(col("l2"), asc = true)
        def overlap(a: org.apache.spark.sql.DataFrame,
                    b: org.apache.spark.sql.DataFrame, name: String) =
          a.join(b, Seq("qid", "vec_id"))
            .groupBy(col("qid")).agg(count(lit(1)).as(name))
        probes.select(col("qid"))
          .join(overlap(tc, td, "ov_cos_dot"), Seq("qid"), "left")
          .join(overlap(tc, tl, "ov_cos_l2"), Seq("qid"), "left")
          .join(overlap(td, tl, "ov_dot_l2"), Seq("qid"), "left")
          .select(col("qid"),
            coalesce(col("ov_cos_dot"), lit(0L)).as("ov_cos_dot"),
            coalesce(col("ov_cos_l2"), lit(0L)).as("ov_cos_l2"),
            coalesce(col("ov_dot_l2"), lit(0L)).as("ov_dot_l2"))
      },
      Some("""WITH p AS (SELECT vec_id AS qid, embedding AS qv
             |          FROM embeddings WHERE vec_id < 10),
             |sc AS (SELECT p.qid, e.vec_id,
             |    list_sum(list_transform(generate_series(1, 64),
             |      i -> CAST(p.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS dot,
             |    list_sum(list_transform(generate_series(1, 64),
             |      i -> CAST(p.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) /
             |    (sqrt(list_sum(list_transform(generate_series(1, 64),
             |       i -> CAST(p.qv[i] AS DOUBLE) * CAST(p.qv[i] AS DOUBLE)))) *
             |     sqrt(list_sum(list_transform(generate_series(1, 64),
             |       i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS cos,
             |    list_sum(list_transform(generate_series(1, 64),
             |      i -> (CAST(p.qv[i] AS DOUBLE) - CAST(e.embedding[i] AS DOUBLE))
             |         * (CAST(p.qv[i] AS DOUBLE) - CAST(e.embedding[i] AS DOUBLE)))) AS l2
             |  FROM p JOIN embeddings e ON e.vec_id <> p.qid),
             |tc AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
             |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
             |       FROM sc) WHERE rn <= 5),
             |td AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
             |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id) AS rn
             |       FROM sc) WHERE rn <= 5),
             |tl AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
             |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2 ASC, vec_id) AS rn
             |       FROM sc) WHERE rn <= 5),
             |ocd AS (SELECT qid, COUNT(*) AS ov_cos_dot
             |        FROM tc JOIN td USING (qid, vec_id) GROUP BY 1),
             |ocl AS (SELECT qid, COUNT(*) AS ov_cos_l2
             |        FROM tc JOIN tl USING (qid, vec_id) GROUP BY 1),
             |odl AS (SELECT qid, COUNT(*) AS ov_dot_l2
             |        FROM td JOIN tl USING (qid, vec_id) GROUP BY 1)
             |SELECT p.qid,
             |  CAST(COALESCE(ov_cos_dot, 0) AS BIGINT) AS ov_cos_dot,
             |  CAST(COALESCE(ov_cos_l2, 0) AS BIGINT) AS ov_cos_l2,
             |  CAST(COALESCE(ov_dot_l2, 0) AS BIGINT) AS ov_dot_l2
             |FROM p LEFT JOIN ocd ON ocd.qid = p.qid
             |LEFT JOIN ocl ON ocl.qid = p.qid
             |LEFT JOIN odl ON odl.qid = p.qid""".stripMargin)
    ),

    // INTER-CENTROID DISTANCE MATRIX: euclidean distance between every
    // label-centroid pair — the compact geometry summary read next to
    // the confusion matrix (close centroids predict exactly the
    // classes that bleed). |labels|^2 rows from a dim-keyed self-join
    // of the 640-row centroid table: broadcast-scale everything.
    "vec_centroid_distance_matrix" -> Query(
      (s, d) => {
        // re-explode the |labels| centroid mean vectors to (clabel, dim,
        // m) — the matrix is |labels|^2 x 64 rows of MODEL data, so the
        // explode touches a few hundred rows regardless of corpus size
        val c = centroids(s, d)
          .select(col("clabel"), posexplode(col("ms")).as(Seq("p", "m")))
          .select(col("clabel"), (col("p") + 1).as("dim"), col("m"))
        val a = c.select(col("clabel").as("label_a"), col("dim"),
          col("m").as("ma"))
        val b = c.select(col("clabel").as("label_b"), col("dim"),
          col("m").as("mb"))
        a.join(b, Seq("dim")).filter(col("label_a") < col("label_b"))
          .groupBy(col("label_a"), col("label_b"))
          .agg(sum(((col("ma") - col("mb")) * (col("ma") - col("mb")))
            .cast("decimal(18,12)")).as("d2"))
          .select(col("label_a"), col("label_b"),
            round(sqrt(col("d2").cast("double")), 4).as("dist"))
      },
      Some(s"""WITH cent AS ($centSql)
             |SELECT a.clabel AS label_a, b.clabel AS label_b,
             |  ROUND(sqrt(CAST(SUM(CAST((a.m - b.m) * (a.m - b.m)
             |    AS DECIMAL(18,12))) AS DOUBLE)), 4) AS dist
             |FROM cent a JOIN cent b
             |  ON a.dim = b.dim AND a.clabel < b.clabel
             |GROUP BY 1, 2""".stripMargin)
    )
  )
}
