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

  /** Per-(label, dim) centroid means: exact decimal sums, then one
    * double division — identical bits cross-engine.
    */
  private def centroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label").as("clabel"), posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("clabel"), (col("p") + 1).as("dim"), col("x"))
      .groupBy(col("clabel"), col("dim"))
      .agg((sum(col("x").cast("double").cast("decimal(18,12)")).cast("double")
        / count(lit(1))).as("m"))

  private val centSql =
    """SELECT label AS clabel, i.i AS dim,
      |    CAST(SUM(CAST(CAST(embedding[i.i] AS DOUBLE) AS DECIMAL(18,12))) AS DOUBLE)
      |      / COUNT(*) AS m
      |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) i
      |  GROUP BY 1, 2""".stripMargin

  /** Squared distance from every vector to every label centroid:
    * (vec_id, label, clabel, d2).
    */
  private def centDists(s: SparkSession, d: String): DataFrame = {
    val term = {
      val diff = element_at(col("embedding"), col("dim").cast("int"))
        .cast("double") - col("m")
      (diff * diff).cast("decimal(18,12)")
    }
    Tables.embeddings(s, d)
      .crossJoin(broadcast(centroids(s, d)))
      .groupBy(col("vec_id"), col("label"), col("clabel"))
      .agg(sum(term).cast("double").as("d2"))
  }

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
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("d2"), col("clabel"))
        val assigned = centDists(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("label"), col("clabel").as("assigned"))
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
    )
  )
}
