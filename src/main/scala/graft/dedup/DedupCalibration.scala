package graft.dedup

import graft.Query
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** MinHash LSH banding calibration (SURVEY §2.3): the (bands, rows)
  * trade-off measured on the corpus itself — candidate volume, how
  * many candidates verify at Jaccard >= 0.5, precision, and the
  * theoretical threshold (1/b)^(1/r) — the artifact an index tuner
  * reads before committing a banding scheme to a 100 TB dedup run.
  *
  * Reuses the string-free signature build (DedupQueries.signatures —
  * one row-local hash pass + one map-side-combinable MIN shuffle);
  * candidates come from band-key equi-joins per config, and the exact
  * Jaccard verification joins the hashed-shingle index only for the
  * few hundred candidate pairs (broadcast), never all pairs.
  */
object DedupCalibration {

  /** (bands, rows-per-band) schemes packing into the 16 signatures. */
  private val configs = Seq((8, 2), (5, 3), (4, 4), (2, 8))

  val entries: Seq[(String, Query)] = Seq(

    "dedup_band_calibration" -> Query(
      (s, d) => {
        val sg = graft.Caches.scoped(DedupQueries.signatures(s, d))
        val bandStructs = for {
          (b, r) <- configs
          bi <- 0 until b
        } yield struct(lit(b).as("b"), lit(r).as("r"), lit(bi).as("band_idx"),
          concat_ws("_", (0 until r).map(j => col(s"sig${bi * r + j}")): _*)
            .as("bkey"))
        val bd = sg.select(col("doc_id"),
            explode(array(bandStructs: _*)).as("x"))
          .select(col("doc_id"), col("x.b").as("b"), col("x.r").as("r"),
            col("x.band_idx").as("band_idx"), col("x.bkey").as("bkey"))
        val pairs = graft.Caches.scoped(bd.as("a")
          .join(bd.as("o"),
            col("a.b") === col("o.b") && col("a.r") === col("o.r") &&
              col("a.band_idx") === col("o.band_idx") &&
              col("a.bkey") === col("o.bkey") &&
              col("a.doc_id") < col("o.doc_id"))
          .select(col("a.b").as("b"), col("a.r").as("r"),
            col("a.doc_id").as("da"), col("o.doc_id").as("db"))
          .distinct())
        val p0 = pairs.select(col("da"), col("db")).distinct()
        val sh = graft.Caches.scoped(DedupQueries.shingleHash60Rows(s, d))
        val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val inter = broadcast(p0)
          .join(sh.as("x"), col("da") === col("x.doc_id"))
          .join(sh.as("y"),
            col("db") === col("y.doc_id") && col("x.shh") === col("y.shh"))
          .groupBy(col("da"), col("db")).agg(count(lit(1)).as("i"))
        val jac = p0.join(inter, Seq("da", "db"), "left")
          .join(sz.select(col("doc_id").as("da"), col("sz").as("sa")), Seq("da"))
          .join(sz.select(col("doc_id").as("db"), col("sz").as("sb")), Seq("db"))
          .select(col("da"), col("db"),
            expr("coalesce(i, 0) * 10000 div (sa + sb - coalesce(i, 0))")
              .as("jbp"))
        pairs.join(broadcast(jac), Seq("da", "db"))
          .groupBy(col("b"), col("r"))
          .agg(count(lit(1)).as("n_candidates"),
            sum(when(col("jbp") >= 5000, 1L).otherwise(0L)).as("n_true"))
          .select(col("b").cast("long").as("bands"),
            col("r").cast("long").as("rows_per_band"),
            col("n_candidates"), col("n_true"),
            expr("n_true * 10000 div n_candidates").as("precision_bp"),
            round(pow(lit(1.0) / col("b"), lit(1.0) / col("r")), 4)
              .as("est_threshold"))
      },
      Some {
        val sigList = (0 until 16).map { i =>
          val (a, b) = Hashing.minHashConsts(i)
          s"list_min(list_transform(hs, h -> (h * $a + $b) % ${Hashing.minHashP}))"
        }.mkString(", ")
        s"""WITH t AS (SELECT doc_id,
           |    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS tk
           |  FROM documents),
           |td AS (SELECT doc_id, tk FROM t WHERE len(tk) >= 3),
           |hsx AS (SELECT doc_id,
           |  list_transform(generate_series(1, len(tk) - 2),
           |    i -> CAST('0x' || substr(md5(concat_ws(' ', tk[i], tk[i+1], tk[i+2])), 1, 8) AS BIGINT)) AS hs
           |FROM td),
           |sg AS (SELECT doc_id, [$sigList] AS sig FROM hsx),
           |cfg(b, r) AS (VALUES ${configs.map { case (b, r) => s"($b, $r)" }.mkString(", ")}),
           |bd AS (SELECT doc_id, b, r, bb.bi AS band_idx,
           |    array_to_string(list_transform(generate_series(1, r),
           |      j -> CAST(sig[bi*r + j] AS VARCHAR)), '_') AS bkey
           |  FROM sg CROSS JOIN cfg
           |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bi) bb
           |  WHERE bb.bi < b),
           |pairs AS (SELECT DISTINCT a.b, a.r, a.doc_id AS da, o.doc_id AS db
           |  FROM bd a JOIN bd o ON a.b = o.b AND a.r = o.r
           |    AND a.band_idx = o.band_idx AND a.bkey = o.bkey
           |    AND a.doc_id < o.doc_id),
           |p0 AS (SELECT DISTINCT da, db FROM pairs),
           |shx0 AS (SELECT DISTINCT doc_id,
           |    CAST('0x' || substr(md5(concat_ws(' ', tk[i], tk[i+1], tk[i+2])), 1, 15) AS BIGINT) AS shh
           |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk)-2)) AS i FROM td)),
           |sz AS (SELECT doc_id, COUNT(*) AS sz FROM shx0 GROUP BY 1),
           |inter AS (SELECT p0.da, p0.db, COUNT(*) AS i
           |  FROM p0 JOIN shx0 x ON x.doc_id = p0.da
           |  JOIN shx0 y ON y.doc_id = p0.db AND y.shh = x.shh
           |  GROUP BY 1, 2),
           |jac AS (SELECT p0.da, p0.db,
           |    COALESCE(i, 0) * 10000 // (sa.sz + sb.sz - COALESCE(i, 0)) AS jbp
           |  FROM p0 LEFT JOIN inter USING (da, db)
           |  JOIN sz sa ON sa.doc_id = p0.da
           |  JOIN sz sb ON sb.doc_id = p0.db)
           |SELECT CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows_per_band,
           |  CAST(COUNT(*) AS BIGINT) AS n_candidates,
           |  CAST(SUM(CASE WHEN jbp >= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           |  CAST(SUM(CASE WHEN jbp >= 5000 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
           |    AS BIGINT) AS precision_bp,
           |  ROUND(pow(1.0 / b, 1.0 / r), 4) AS est_threshold
           |FROM pairs JOIN jac ON jac.da = pairs.da AND jac.db = pairs.db
           |GROUP BY b, r""".stripMargin
      }
    ),

    // DEDUP IMPACT REPORT: what exact + near dedup together buy, per
    // source — docs and characters before/after, with the survivor
    // rules the dedup family actually ships (exact: min doc_id per
    // content hash; near: min-label MinHash cluster survivor). The
    // "how much smaller is my corpus" artifact a curation run reports
    // up. One hash window + the already-banded cluster plan; the
    // dropped-id set unions and anti-joins on doc_id only.
    "pipeline_dedup_impact" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val exactDropped = graft.Tables.documents(s, d)
          .select(col("doc_id"), Hashing.md5Long60(col("text")).as("h"))
          .withColumn("keep", min(col("doc_id")).over(Window.partitionBy(col("h"))))
          .filter(col("doc_id") =!= col("keep")).select(col("doc_id"))
        val nearDropped = DedupQueries.entries.toMap
          .apply("dedup_cluster_components").fn(s, d)
          .filter(col("doc_id") =!= col("cluster_id")).select(col("doc_id"))
        val dropped = exactDropped.unionAll(nearDropped).distinct()
          .withColumn("dropped", lit(1L))
        graft.Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .join(dropped, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("dropped").isNotNull, 1L).otherwise(0L)).as("n_dropped"),
            sum(col("n_chars")).as("chars_total"),
            sum(when(col("dropped").isNull, col("n_chars")).otherwise(0L))
              .as("chars_kept"))
          .select(col("source"), col("n_docs"), col("n_dropped"),
            (col("n_docs") - col("n_dropped")).as("n_kept"),
            col("chars_total"), col("chars_kept"),
            expr("(chars_total - chars_kept) * 10000 div chars_total")
              .as("reduction_bp"))
      },
      DedupQueries.entries.toMap.apply("dedup_cluster_components").oracle.map(
        compSql =>
          s"""WITH eh AS (SELECT doc_id,
             |    CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
             |  FROM documents),
             |ed AS (SELECT doc_id FROM (
             |    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY h) AS keep FROM eh)
             |  WHERE doc_id <> keep),
             |nd AS (SELECT doc_id FROM ($compSql) WHERE doc_id <> cluster_id),
             |dropped AS (SELECT DISTINCT doc_id FROM (
             |    SELECT doc_id FROM ed UNION ALL SELECT doc_id FROM nd)),
             |j AS (SELECT d.source, d.n_chars,
             |        CASE WHEN dr.doc_id IS NULL THEN 0 ELSE 1 END AS dropped
             |      FROM documents d LEFT JOIN dropped dr USING (doc_id))
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(dropped) AS BIGINT) AS n_dropped,
             |  CAST(COUNT(*) - SUM(dropped) AS BIGINT) AS n_kept,
             |  CAST(SUM(n_chars) AS BIGINT) AS chars_total,
             |  CAST(SUM(CASE WHEN dropped = 0 THEN n_chars ELSE 0 END) AS BIGINT)
             |    AS chars_kept,
             |  CAST((SUM(n_chars) - SUM(CASE WHEN dropped = 0 THEN n_chars ELSE 0 END))
             |    * 10000 // SUM(n_chars) AS BIGINT) AS reduction_bp
             |FROM j GROUP BY 1""".stripMargin)
    )
  )
}
