package graft.etl

import graft.{Query, Tables}
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Data-governance ETL surface (SURVEY §2.7): deterministic PII
  * tokenization, column-profile drift between period halves, a
  * k-anonymity generalization ladder, and a row-level data-quality
  * quarantine router. All verdict arithmetic is integer (bp shares,
  * cross-multiplied thresholds, exact-cent money).
  */
object GovernanceQueries {

  val entries: Seq[(String, Query)] = Seq(

    // DETERMINISTIC PSEUDONYMIZATION: replace the customer key with a
    // salted 60-bit token (stable across runs and tables, so joins
    // still line up) and keep only coarse attributes — the standard
    // PII-minimization transform before data leaves the trust
    // boundary. The order rollup joins on the RAW key before
    // tokenization (one key-shuffle), proving referential integrity
    // survives the rewrite.
    "etl_pseudonymize" -> Query(
      (s, d) => {
        val oc = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
        Tables.customer(s, d)
          .join(oc, col("c_custkey") === col("o_custkey"), "left")
          .select(
            Hashing.md5Long60(concat(lit("pii_"), col("c_custkey")))
              .as("token"),
            col("c_mktsegment"), col("c_nationkey"),
            expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)").as("bal_cents"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      },
      Some("""WITH oc AS (SELECT o_custkey, COUNT(*) AS n_orders
             |  FROM orders GROUP BY 1)
             |SELECT CAST('0x' || substr(md5('pii_' || CAST(c_custkey AS VARCHAR)), 1, 15)
             |    AS BIGINT) AS token,
             |  c_mktsegment, c_nationkey,
             |  CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
             |  CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders
             |FROM customer LEFT JOIN oc ON o_custkey = c_custkey""".stripMargin)
    ),

    // COLUMN-PROFILE DRIFT: categorical value shares in the first vs
    // second half of the order stream, with the per-value bp delta —
    // the schema-stable drift monitor an ingest pipeline alarms on.
    // Values unpivot row-locally (x2 explode); counts partial-agg on
    // (column, value, half); per-half totals are a 4-row broadcast.
    "etl_profile_drift" -> Query(
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000")
            .as("sec"),
            col("o_orderstatus"), col("o_orderpriority"))
        val mid = o.agg(expr("(min(sec) + max(sec)) div 2").as("mid"))
        val ev = o.crossJoin(broadcast(mid))
          .select(when(col("sec") < col("mid"), 1L).otherwise(2L).as("half"),
            explode(array(
              struct(lit("o_orderstatus").as("col_name"),
                col("o_orderstatus").as("val")),
              struct(lit("o_orderpriority").as("col_name"),
                col("o_orderpriority").as("val")))).as("cv"))
          .select(col("half"), col("cv.col_name").as("col_name"),
            col("cv.val").as("val"))
        val cnt = ev.groupBy(col("col_name"), col("val"), col("half"))
          .agg(count(lit(1)).as("n"))
        val tot = ev.groupBy(col("col_name"), col("half"))
          .agg(count(lit(1)).as("tot"))
        cnt.join(broadcast(tot), Seq("col_name", "half"))
          .groupBy(col("col_name"), col("val"))
          .agg(
            coalesce(max(when(col("half") === 1,
              expr("n * 10000 div tot"))), lit(0L)).as("h1_bp"),
            coalesce(max(when(col("half") === 2,
              expr("n * 10000 div tot"))), lit(0L)).as("h2_bp"))
          .withColumn("delta_bp", abs(col("h1_bp") - col("h2_bp")))
      },
      Some("""WITH o AS (SELECT epoch(o_orderdate) AS sec, o_orderstatus,
             |    o_orderpriority FROM orders),
             |mid AS (SELECT (MIN(sec) + MAX(sec)) // 2 AS mid FROM o),
             |ev AS (SELECT CASE WHEN sec < mid THEN 1 ELSE 2 END AS half,
             |    u.col_name, u.val
             |  FROM o CROSS JOIN mid,
             |  LATERAL (SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val
             |           UNION ALL
             |           SELECT 'o_orderpriority', o_orderpriority) u),
             |cnt AS (SELECT col_name, val, half, COUNT(*) AS n
             |        FROM ev GROUP BY 1, 2, 3),
             |tot AS (SELECT col_name, half, COUNT(*) AS tot
             |        FROM ev GROUP BY 1, 2)
             |SELECT col_name, val,
             |  CAST(COALESCE(MAX(CASE WHEN half = 1 THEN n * 10000 // tot END), 0)
             |    AS BIGINT) AS h1_bp,
             |  CAST(COALESCE(MAX(CASE WHEN half = 2 THEN n * 10000 // tot END), 0)
             |    AS BIGINT) AS h2_bp,
             |  CAST(ABS(COALESCE(MAX(CASE WHEN half = 1 THEN n * 10000 // tot END), 0)
             |    - COALESCE(MAX(CASE WHEN half = 2 THEN n * 10000 // tot END), 0))
             |    AS BIGINT) AS delta_bp
             |FROM cnt JOIN tot USING (col_name, half)
             |GROUP BY 1, 2""".stripMargin)
    ),

    // K-ANONYMITY GENERALIZATION LADDER: one ROLLUP pass evaluates
    // every suppression level of the quasi-identifier chain
    // (segment, nation, balance band) at once; the report shows each
    // level's group count and min group size, which levels satisfy
    // k>=10, and the minimal (least-suppressed) level that does — the
    // decision artifact for an anonymized release. Single aggregation
    // on the rollup key set; level summaries are broadcast-sized.
    "etl_k_generalize" -> Query(
      (s, d) => {
        val g = Tables.customer(s, d)
          .select(col("c_mktsegment"), col("c_nationkey"),
            expr("cast(floor(c_acctbal * 100 + 0.5) as bigint) div 100000")
              .as("balband"))
          .rollup(col("c_mktsegment"), col("c_nationkey"), col("balband"))
          .agg(count(lit(1)).as("k"), grouping_id().as("gid"))
        val lvl = g.groupBy(col("gid"))
          .agg(count(lit(1)).as("n_groups"), min(col("k")).as("min_k"))
          .withColumn("satisfied", (col("min_k") >= 10).cast("long"))
        val best = lvl.agg(min(when(col("satisfied") === 1, col("gid")))
          .as("best_gid"))
        lvl.crossJoin(broadcast(best))
          .select(col("gid"),
            when(col("gid") === 0, "segment,nation,balband")
              .when(col("gid") === 1, "segment,nation")
              .when(col("gid") === 3, "segment")
              .otherwise("suppress_all").as("level"),
            col("n_groups"), col("min_k"), col("satisfied"),
            (col("gid") === col("best_gid")).cast("long").as("chosen"))
      },
      Some("""WITH q AS (SELECT c_mktsegment, c_nationkey,
             |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) // 100000 AS balband
             |  FROM customer),
             |g AS (SELECT GROUPING(c_mktsegment, c_nationkey, balband) AS gid,
             |        COUNT(*) AS k
             |      FROM q GROUP BY ROLLUP(c_mktsegment, c_nationkey, balband)),
             |lvl AS (SELECT gid, COUNT(*) AS n_groups, MIN(k) AS min_k,
             |          CAST(MIN(k) >= 10 AS BIGINT) AS satisfied
             |        FROM g GROUP BY 1),
             |best AS (SELECT MIN(CASE WHEN satisfied = 1 THEN gid END) AS best_gid
             |         FROM lvl)
             |SELECT CAST(gid AS BIGINT) AS gid,
             |  CASE WHEN gid = 0 THEN 'segment,nation,balband'
             |       WHEN gid = 1 THEN 'segment,nation'
             |       WHEN gid = 3 THEN 'segment'
             |       ELSE 'suppress_all' END AS level,
             |  CAST(n_groups AS BIGINT) AS n_groups,
             |  CAST(min_k AS BIGINT) AS min_k, satisfied,
             |  CAST(gid = best_gid AS BIGINT) AS chosen
             |FROM lvl CROSS JOIN best""".stripMargin)
    ),

    // ROW-LEVEL QUARANTINE ROUTER: the per-row twin of etl_dq_rules —
    // each lineitem failing a business rule routes to quarantine with
    // its FIRST failing rule as the reason code (bulk quantity,
    // excessive discount, missing tax). Map-only scan + filter; at
    // 100 TB this is the shape that writes the quarantine partition
    // while the clean rows stream on.
    "etl_quarantine_split" -> Query(
      (s, d) =>
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_discount"), col("l_tax"),
            when(col("l_quantity") > 45, "bulk_quantity")
              .when(col("l_discount") >= 0.09, "excessive_discount")
              .when(col("l_tax") === 0, "zero_tax")
              .otherwise(null).as("reason"))
          .filter(col("reason").isNotNull),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax,
             |  CASE WHEN l_quantity > 45 THEN 'bulk_quantity'
             |       WHEN l_discount >= 0.09 THEN 'excessive_discount'
             |       WHEN l_tax = 0 THEN 'zero_tax' END AS reason
             |FROM lineitem
             |WHERE l_quantity > 45 OR l_discount >= 0.09 OR l_tax = 0""".stripMargin)
    ),

    // HEAD-SOURCE CAP: keep at most 20 docs per source, chosen by a
    // deterministic salted-hash rank — the mixture-balancing
    // downsample that stops one crawl domain from dominating the
    // corpus (the complement of rate-based etl_stratified_sample:
    // exact cap, not a fraction). One rank window partitioned by
    // source; the hash order makes reruns reproducible row for row.
    "etl_downsample_capped" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source"))
          .orderBy(col("h"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            Hashing.md5Long60(concat(lit("cap_"), col("doc_id").cast("string")))
              .as("h"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 20)
          .select(col("doc_id"), col("source"), col("rk"))
      },
      Some("""SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM (
             |  SELECT doc_id, source,
             |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
             |      CAST('0x' || substr(md5('cap_' || CAST(doc_id AS VARCHAR)), 1, 15)
             |        AS BIGINT), doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= 20""".stripMargin)
    )
  )
}
