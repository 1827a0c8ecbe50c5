package graft.operators

import org.apache.spark.sql.functions._
import graft.{Query, Tables}

/** The remaining TPC-H query shapes (Q8, Q9, Q11, Q12, Q13, Q16, Q20),
  * adapted to the driver's star schema (no partsupp table, no
  * shipmode/commitdate columns — the nearest columns stand in, keeping
  * each query's PLAN shape intact: that is what the scale argument is
  * about, not the literal TPC-H text).
  *
  * Scale notes: every dim (part, supplier, nation, region, scalar
  * aggregates) broadcasts; the only shuffles are fact-fact joins on
  * their keys and the final small group-bys. All money arithmetic is
  * exact DECIMAL(18,6) sums emitted as doubles (see graft.Parity).
  */
object TpchMore {

  private val revenue =
    (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)")

  private val revSql = "CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))"

  val entries: Seq[(String, Query)] = Seq(

    // TPC-H Q8 shape: national market share — of all PROMO parts sold to
    // ASIA customers, what fraction of revenue per order-year came from
    // NATION_2 suppliers. part/supplier/nation/region all broadcast;
    // lineitem⋈orders is the one fact-fact shuffle; the share is a ratio
    // of two exact decimal sums computed in ONE partial agg (the CASE
    // keeps it single-pass — no second scan, no self-join).
    "q8_market_share" -> Query(
      (s, d) => {
        val asiaCust = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey"))
        val suppNation = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d).select(
            col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
          .select(col("s_suppkey"), col("supp_nation"))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(
            (sum(when(col("supp_nation") === "NATION_2", revenue)
              .otherwise(lit(0).cast("decimal(18,6)"))).cast("double")
              / sum(revenue).cast("double")).as("mkt_share"),
            sum(revenue).cast("double").as("total_vol"))
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |  CAST(SUM(CASE WHEN supp_nation='NATION_2' THEN vol
             |                ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
             |  CAST(SUM(vol) AS DOUBLE) AS total_vol
             |FROM (SELECT o_orderdate, n2.n_name AS supp_nation, $revSql AS vol
             |      FROM lineitem
             |        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
             |        JOIN supplier ON l_suppkey = s_suppkey
             |        JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |        JOIN orders ON l_orderkey = o_orderkey
             |      WHERE o_custkey IN (SELECT c_custkey FROM customer
             |                          JOIN nation ON c_nationkey = n_nationkey
             |                          JOIN region ON n_regionkey = r_regionkey
             |                          WHERE r_name = 'ASIA'))
             |GROUP BY 1""".stripMargin)
    ),

    // TPC-H Q9 shape: product-type profit by supplier nation and year.
    // No partsupp/ps_supplycost in this schema, so cost is modeled as
    // 0.6 * p_retailprice * quantity. Revenue and cost are summed as two
    // SEPARATE exact decimal aggregates and combined in double AFTER the
    // cast — never sum a double-multiplied term directly (fp-order
    // nondeterminism; see graft.Parity).
    "q9_product_profit" -> Query(
      (s, d) => {
        val cost = (col("p_retailprice") * col("l_quantity")).cast("decimal(18,6)")
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).filter(col("p_name").contains("gear"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(
            (sum(revenue).cast("double")
              - lit(0.6) * sum(cost).cast("double")).as("profit"))
      },
      Some(s"""SELECT n_name AS nation,
             |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |  CAST(SUM($revSql) AS DOUBLE)
             |    - 0.6 * CAST(SUM(CAST(p_retailprice*l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             |    AS profit
             |FROM lineitem
             |  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1, 2""".stripMargin)
    ),

    // TPC-H Q11 shape: important parts — per-part revenue share against a
    // global scalar threshold. Two aggregations over ONE shuffled pass
    // (the per-part agg), with the global total derived by re-aggregating
    // the per-part sums (tiny) rather than re-scanning lineitem; the
    // scalar broadcasts into the HAVING filter.
    "q11_important_parts" -> Query(
      (s, d) => {
        val perPart = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(sum(revenue).as("val_dec"))
        val total = perPart.agg(sum(col("val_dec")).cast("double").as("total_val"))
        perPart
          .crossJoin(broadcast(total))
          .filter(col("val_dec").cast("double") > col("total_val") * lit(0.0003))
          .select(col("l_partkey"), col("val_dec").cast("double").as("part_value"))
      },
      Some(s"""WITH pp AS (SELECT l_partkey, SUM($revSql) AS val_dec
             |            FROM lineitem GROUP BY 1),
             |t AS (SELECT CAST(SUM(val_dec) AS DOUBLE) AS total_val FROM pp)
             |SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
             |FROM pp CROSS JOIN t
             |WHERE CAST(val_dec AS DOUBLE) > total_val * 0.0003""".stripMargin)
    ),

    // TPC-H Q12 shape: late-shipment priority audit — conditional counts
    // of urgent vs non-urgent orders per line status (the schema's stand-in
    // for shipmode) for one ship-year. One fact-fact shuffle, then a
    // 2-group conditional agg; both CASE counts come out of a single
    // map-side partial pass.
    "q12_priority_by_status" -> Query(
      (s, d) => {
        val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        Tables.lineitem(s, d)
          .filter(year(col("l_shipdate")) === 1997)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
      },
      Some("""SELECT l_linestatus,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE year(l_shipdate) = 1997
             |GROUP BY 1""".stripMargin)
    ),

    // TPC-H Q13 shape: customer order-count distribution. LEFT join so
    // zero-order customers survive (that's the point of Q13), with the
    // priority exclusion in the JOIN CONDITION (not a post-filter — a
    // post-filter would silently drop the NULL rows). Two-level agg:
    // orders-per-customer, then customers-per-count (histogram of group
    // sizes — the second agg runs over |customers| rows, tiny).
    "q13_order_distribution" -> Query(
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        Tables.customer(s, d)
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, COUNT(*) AS custdist
             |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
             |      FROM customer
             |      LEFT JOIN orders ON c_custkey = o_custkey
             |        AND o_orderpriority <> '4-NOT SPECIFIED'
             |      GROUP BY 1)
             |GROUP BY 1""".stripMargin)
    ),

    // TPC-H Q16 shape: supplier variety per part attribute bucket,
    // EXCLUDING blocklisted suppliers (negative balance — the schema's
    // stand-in for the complaints predicate). The blocklist is a broadcast
    // anti-join BEFORE the distinct agg so excluded rows never enter the
    // shuffle; count(distinct) shuffles once on the 3-part group key.
    "q16_supplier_variety" -> Query(
      (s, d) => {
        val bad = Tables.supplier(s, d)
          .filter(col("s_acctbal") < 0.0).select(col("s_suppkey").as("bad_sk"))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).filter(col("p_brand") =!= "Brand#13")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(bad), col("l_suppkey") === col("bad_sk"), "left_anti")
          .filter(col("p_size").isin(1, 9, 19, 29, 39, 49))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some("""SELECT p_brand, p_type, p_size,
             |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#13'
             |  AND p_size IN (1, 9, 19, 29, 39, 49)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
             |                        WHERE s_acctbal < 0.0)
             |GROUP BY 1, 2, 3""".stripMargin)
    ),

    // TPC-H Q20 shape: potential part promotion — suppliers who moved
    // more than a threshold quantity of 'red' parts in 2000, listed with
    // their nation. The heavy work is one filtered scan + per-supplier
    // agg; the qualifying-supplier set then SEMI-joins the supplier dim
    // (supplier/nation broadcast). Exact integer-valued quantities, so
    // the HAVING threshold is engine-stable.
    "q20_potential_promo" -> Query(
      (s, d) => {
        val shipped = Tables.lineitem(s, d)
          .filter(year(col("l_shipdate")) === 2000)
          .join(broadcast(Tables.part(s, d).filter(col("p_name").startsWith("red"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("l_quantity").cast("decimal(18,6)")).as("qty_dec"))
          .filter(col("qty_dec").cast("double") > 50.0)
        Tables.supplier(s, d)
          .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"))
      },
      Some("""SELECT s_suppkey, s_name, n_name AS nation
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE s_suppkey IN (
             |  SELECT l_suppkey FROM lineitem
             |  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
             |  WHERE year(l_shipdate) = 2000
             |  GROUP BY l_suppkey
             |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 50.0)""".stripMargin)
    ),

    // SUPPLIER SCORECARD — the per-supplier KPI rollup a procurement
    // dashboard refreshes nightly: shipment count, exact-DECIMAL
    // revenue, return rate in integer bp, revenue share in integer bp
    // (per-supplier revenue vs the broadcast corpus total, compared in
    // exact DECIMAL cross-multiplication — no float division decides a
    // rank), and the revenue rank. One fact agg + one broadcast total
    // + one rank window over the supplier-count-sized rollup.
    "supplier_scorecard" -> Query(
      (s, d) => {
        val per = Tables.lineitem(s, d)
          .groupBy(col("l_suppkey").as("suppkey"))
          .agg(count(lit(1)).as("n_items"),
            sum(revenue).as("rev_d"),
            sum((col("l_returnflag") === "R").cast("long")).as("n_returned"))
        val tot = per.agg(sum(col("rev_d")).as("tot_d"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("rev_d").desc, col("suppkey"))
        per.crossJoin(broadcast(tot))
          // share via exact integer micro-units — decimal division
          // rounding rules differ between engines, integer div doesn't
          .withColumn("rev_u", (col("rev_d") * 1000000).cast("long"))
          .withColumn("tot_u", (col("tot_d") * 1000000).cast("long"))
          .select(col("suppkey"), col("n_items"),
            col("rev_d").cast("double").as("revenue"),
            expr("n_returned * 10000 div n_items").as("return_bp"),
            expr("rev_u * 10000 div tot_u").as("share_bp"),
            col("rev_d"))
          .withColumn("rev_rank", rank().over(w).cast("long"))
          .drop("rev_d")
      },
      Some(s"""WITH per AS (SELECT l_suppkey AS suppkey, COUNT(*) AS n_items,
             |    SUM($revSql) AS rev_d,
             |    CAST(SUM(CAST(l_returnflag = 'R' AS BIGINT)) AS BIGINT) AS n_returned
             |  FROM lineitem GROUP BY 1),
             |tot AS (SELECT SUM(rev_d) AS tot_d FROM per)
             |SELECT suppkey, n_items,
             |  CAST(rev_d AS DOUBLE) AS revenue,
             |  CAST(n_returned * 10000 // n_items AS BIGINT) AS return_bp,
             |  CAST(CAST(rev_d * 1000000 AS BIGINT) * 10000
             |       // CAST(tot_d * 1000000 AS BIGINT) AS BIGINT) AS share_bp,
             |  CAST(RANK() OVER (ORDER BY rev_d DESC, suppkey) AS BIGINT) AS rev_rank
             |FROM per CROSS JOIN tot""".stripMargin)
    ),

    // HERFINDAHL-HIRSCHMAN INDEX per nation — the supply-concentration
    // gate a sourcing/risk review runs before trusting a region: HHI =
    // sum of squared supplier revenue shares (10000 bp scale, so HHI in
    // [0, 1e8]; >0.25e8 = "highly concentrated"). Shares use DIV-FIRST
    // integer micro-units (rev_u div (tot_u div 10000)) so the product
    // never exceeds BIGINT even when national revenue reaches 1e18
    // micro-units at 100x — the supplier_scorecard multiply-first form
    // would overflow there. One fact agg, both dims broadcast, and the
    // 25-row nation total re-attached as a broadcast.
    "supplier_hhi" -> Query(
      (s, d) => {
        def per = Tables.lineitem(s, d)
          .groupBy(col("l_suppkey").as("suppkey"))
          .agg(sum(revenue).as("rev_d"))
          .withColumn("rev_u", (col("rev_d") * 1000000).cast("long"))
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))), Seq("suppkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("s_nationkey"), col("n_name"))),
            Seq("s_nationkey"))
        val tot = per.groupBy(col("n_name")).agg(sum(col("rev_u")).as("tot_u"))
        per.join(broadcast(tot), Seq("n_name"))
          .withColumn("share_bp", expr("rev_u div greatest(tot_u div 10000, 1L)"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_suppliers"),
            sum(col("share_bp") * col("share_bp")).as("hhi"),
            max(col("share_bp")).as("top_share_bp"))
      },
      Some(s"""WITH per AS (SELECT l_suppkey AS suppkey,
             |    CAST(SUM($revSql) * 1000000 AS BIGINT) AS rev_u
             |  FROM lineitem GROUP BY 1),
             |j AS (SELECT n.n_name, per.suppkey, per.rev_u
             |      FROM per JOIN supplier s ON s.s_suppkey = per.suppkey
             |      JOIN nation n ON n.n_nationkey = s.s_nationkey),
             |t AS (SELECT n_name, SUM(rev_u) AS tot_u FROM j GROUP BY 1),
             |sh AS (SELECT j.n_name,
             |         rev_u // GREATEST(tot_u // 10000, 1) AS share_bp
             |       FROM j JOIN t USING (n_name))
             |SELECT n_name, COUNT(*) AS n_suppliers,
             |  CAST(SUM(share_bp * share_bp) AS BIGINT) AS hhi,
             |  CAST(MAX(share_bp) AS BIGINT) AS top_share_bp
             |FROM sh GROUP BY 1""".stripMargin)
    )
  )
}
