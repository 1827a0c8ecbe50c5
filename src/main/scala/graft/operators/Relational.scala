package graft.operators

import graft.{Query, Tables}
import graft.Parity._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core (SURVEY §2.2): declarative DataFrame plans only, so
  * Catalyst gets pushdown/pruning/join-reorder and Tungsten codegens the
  * whole pipeline. Scale notes per query inline — dims broadcast, facts
  * shuffle on join keys, aggregates are map-side partial by construction.
  */
object Relational {

  private val revenue =
    (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)")

  val entries: Seq[(String, Query)] = Seq(

    // TPC-H Q1 shape: single scan, map-side partial agg, 6 groups.
    // At 100 TB: no join, shuffle carries only (flag,status) partials.
    "q1_agg" -> Query(
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02 00:00:00")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(revenue).cast("double").as("sum_disc_price"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
              .cast("decimal(18,6)")).cast("double").as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*) AS avg_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*) AS avg_price,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)
    ),

    // TPC-H Q3 shape: selective dim filter -> two fact joins -> agg ->
    // global top-k. customer is broadcast (small after filter); the
    // orders⋈lineitem join shuffles on orderkey; top-k is TakeOrdered
    // (no global sort materialization).
    "q3_top_revenue" -> Query(
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        val l = Tables.lineitem(s, d)
          .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01 00:00:00")))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(revenue).cast("double").as("revenue"))
          .select(col("l_orderkey"), col("revenue"),
            dateStr(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
             |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |              JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
    ),

    // TPC-H Q18 shape (large-volume orders): HAVING-subquery semi-join —
    // the qualifying-keys set comes from a map-side-partial agg over
    // lineitem, re-joined to orders+lineitem; customer broadcasts. The
    // big-side scans stay pruned and the only shuffles are the orderkey
    // agg and the orderkey join.
    "q18_large_orders" -> Query(
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey").as("bok"))
          .agg(dsum(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 200)
        Tables.orders(s, d)
          .join(big, col("o_orderkey") === col("bok"))
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            dateStr(col("o_orderdate")).as("o_orderdate"),
            col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""WITH big AS (
             |  SELECT l_orderkey AS bok,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
             |  FROM lineitem GROUP BY 1
             |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 200)
             |SELECT c_name, c_custkey, o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice, total_qty
             |FROM orders JOIN big ON o_orderkey = bok
             |            JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)
    ),

    // TPC-H Q5 shape: star join. region/nation/supplier/customer are
    // broadcast dims; lineitem⋈orders is the only shuffle join.
    "q5_regional_join" -> Query(
      (s, d) => {
        val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
        val n = Tables.nation(s, d)
        val c = Tables.customer(s, d)
        val sup = Tables.supplier(s, d)
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                  col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        Tables.lineitem(s, d)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c),
            col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(revenue).cast("double").as("revenue"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
             |FROM customer, orders, lineitem, supplier, nation, region
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |  AND r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY n_name""".stripMargin)
    ),

    // Explicit broadcast-hash-join of the fact against a small dim:
    // zero shuffle for the join itself at any fact size.
    "join_broadcast_dim" -> Query(
      (s, d) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price")),
      Some("""SELECT p_brand, COUNT(*) AS n_items,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand""".stripMargin)
    ),

    // EXISTS as left-semi: probe side never materializes right columns.
    "join_semi" -> Query(
      (s, d) => {
        val big = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
          .select(col("l_orderkey"))
        Tables.orders(s, d)
          .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select(col("o_orderkey"), col("o_totalprice"),
            dateStr(col("o_orderdate")).as("o_orderdate"))
      },
      Some("""SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
             |FROM orders WHERE EXISTS (
             |  SELECT 1 FROM lineitem
             |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)""".stripMargin)
    ),

    // NOT EXISTS as left-anti.
    "join_anti" -> Query(
      (s, d) => {
        val big = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
          .select(col("o_custkey"))
        Tables.customer(s, d)
          .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      },
      Some("""SELECT c_custkey, c_name, c_acctbal
             |FROM customer WHERE NOT EXISTS (
             |  SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin)
    ),

    // Full outer join + null coalescing over a pre-aggregated side.
    "join_outer_coalesce" -> Query(
      (s, d) => {
        val oa = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        Tables.customer(s, d)
          .join(oa, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            coalesce(col("c_name"), lit("(unknown)")).as("name"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("spend"), lit(0.0)).as("spend"))
      },
      Some("""WITH oa AS (
             |  SELECT o_custkey, COUNT(*) AS n_orders,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend
             |  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey)
             |SELECT COALESCE(c_custkey, o_custkey) AS custkey,
             |  COALESCE(c_name, '(unknown)') AS name,
             |  COALESCE(n_orders, 0) AS n_orders,
             |  COALESCE(spend, 0.0) AS spend
             |FROM customer FULL OUTER JOIN oa ON c_custkey = o_custkey""".stripMargin)
    ),

    // row_number top-k per group — one shuffle on the partition key,
    // rank pushdown (WindowGroupLimit) keeps per-partition state at k.
    "window_topk_per_group" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn <= 3""".stripMargin)
    ),

    // Running sum over an ordered frame; decimal accumulator so the
    // result is exact regardless of the engine's frame evaluation order.
    "window_running_sum" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,6)")).over(w)
            .cast("double").as("running_spend"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
             |FROM orders""".stripMargin)
    ),

    // lag/lead deltas per user over event time. ts is raw int64 nanos in
    // the parquet; DuckDB's reader truncates to µs, so both sides emit
    // epoch MICROS for parity.
    "window_lag_delta" -> Query(
      (s, d) => {
        // order by the µs value actually compared (not raw ns): the oracle
        // sorts by epoch_us(ts), and two events sharing a µs but differing
        // in ns would otherwise order differently between engines
        val w = Window.partitionBy(col("user_id"))
          .orderBy(expr("ts div 1000"), col("event_id"))
        Tables.events(s, d).select(
          col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"),
          (expr("lead(ts div 1000, 1) over (partition by user_id order by ts div 1000, event_id)")
            - expr("ts div 1000")).as("us_to_next"))
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |  value - LAG(value) OVER w AS delta,
             |  LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS us_to_next
             |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)
    ),

    // Exact distinct counting (expand + two-phase agg under the hood).
    "agg_distinct" -> Query(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
             |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    ),

    // stddev/variance/covar/corr derived from exact decimal power sums:
    // the only float ops run on bit-identical operands in both engines,
    // so results are exact — no tolerance games.
    "agg_stats" -> Query(
      (s, d) => {
        val x = col("l_quantity")
        val y = col("l_extendedprice")
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            dsum(x).as("sx"), dsumWide(x * x).as("sxx"),
            dsum(y).as("sy"), dsumWide(y * y).as("syy"),
            dsumWide(x * y).as("sxy"))
          .select(
            // engines convert wide decimals to double with one-ulp
            // differences, so finals are rounded (4dp; corr 6dp)
            col("l_returnflag"), col("n"),
            round((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1), 4).as("var_qty"),
            round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 4).as("stddev_qty"),
            round(sqrt((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1)), 4).as("stddev_price"),
            round((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1), 4).as("covar_qty_price"),
            round((col("sxy") - col("sx") * col("sy") / col("n")) /
              (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
               sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 6).as("corr_qty_price"))
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag, COUNT(*) AS n,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(26,4))) AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(26,4))) AS DOUBLE) AS syy,
             |    CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(26,4))) AS DOUBLE) AS sxy
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, n,
             |  ROUND((sxx - sx*sx/n)/(n-1), 4) AS var_qty,
             |  ROUND(sqrt((sxx - sx*sx/n)/(n-1)), 4) AS stddev_qty,
             |  ROUND(sqrt((syy - sy*sy/n)/(n-1)), 4) AS stddev_price,
             |  ROUND((sxy - sx*sy/n)/(n-1), 4) AS covar_qty_price,
             |  ROUND((sxy - sx*sy/n)/(sqrt(sxx - sx*sx/n)*sqrt(syy - sy*sy/n)), 6) AS corr_qty_price
             |FROM m""".stripMargin)
    ),

    // Exact interpolated percentiles per group WITHOUT the value buffer
    // — the histogram-bisect two-pass, now factored into
    // GroupedPercentile.exact (see its scaladoc for the machinery;
    // $10k buckets give ~11 buckets/group over TPC-H prices). Engines
    // may differ in the last ulp of the interpolation, so both sides
    // round to 4dp. Prices ride as exact integer cents (2-decimal
    // TPC-H values), reconstructed by one identical double division.
    "agg_percentiles" -> Query(
      (s, d) => {
        val ps = Seq(("p25", 0.25), ("p50", 0.50), ("p75", 0.75), ("p99", 0.99))
        val c = graft.Caches.scoped(Tables.lineitem(s, d).select(col("l_returnflag"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("cents")))
        GroupedPercentile.exact(c, "l_returnflag", "cents", ps,
            expr("cents div 1000000"), _.cast("double") / lit(100.0))
          .withColumn("res", round(col("res"), 4))
          .groupBy(col("l_returnflag"))
          .agg(
            max(when(col("pname") === "p25", col("res"))).as("p25"),
            max(when(col("pname") === "p50", col("res"))).as("p50"),
            max(when(col("pname") === "p75", col("res"))).as("p75"),
            max(when(col("pname") === "p99", col("res"))).as("p99"))
      },
      Some("""SELECT l_returnflag,
             |  ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             |  ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
             |  ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
             |  ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    ),

    // HLL approx distinct — the 100 TB path for agg_distinct. The raw
    // sketch estimates are engine-specific, so they stay OUT of the
    // checked projection; instead the query emits the exact distincts
    // (the oracle's yardstick) plus a within_bound verdict computed
    // IN-PLAN: |approx − exact| ≤ 5% of exact, per group, both keys.
    // The oracle asserts the exact counts hash-exact and
    // within_bound = 1 — a drifting sketch now FAILS the gate instead
    // of hiding behind a rows-only check. rsd=0.02 (the 0.05 default
    // missed by 8.6% on l_orderkey): ~32KB per group, estimate lands
    // within ~2%. (The exact columns are the gate's yardstick;
    // production keeps only the sketch side.)
    "agg_approx_distinct" -> Query(
      (s, d) => {
        // exact twins via distinct-then-count (map-side partial dedup,
        // tiny shuffles) — NOT multi-distinct in one agg, whose Expand
        // duplicates the scan per distinct column (measured 10x slower)
        val li = Tables.lineitem(s, d)
        val ap = li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
            approx_count_distinct(col("l_orderkey"), 0.02).as("ao"))
        val ep = li.select(col("l_returnflag"), col("l_partkey")).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_parts"))
        val eo = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_orders"))
        ap.join(ep, Seq("l_returnflag")).join(eo, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
            (abs(col("ap") - col("exact_parts")) * 100 <= col("exact_parts") * 5 &&
              abs(col("ao") - col("exact_orders")) * 100 <= col("exact_orders") * 5)
              .cast("long").as("within_bound"))
      },
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_partkey) AS exact_parts,
             |  COUNT(DISTINCT l_orderkey) AS exact_orders,
             |  CAST(1 AS BIGINT) AS within_bound
             |FROM lineitem GROUP BY 1""".stripMargin)
    ),

    // ROLLUP hierarchy totals.
    "rollup_nation_segment" -> Query(
      (s, d) =>
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .rollup(col("n_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal")),
      Some("""SELECT n_name, c_mktsegment, COUNT(*) AS n_cust,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP(n_name, c_mktsegment)""".stripMargin)
    ),

    // CUBE over two low-cardinality dims.
    "cube_flag_status" -> Query(
      (s, d) =>
        Tables.lineitem(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin)
    ),

    // Pivot == conditional aggregation; explicit value list so no extra
    // distinct-values job runs at scale.
    "pivot_status_by_flag" -> Query(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum(col("l_quantity").cast("decimal(18,6)")).cast("double")),
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CASE WHEN l_linestatus='F' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS "F",
             |  CAST(SUM(CASE WHEN l_linestatus='O' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS "O"
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    ),

    // Global order + limit: planned as TakeOrdered (per-partition heap +
    // driver merge), never a full sort at scale.
    "sort_topk_global" -> Query(
      (s, d) =>
        Tables.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)
    ),

    // union / intersect / except with branch tags (set semantics).
    "set_ops" -> Query(
      (s, d) => {
        val a = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("k")).distinct()
        val b = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("k"))
        a.intersect(b).select(lit("intersect").as("op"), col("k"))
          .unionAll(a.except(b).select(lit("except").as("op"), col("k")))
          .unionAll(a.union(b).distinct().select(lit("union").as("op"), col("k")))
      },
      Some("""WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus='F'),
             |     b AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
             |SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
             |UNION ALL
             |SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
             |UNION ALL
             |SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)""".stripMargin)
    ),

    // Scalar string/date/math suite — every function stays inside
    // whole-stage codegen; libm-divergent fns (exp/ln/pow) excluded by
    // design, sqrt is IEEE-exact.
    "scalar_functions" -> Query(
      (s, d) =>
        Tables.part(s, d).select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 5).as("sub"),
          length(col("p_name")).cast("long").as("len"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("cat"),
          regexp_replace(col("p_type"), lit(" "), lit("_")).as("repl"),
          lpad(col("p_size").cast("string"), 4, "0").as("pad"),
          abs(col("p_retailprice") - 1000.0).as("ab"),
          ceil(col("p_retailprice")).as("ce"),
          floor(col("p_retailprice")).as("fl"),
          sqrt(col("p_size").cast("double")).as("sq"),
          (col("p_size") % 7).cast("long").as("md"),
          signum(col("p_retailprice") - 1500.0).as("sg")),
      Some("""SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
             |  substr(p_name, 1, 5) AS sub, CAST(length(p_name) AS BIGINT) AS len,
             |  concat(p_brand, '#', p_type) AS cat,
             |  regexp_replace(p_type, ' ', '_', 'g') AS repl,
             |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS pad,
             |  abs(p_retailprice - 1000.0) AS ab,
             |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
             |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
             |  sqrt(CAST(p_size AS DOUBLE)) AS sq,
             |  CAST(p_size % 7 AS BIGINT) AS md,
             |  CAST(sign(p_retailprice - 1500.0) AS DOUBLE) AS sg
             |FROM part""".stripMargin)
    ),

    // CASE / coalesce / nullif / null-safe equality.
    "conditional_null" -> Query(
      (s, d) =>
        Tables.orders(s, d).select(
          col("o_orderkey"),
          when(col("o_orderstatus") === "F", "finished")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("other").as("status_word"),
          coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")), lit("(none)")).as("pri"),
          when(col("o_totalprice") > 200000, "big").otherwise("small").as("size_band"),
          (col("o_orderstatus") <=> lit("P")).as("is_p"),
          greatest(col("o_totalprice"), lit(100000.0)).as("g"),
          least(col("o_totalprice"), lit(100000.0)).as("l")),
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderstatus='F' THEN 'finished'
             |       WHEN o_orderstatus='O' THEN 'open' ELSE 'other' END AS status_word,
             |  COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), '(none)') AS pri,
             |  CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_band,
             |  (o_orderstatus IS NOT DISTINCT FROM 'P') AS is_p,
             |  GREATEST(o_totalprice, 100000.0) AS g,
             |  LEAST(o_totalprice, 100000.0) AS l
             |FROM orders""".stripMargin)
    ),

    // TPC-H Q2 shape: per-part cheapest supplier. The correlated
    // MIN-subquery decorrelates to two partial aggregations — (part,supp)
    // cost totals, then a map-side-combinable min_by per part — so the
    // plan is two shrinking shuffles and zero repeated scans; part and
    // supplier are broadcast dims. Cost stays DECIMAL through the min_by
    // ordering (exact, order-independent) and is emitted as double.
    "q2_min_cost_supplier" -> Query(
      (s, d) => {
        val cost = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,6)")).as("cost"))
        val best = cost.groupBy(col("l_partkey"))
          .agg(min_by(struct(col("l_suppkey"), col("cost")),
            struct(col("cost"), col("l_suppkey"))).as("b"))
          .select(col("l_partkey"), col("b.l_suppkey").as("best_suppkey"),
            col("b.cost").cast("double").as("min_cost"))
        best
          .join(broadcast(Tables.part(s, d).filter(col("p_size") < 15)),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, d)),
            col("best_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("p_name"), col("best_suppkey"),
            col("s_name"), col("min_cost"))
      },
      Some("""WITH cost AS (
             |  SELECT l_partkey, l_suppkey,
             |    SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS cost
             |  FROM lineitem GROUP BY 1, 2),
             |best AS (
             |  SELECT l_partkey, l_suppkey AS best_suppkey,
             |    CAST(cost AS DOUBLE) AS min_cost,
             |    ROW_NUMBER() OVER (PARTITION BY l_partkey
             |                       ORDER BY cost, l_suppkey) AS rn
             |  FROM cost)
             |SELECT p_partkey, p_name, best_suppkey, s_name, min_cost
             |FROM best JOIN part ON l_partkey = p_partkey
             |          JOIN supplier ON best_suppkey = s_suppkey
             |WHERE rn = 1 AND p_size < 15""".stripMargin)
    ),

    // TPC-H Q4 shape: priority counts over orders with at least one late
    // line (shipped >60 days after order date). The EXISTS subquery is a
    // left-semi hash join on orderkey with the lateness inequality as a
    // residual condition — each order passes at most once regardless of
    // how many lines are late, and the date-range filter pushes into the
    // orders scan.
    "q4_order_priority" -> Query(
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                  col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        o.join(Tables.lineitem(s, d),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY o_orderpriority""".stripMargin)
    ),

    // TPC-H Q7 shape: bilateral shipping volume between two nations by
    // year. The nation-pair disjunction evaluates on broadcast dims:
    // supplier+its nation fold into the lineitem scan map-side, customer
    // resolves through the orders join, and the pair filter runs before
    // the final (pair, year) aggregation — so the only wide shuffles are
    // the two fact joins (orderkey, custkey), each carrying rows already
    // cut down by the dim filters.
    "q7_nation_volume" -> Query(
      (s, d) => {
        val n1 = Tables.nation(s, d).select(
          col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        val n2 = Tables.nation(s, d).select(
          col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val pair = (col("cust_nation") === "NATION_1" && col("supp_nation") === "NATION_2") ||
          (col("cust_nation") === "NATION_2" && col("supp_nation") === "NATION_1")
        Tables.lineitem(s, d)
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
          .filter(pair)
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(sum(revenue).cast("double").as("volume"))
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
             |  CAST(SUM(vol) AS DOUBLE) AS volume
             |FROM (SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
             |        CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |        CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6)) AS vol
             |      FROM lineitem
             |        JOIN supplier ON l_suppkey = s_suppkey
             |        JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |        JOIN orders ON l_orderkey = o_orderkey
             |        JOIN customer ON o_custkey = c_custkey
             |        JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |      WHERE (n1.n_name='NATION_1' AND n2.n_name='NATION_2')
             |         OR (n1.n_name='NATION_2' AND n2.n_name='NATION_1'))
             |GROUP BY supp_nation, cust_nation, l_year""".stripMargin)
    ),

    // TPC-H Q10 shape: returned-item revenue ranking — which customers
    // sent the most revenue back in a quarter. Date filter prunes orders
    // at the scan, returnflag prunes lineitem, the surviving facts join
    // on orderkey then custkey, and the top-20 is TakeOrdered over the
    // per-customer aggregate (never a global sort). Revenue ranks on the
    // exact DECIMAL; c_custkey breaks ties deterministically.
    "q10_returned_items" -> Query(
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                  col("o_orderdate") < to_timestamp(lit("1996-07-01 00:00:00")))
        val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        val n = Tables.nation(s, d)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(sum(revenue).as("rev"))
          .orderBy(col("rev").desc, col("c_custkey"))
          .limit(20)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("n_name"), col("rev").cast("double").as("revenue"))
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
             |  CAST(rev AS DOUBLE) AS revenue
             |FROM (SELECT c_custkey, c_name, c_acctbal, n_name,
             |        SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS rev
             |      FROM lineitem
             |        JOIN orders ON l_orderkey = o_orderkey
             |        JOIN customer ON o_custkey = c_custkey
             |        JOIN nation ON c_nationkey = n_nationkey
             |      WHERE l_returnflag = 'R'
             |        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |        AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
             |      GROUP BY 1, 2, 3, 4)
             |ORDER BY rev DESC, c_custkey LIMIT 20""".stripMargin)
    ),

    // TPC-H Q19 shape: OR-of-ANDs bracket predicate across a fact and a
    // broadcast dim. Catalyst extracts the common conjuncts from the
    // disjunction (p_size >= 1, l_quantity >= 1) and pushes them into
    // the scans, the partkey equi-join broadcasts part, and the residual
    // disjunction evaluates inside the join's codegen — no fact shuffle
    // at all before the final small agg.
    "q19_disjunctive_brackets" -> Query(
      (s, d) => {
        val bracket =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .filter(bracket)
          .groupBy(col("p_brand"))
          .agg(sum(revenue).cast("double").as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT p_brand,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_lines
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand='Brand#12' AND p_size BETWEEN 1 AND 5
             |        AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand='Brand#23' AND p_size BETWEEN 1 AND 10
             |        AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand='Brand#3' AND p_size BETWEEN 1 AND 15
             |        AND l_quantity BETWEEN 20 AND 30)
             |GROUP BY p_brand""".stripMargin)
    ),

    // TPC-H Q21 shape: the sole-blame supplier — orders (status F) that
    // involved several suppliers but exactly ONE shipped late, counted
    // against that supplier. The classic double EXISTS / NOT EXISTS
    // decorrelates into one per-order aggregate: two conditional
    // COUNT(DISTINCT) + a conditional MAX recover "multiple suppliers,
    // single late one, who was it" in a single orderkey shuffle —
    // instead of Q21's textbook four scans of lineitem. The blame count
    // is a second (tiny) shuffle on suppkey; supplier is broadcast and
    // the top-10 is TakeOrdered.
    "q21_blame_supplier" -> Query(
      (s, d) => {
        val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        val late = (col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS")).cast("int")
        val per = Tables.lineitem(s, d)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .withColumn("late", late)
          .groupBy(col("l_orderkey"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(when(col("late") === 1, col("l_suppkey"))).as("n_late"),
            max(when(col("late") === 1, col("l_suppkey"))).as("late_supp"))
          .filter(col("n_supp") > 1 && col("n_late") === 1)
        per.groupBy(col("late_supp"))
          .agg(count(lit(1)).as("numwait"))
          .join(broadcast(Tables.supplier(s, d)),
            col("late_supp") === col("s_suppkey"))
          .orderBy(col("numwait").desc, col("s_suppkey"))
          .limit(10)
          .select(col("s_name"), col("s_suppkey"), col("numwait"))
      },
      Some("""WITH l AS (SELECT l_orderkey, l_suppkey,
             |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
             |         THEN 1 ELSE 0 END AS late
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_orderstatus = 'F'),
             |per AS (SELECT l_orderkey,
             |    COUNT(DISTINCT l_suppkey) AS n_supp,
             |    COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late,
             |    MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
             |  FROM l GROUP BY 1)
             |SELECT s_name, s_suppkey, COUNT(*) AS numwait
             |FROM per JOIN supplier ON late_supp = s_suppkey
             |WHERE n_supp > 1 AND n_late = 1
             |GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey LIMIT 10""".stripMargin)
    ),

    // TPC-H Q6 shape: the canonical forecast-revenue scan — pure
    // filter + aggregate, zero joins. Every predicate pushes into the
    // parquet scan; the shuffle carries exactly ONE partial row per
    // partition. The simplest query in the suite and the purest
    // pushdown/codegen benchmark.
    "q6_forecast_revenue" -> Query(
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                  col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
                  col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,6)"))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_lines")),
      Some("""SELECT
             |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_lines
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)
    ),

    // TPC-H Q14 shape: promo revenue share — a conditional-over-total
    // ratio from ONE pass (two decimal sums in the same agg, no second
    // scan). part broadcasts into the month-pruned lineitem scan.
    "q14_promo_revenue" -> Query(
      (s, d) => {
        val l = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-03-01 00:00:00")) &&
                  col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        l.join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0).cast("decimal(18,6)")))
              .as("promo"),
            sum(revenue).as("total"))
          .select(round(col("promo").cast("double") * 100.0 / col("total").cast("double"), 6)
            .as("promo_pct"),
            col("promo").cast("double").as("promo_rev"),
            col("total").cast("double").as("total_rev"))
      },
      Some("""SELECT
             |  ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO'
             |        THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))
             |        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) * 100.0 /
             |    CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6)
             |    AS promo_pct,
             |  CAST(SUM(CASE WHEN p_type = 'PROMO'
             |        THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))
             |        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS promo_rev,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""".stripMargin)
    ),

    // TPC-H Q15 shape: top supplier(s) by quarterly revenue — the
    // revenue "view" materializes once, its max broadcasts back as a
    // scalar, and the equality filter runs on the EXACT DECIMAL (a
    // double max would non-deterministically drop true ties).
    "q15_top_supplier" -> Query(
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                  col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
          .groupBy(col("l_suppkey"))
          .agg(sum(revenue).as("total_rev"))
        val m = rev.agg(max(col("total_rev")).as("mx"))
        rev.crossJoin(broadcast(m))
          .filter(col("total_rev") === col("mx"))
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_rev").cast("double").as("total_rev"))
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey, SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS total_rev
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
             |  GROUP BY 1),
             |m AS (SELECT MAX(total_rev) AS mx FROM rev)
             |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
             |FROM rev CROSS JOIN m
             |JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_rev = mx""".stripMargin)
    ),

    // TPC-H Q17 shape: small-quantity-order revenue for one brand —
    // the correlated avg-quantity subquery decorrelates to a per-part
    // aggregate joined back, and the 20%-of-average threshold becomes
    // DECIMAL cross-multiplication (qty·5n < Σqty), so no float sits on
    // the keep/drop boundary. part is broadcast; the per-part agg is
    // the only extra shuffle.
    "q17_small_qty_revenue" -> Query(
      (s, d) => {
        val perPart = Tables.lineitem(s, d)
          .groupBy(col("l_partkey").as("apk"))
          .agg(sum(col("l_quantity").cast("decimal(18,6)")).as("sq"),
            count(lit(1)).as("n"))
        val p = Tables.part(s, d).filter(col("p_brand") === "Brand#13")
        Tables.lineitem(s, d)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(perPart, col("l_partkey") === col("apk"))
          .filter(col("l_quantity").cast("decimal(18,6)") * (col("n") * 5) < col("sq"))
          .agg((sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0)
            .as("avg_yearly"),
            count(lit(1)).as("n_lines"))
      },
      Some("""WITH a AS (SELECT l_partkey AS apk,
             |    SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sq, COUNT(*) AS n
             |  FROM lineitem GROUP BY 1)
             |SELECT
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly,
             |  COUNT(*) AS n_lines
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#13'
             |JOIN a ON l_partkey = apk
             |WHERE CAST(l_quantity AS DECIMAL(18,6)) * (n * 5) < sq""".stripMargin)
    ),

    // TPC-H Q22 shape: dormant high-value customers — above-average
    // balance but NO recent orders (nothing in the data's final year).
    // The scalar average broadcasts (an exact decimal sum / count,
    // compared as an identical double on both engines), the NOT EXISTS
    // is a left-anti join against the date-pruned orders scan, and the
    // final rollup groups by nation. Three shuffles total: the avg
    // partial, the anti join, the small group-by.
    "q22_dormant_customers" -> Query(
      (s, d) => {
        val c = Tables.customer(s, d)
        val avgBal = c.filter(col("c_acctbal") > 0.0)
          .agg((sum(col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / count(lit(1))).as("avg_bal"))
        val recent = Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("2000-09-01 00:00:00")))
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_custs"),
            sum(col("c_acctbal").cast("decimal(18,6)")).cast("double").as("total_bal"))
      },
      Some("""WITH a AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             |                  / COUNT(*) AS avg_bal
             |           FROM customer WHERE c_acctbal > 0.0)
             |SELECT c_nationkey, COUNT(*) AS n_custs,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
             |FROM customer CROSS JOIN a
             |WHERE c_acctbal > avg_bal
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '2000-09-01 00:00:00')
             |GROUP BY c_nationkey""".stripMargin)
    )
  )
}
