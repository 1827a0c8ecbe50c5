package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse analytics beyond the reference surface: robust statistics
  * (rolling median, MAD outliers, higher moments), Pareto/ABC
  * classification, Zipf power-law fitting, and conversion-latency
  * distributions. All oracle-checked with the house parity rules —
  * integer/decimal arithmetic wherever the engines could disagree,
  * `round(…, k)` only on terminal derived doubles.
  */
object Analytics {

  /** Daily event counts keyed on the integer µs day index — the shared
    * first stage of the robust-stats queries (one map-side partial agg).
    */
  private def dailyCounts(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("di"))
      .groupBy(col("event_type"), col("di")).agg(count(lit(1)).as("x"))

  private val dailySql =
    """SELECT event_type, epoch_us(ts) // 86400000000 AS di, COUNT(*) AS x
      |FROM events GROUP BY 1, 2""".stripMargin

  val entries: Seq[(String, Query)] = Seq(

    // ABC / PARETO classification: rank parts by revenue, cumulate the
    // share, cut at 80/95%. The global cumulative sum is the distributed
    // range-sort pattern (window_ntile_decile's): range-repartition on the
    // sort key, per-partition running sums stay partition-local, and only
    // the <=32 per-partition TOTALS pass through a single-partition window
    // — no data ever funnels to one task, so the same plan cumulates 100 TB.
    // Money stays integer (1e-4 units); the final share/cut products
    // (cum*10000, cum*100 vs total*80) run in DECIMAL(38) — the sf1
    // stress run proved cum*10000 overflows BIGINT already at ~6M
    // lineitems, and DuckDB's window SUM is HUGEINT-wide natively.
    "abc_pareto" -> Query(
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .groupBy(col("l_partkey").as("part"))
          .agg((sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")) * 10000).cast("long").as("rev_e4"))
        val sorted = graft.Caches.scoped(rev
          .repartitionByRange(32, col("rev_e4").desc, col("part"))
          .sortWithinPartitions(col("rev_e4").desc, col("part"))
          .withColumn("pid", shiftright(monotonically_increasing_id(), 33)))
        val wloc = Window.partitionBy(col("pid"))
          .orderBy(col("rev_e4").desc, col("part"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val psz = sorted.groupBy(col("pid")).agg(sum(col("rev_e4")).as("pn"))
        val offs = psz.withColumn("off",
            coalesce(sum(col("pn")).over(Window.orderBy(col("pid"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("pid"), col("off"))
        val totalDf = psz.agg(sum(col("pn")).as("total"))
        sorted
          .withColumn("lcum", sum(col("rev_e4")).over(wloc))
          .join(broadcast(offs), Seq("pid"))
          .crossJoin(broadcast(totalDf))
          .withColumn("cum", col("off") + col("lcum"))
          .withColumn("cumw", col("cum").cast("decimal(38,0)"))
          .withColumn("totw", col("total").cast("decimal(38,0)"))
          .select(col("part"), col("rev_e4"),
            expr("CAST(cumw * 10000 div totw AS BIGINT)").as("cum_bp"),
            when(col("cumw") * 100 <= col("totw") * 80, "A")
              .when(col("cumw") * 100 <= col("totw") * 95, "B")
              .otherwise("C").as("abc"))
      },
      Some("""WITH r AS (
             |  SELECT l_partkey AS part,
             |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
             |         * 10000 AS BIGINT) AS rev_e4
             |  FROM lineitem GROUP BY 1),
             |c AS (SELECT part, rev_e4,
             |        SUM(rev_e4) OVER (ORDER BY rev_e4 DESC, part
             |                          ROWS UNBOUNDED PRECEDING) AS cum,
             |        SUM(rev_e4) OVER () AS total
             |      FROM r)
             |SELECT part, rev_e4, CAST(cum * 10000 // total AS BIGINT) AS cum_bp,
             |  CASE WHEN cum * 100 <= total * 80 THEN 'A'
             |       WHEN cum * 100 <= total * 95 THEN 'B' ELSE 'C' END AS abc
             |FROM c""".stripMargin)
    ),

    // Rolling EXACT median (7-day, per event type) — the robust trend
    // line dashboards overlay on spiky counts. The window collects only
    // the 7-row frame (collect_list over ROWS BETWEEN 6 PRECEDING), sorts
    // the 7 values in-row, and picks the middle — integer in, integer
    // out, no interpolation for engines to disagree on. Partitioned by
    // event_type, so the WindowExec distributes; frame size is constant,
    // so memory per row is O(7) regardless of data scale.
    "window_rolling_median" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
          .rowsBetween(-6, 0)
        dailyCounts(s, d)
          .withColumn("frame", collect_list(col("x")).over(w))
          .filter(size(col("frame")) === 7)
          .select(col("event_type"), col("di").as("day"), col("x"),
            element_at(array_sort(col("frame")), 4).as("med7"))
      },
      Some(s"""WITH daily AS ($dailySql),
             |f AS (SELECT event_type, di, x,
             |        list(x) OVER (PARTITION BY event_type ORDER BY di
             |                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS frame
             |      FROM daily)
             |SELECT event_type, di AS day, x,
             |  CAST(list_sort(frame)[4] AS BIGINT) AS med7
             |FROM f WHERE len(frame) = 7""".stripMargin)
    ),

    // MAD outlier detection — the robust sibling of events_anomaly_zscore
    // (one wild day can't drag a median the way it drags a mean). Two
    // grouped exact percentiles + one broadcast-able join back onto the
    // daily counts; medians of integer counts are exact halves, so every
    // double here is exactly representable and the 5·MAD comparison is
    // deterministic without rounding.
    "events_anomaly_mad" -> Query(
      (s, d) => {
        val daily = graft.Caches.scoped(dailyCounts(s, d))
        val med = daily.groupBy(col("event_type"))
          .agg(expr("percentile(x, 0.5)").as("med"))
        val dev = daily.join(broadcast(med), Seq("event_type"))
          .withColumn("adev", abs(col("x") - col("med")))
        val mad = dev.groupBy(col("event_type"))
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        dev.join(broadcast(mad), Seq("event_type"))
          .select(col("event_type"), col("di").as("day"), col("x"),
            col("med"), col("mad"),
            (col("adev") > col("mad") * 5).cast("long").as("is_outlier"))
      },
      Some(s"""WITH daily AS ($dailySql),
             |med AS (SELECT event_type, quantile_cont(x, 0.5) AS med
             |        FROM daily GROUP BY 1),
             |dev AS (SELECT d.event_type, d.di, d.x, m.med, abs(d.x - m.med) AS adev
             |        FROM daily d JOIN med m USING (event_type)),
             |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
             |        FROM dev GROUP BY 1)
             |SELECT d.event_type, d.di AS day, d.x, d.med, m.mad,
             |  CAST(d.adev > m.mad * 5 AS BIGINT) AS is_outlier
             |FROM dev d JOIN mad m USING (event_type)""".stripMargin)
    ),

    // Higher-moment distribution profile: skewness + excess kurtosis per
    // group from raw power sums. l_quantity is integer-valued, so x^2..x^4
    // are exact doubles and the DECIMAL power sums are order-independent;
    // the moment formulas run on identical operand bits in both engines
    // and only the terminal skew/kurt round. One map-side partial agg.
    "agg_skew_kurtosis" -> Query(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(26,6)")).cast("double").as("s1"),
            sum((col("l_quantity") * col("l_quantity")).cast("decimal(26,6)"))
              .cast("double").as("s2"),
            sum((col("l_quantity") * col("l_quantity") * col("l_quantity"))
              .cast("decimal(26,6)")).cast("double").as("s3"),
            sum((col("l_quantity") * col("l_quantity") * col("l_quantity")
              * col("l_quantity")).cast("decimal(26,6)")).cast("double").as("s4"))
          .withColumn("mean", col("s1") / col("n"))
          .withColumn("m2", col("s2") / col("n") - col("mean") * col("mean"))
          .withColumn("m3", col("s3") / col("n")
            - lit(3.0) * col("mean") * (col("s2") / col("n"))
            + lit(2.0) * col("mean") * col("mean") * col("mean"))
          .withColumn("m4", col("s4") / col("n")
            - lit(4.0) * col("mean") * (col("s3") / col("n"))
            + lit(6.0) * col("mean") * col("mean") * (col("s2") / col("n"))
            - lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
          .select(col("l_returnflag"), col("n"),
            round(col("mean"), 6).as("mean"),
            round(col("m2"), 6).as("m2"),
            round(col("m3") / pow(col("m2"), 1.5), 6).as("skewness"),
            round(col("m4") / (col("m2") * col("m2")) - 3.0, 6).as("kurtosis")),
      Some("""WITH s AS (
             |  SELECT l_returnflag, COUNT(*) AS n,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(26,6))) AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(26,6))) AS DOUBLE) AS s2,
             |    CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(26,6))) AS DOUBLE) AS s3,
             |    CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity
             |                  AS DECIMAL(26,6))) AS DOUBLE) AS s4
             |  FROM lineitem GROUP BY 1),
             |m AS (SELECT l_returnflag, n, s1 / n AS mean,
             |        s2 / n - (s1 / n) * (s1 / n) AS m2,
             |        s3 / n - 3.0 * (s1 / n) * (s2 / n)
             |          + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             |        s4 / n - 4.0 * (s1 / n) * (s3 / n)
             |          + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
             |          - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
             |      FROM s)
             |SELECT l_returnflag, n, ROUND(mean, 6) AS mean, ROUND(m2, 6) AS m2,
             |  ROUND(m3 / pow(m2, 1.5), 6) AS skewness,
             |  ROUND(m4 / (m2 * m2) - 3.0, 6) AS kurtosis
             |FROM m""".stripMargin)
    ),

    // Zipf power-law fit: least-squares slope of ln(freq) on ln(rank)
    // over each language's top-100 terms — the corpus-health diagnostic
    // (natural text sits near -1; templated/spammy text goes shallow).
    // Per-term ln products are cast to DECIMAL before summing (the
    // text_surprisal trick) so the regression sums are order-independent;
    // only the final slope/intercept divide in double and round.
    "text_zipf_slope" -> Query(
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("lang"),
            explode(graft.functions.TextFunctions.cleanTokens(col("text"))).as("t"))
          .groupBy(col("lang"), col("t")).agg(count(lit(1)).as("n"))
        val wr = Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("t"))
        counts.withColumn("rn", row_number().over(wr))
          .filter(col("rn") <= 100)
          .withColumn("x", log(col("rn").cast("double")))
          .withColumn("y", log(col("n").cast("double")))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_terms"),
            sum(col("x").cast("decimal(18,12)")).cast("double").as("sx"),
            sum(col("y").cast("decimal(18,12)")).cast("double").as("sy"),
            sum((col("x") * col("y")).cast("decimal(18,12)")).cast("double").as("sxy"),
            sum((col("x") * col("x")).cast("decimal(18,12)")).cast("double").as("sxx"))
          .select(col("lang"), col("n_terms"),
            round((col("n_terms") * col("sxy") - col("sx") * col("sy"))
              / (col("n_terms") * col("sxx") - col("sx") * col("sx")), 4)
              .as("zipf_slope"),
            round((col("sy") - (col("n_terms") * col("sxy") - col("sx") * col("sy"))
              / (col("n_terms") * col("sxx") - col("sx") * col("sx")) * col("sx"))
              / col("n_terms"), 4).as("intercept"))
      },
      Some("""WITH tok AS (
             |  SELECT lang,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |                       x -> x <> '')) AS t
             |  FROM documents),
             |c AS (SELECT lang, t, COUNT(*) AS n FROM tok GROUP BY 1, 2),
             |r AS (SELECT lang, n,
             |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, t) AS rn
             |      FROM c QUALIFY rn <= 100),
             |p AS (SELECT lang, ln(CAST(rn AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
             |      FROM r),
             |a AS (SELECT lang, COUNT(*) AS n_terms,
             |        CAST(SUM(CAST(x AS DECIMAL(18,12))) AS DOUBLE) AS sx,
             |        CAST(SUM(CAST(y AS DECIMAL(18,12))) AS DOUBLE) AS sy,
             |        CAST(SUM(CAST(x * y AS DECIMAL(18,12))) AS DOUBLE) AS sxy,
             |        CAST(SUM(CAST(x * x AS DECIMAL(18,12))) AS DOUBLE) AS sxx
             |      FROM p GROUP BY 1)
             |SELECT lang, n_terms,
             |  ROUND((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 4)
             |    AS zipf_slope,
             |  ROUND((sy - (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx) * sx)
             |        / n_terms, 4) AS intercept
             |FROM a""".stripMargin)
    ),

    // Correlation / covariance per group — the relationship stats a
    // warehouse publishes next to means. Computed from the same exact-
    // DECIMAL power-sum machinery as agg_skew_kurtosis (one partial
    // agg; identical formula shape cross-engine; round only terminal
    // values). quantity x extendedprice is deliberately near-null
    // correlation, discount x extendedprice mildly structured.
    "agg_corr" -> Query(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(26,6)")).cast("double").as("sx"),
            sum(col("l_extendedprice").cast("decimal(26,6)")).cast("double").as("sy"),
            sum((col("l_quantity") * col("l_extendedprice")).cast("decimal(26,6)"))
              .cast("double").as("sxy"),
            sum((col("l_quantity") * col("l_quantity")).cast("decimal(26,6)"))
              .cast("double").as("sxx"),
            sum((col("l_extendedprice") * col("l_extendedprice")).cast("decimal(38,6)"))
              .cast("double").as("syy"))
          .select(col("l_returnflag"), col("n"),
            round((col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))), 4)
              .as("covar_pop"),
            round((col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n")))
              / (sqrt(col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n")))
                * sqrt(col("syy") / col("n") - (col("sy") / col("n")) * (col("sy") / col("n")))), 6)
              .as("corr")),
      Some("""WITH s AS (
             |  SELECT l_returnflag, COUNT(*) AS n,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(26,6))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(26,6))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(26,6))) AS DOUBLE) AS sxy,
             |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(26,6))) AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, n,
             |  ROUND((sxy / n - (sx / n) * (sy / n)), 4) AS covar_pop,
             |  ROUND((sxy / n - (sx / n) * (sy / n))
             |        / (sqrt(sxx / n - (sx / n) * (sx / n))
             |           * sqrt(syy / n - (sy / n) * (sy / n))), 6) AS corr
             |FROM s""".stripMargin)
    ),

    // K-ANONYMITY audit — the compliance gate a dataset passes before
    // leaving the warehouse: group by the quasi-identifier tuple
    // (nation, market segment), flag every group smaller than k=5, and
    // report how many customers sit in re-identifiable groups. One
    // map-side partial agg over the quasi-identifier; the audit output
    // is O(|QI combinations|) regardless of data size.
    "etl_k_anonymity" -> Query(
      (s, d) =>
        Tables.customer(s, d)
          .groupBy(col("c_nationkey").as("nationkey"),
            col("c_mktsegment").as("mktsegment"))
          .agg(count(lit(1)).as("n"))
          .withColumn("k_anonymous", (col("n") >= 5).cast("long"))
          .withColumn("n_at_risk",
            when(col("n") < 5, col("n")).otherwise(0L)),
      Some("""SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
             |  COUNT(*) AS n,
             |  CAST(COUNT(*) >= 5 AS BIGINT) AS k_anonymous,
             |  CASE WHEN COUNT(*) < 5 THEN COUNT(*) ELSE 0 END AS n_at_risk
             |FROM customer GROUP BY 1, 2""".stripMargin)
    ),

    // EXACT global median without a global sort — the two-pass
    // histogram-bisect every engine uses when "exact percentile of 100 TB"
    // actually has to run: pass 1 folds a tiny bucket histogram ($10k
    // buckets over integer cents, one partial agg), the driver-side-sized
    // cumulative locates which bucket(s) hold the middle ranks, pass 2
    // sorts ONLY those buckets' rows (row_number partitioned by bucket +
    // broadcast cumulative offset = global rank). The full dataset is
    // never sorted and never moves to one partition. Integer cents end to
    // end; the terminal dollars value is one identical double division.
    "agg_exact_median_2pass" -> Query(
      (s, d) => {
        val c = graft.Caches.scoped(Tables.orders(s, d).select(
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents")))
        val hist = c.groupBy(expr("cents div 1000000").as("bkt"))
          .agg(count(lit(1)).as("n"))
        val cum = hist
          .withColumn("cumhi", sum(col("n")).over(Window.orderBy(col("bkt"))))
          .withColumn("cumlo", col("cumhi") - col("n"))
        val ks = hist.agg(sum(col("n")).as("ntot"))
          .withColumn("k1", expr("(ntot + 1) div 2"))
          .withColumn("k2", expr("(ntot + 2) div 2"))
        val targets = cum.crossJoin(broadcast(ks))
          .filter((col("k1") > col("cumlo") && col("k1") <= col("cumhi")) ||
            (col("k2") > col("cumlo") && col("k2") <= col("cumhi")))
          .select(col("bkt"), col("cumlo"))
        c.join(broadcast(targets), expr("cents div 1000000") === col("bkt"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("bkt")).orderBy(col("cents"))))
          .withColumn("pos", col("cumlo") + col("rn"))
          .crossJoin(broadcast(ks))
          .filter(col("pos") === col("k1") || col("pos") === col("k2"))
          .groupBy(col("ntot").as("n"))
          .agg(sum(col("cents") *
            when(col("k1") === col("k2"), 2L).otherwise(1L))
            .cast("long").as("median_x2_cents"))
          .withColumn("median_usd",
            col("median_x2_cents").cast("double") / 200.0)
      },
      Some("""WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |             AS cents FROM orders),
             |r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS pos,
             |        COUNT(*) OVER () AS ntot
             |      FROM c),
             |m AS (SELECT ntot AS n,
             |        CAST(SUM(cents * CASE WHEN (ntot + 1) // 2 = (ntot + 2) // 2
             |                              THEN 2 ELSE 1 END) AS BIGINT)
             |          AS median_x2_cents
             |      FROM r
             |      WHERE pos IN ((ntot + 1) // 2, (ntot + 2) // 2)
             |      GROUP BY ntot)
             |SELECT n, median_x2_cents,
             |  CAST(median_x2_cents AS DOUBLE) / 200.0 AS median_usd
             |FROM m""".stripMargin)
    ),

    // MAX DRAWDOWN of the cumulative daily-value series per event type
    // — the risk metric for any monotone-ish KPI (revenue, balance):
    // drawdown(t) = running_max(cum) - cum, and the headline is its
    // peak. Cumulative and running max ride ONE partitioned window
    // sort; values stay integer (1e-2 units) end to end.
    "window_drawdown" -> Query(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("di"),
            col("value"))
          .groupBy(col("event_type"), col("di"))
          // net daily flow: values under 100 add, the rest subtract —
          // a deterministic synthetic +/- series so drawdowns exist
          .agg((sum(when(col("value") < 100, col("value"))
            .otherwise(-col("value")).cast("decimal(18,2)")) * 100)
            .cast("long").as("flow"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .withColumn("cum", sum(col("flow")).over(w))
          .withColumn("peak", max(col("cum")).over(w))
          .select(col("event_type"), col("di").as("day"), col("flow"),
            col("cum"), (col("peak") - col("cum")).as("drawdown"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, epoch_us(ts) // 86400000000 AS di,
             |    CAST(SUM(CAST(CASE WHEN "value" < 100 THEN "value"
             |                       ELSE -"value" END AS DECIMAL(18,2))) * 100 AS BIGINT)
             |      AS flow
             |  FROM events GROUP BY 1, 2),
             |c AS (SELECT event_type, di, flow,
             |        CAST(SUM(flow) OVER (PARTITION BY event_type ORDER BY di
             |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |             AS BIGINT) AS cum
             |      FROM daily),
             |p AS (SELECT event_type, di, flow, cum,
             |        MAX(cum) OVER (PARTITION BY event_type ORDER BY di
             |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS peak
             |      FROM c)
             |SELECT event_type, di AS day, flow, cum,
             |  CAST(peak - cum AS BIGINT) AS drawdown
             |FROM p""".stripMargin)
    ),

    // WINSORIZED mean — the robust mean that survives fat tails: clamp
    // every value into [p05, p95] before averaging. Exact percentiles
    // come from GroupedPercentile.exact (histogram-bisect two-pass —
    // no per-group value buffer, unlike Spark's `percentile` aggregate
    // whose buffer holds every group value; events.value is exact
    // 2-decimal, so it rides as integer cents with $10 buckets and the
    // interpolation reproduces `percentile` bit-for-bit). Thresholds
    // broadcast back; the clamped sum goes through DECIMAL so
    // partition order cannot move it. The outlier fraction is reported
    // alongside so the clamping is auditable.
    "agg_winsorized_mean" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_type"), col("value"))
        val evc = graft.Caches.scoped(ev.select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("vc")))
        val pct = GroupedPercentile.exact(evc, "event_type", "vc",
            Seq(("p05", 0.05), ("p95", 0.95)),
            expr("vc div 1000"), _.cast("double") / lit(100.0))
          .groupBy(col("event_type"))
          .agg(max(when(col("pname") === "p05", col("res"))).as("p05"),
            max(when(col("pname") === "p95", col("res"))).as("p95"))
        ev.join(broadcast(pct), Seq("event_type"))
          .withColumn("wv", when(col("value") < col("p05"), col("p05"))
            .when(col("value") > col("p95"), col("p95"))
            .otherwise(col("value")))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") < col("p05") || col("value") > col("p95"), 1L)
              .otherwise(0L)).as("n_clamped"),
            round(sum(col("wv").cast("decimal(18,6)")).cast("double")
              / count(lit(1)), 6).as("winsorized_mean"),
            round(sum(col("value").cast("decimal(18,6)")).cast("double")
              / count(lit(1)), 6).as("raw_mean"))
      },
      Some("""WITH p AS (SELECT event_type,
             |             quantile_cont("value", 0.05) AS p05,
             |             quantile_cont("value", 0.95) AS p95
             |           FROM events GROUP BY 1),
             |w AS (SELECT e.event_type, e."value" AS v,
             |        CASE WHEN e."value" < p.p05 THEN p.p05
             |             WHEN e."value" > p.p95 THEN p.p95
             |             ELSE e."value" END AS wv,
             |        CAST(e."value" < p.p05 OR e."value" > p.p95 AS BIGINT) AS cl
             |      FROM events e JOIN p USING (event_type))
             |SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(cl) AS BIGINT) AS n_clamped,
             |  ROUND(CAST(SUM(CAST(wv AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
             |    AS winsorized_mean,
             |  ROUND(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
             |    AS raw_mean
             |FROM w GROUP BY event_type""".stripMargin)
    ),

    // A/B experiment readout — deterministic hash-split assignment
    // (md5 of user_id, the same trick as etl_stratified_sample, so
    // assignment is reproducible and balanced without coordination),
    // then per-arm mean purchase value and Welch's z from exact-DECIMAL
    // sums in ONE grouped agg + one tiny self-join. The z statistic is
    // derived from identical double operands cross-engine; only it is
    // rounded. The same plan reads a 100 TB event log: assignment is a
    // scan-local expression, the readout is one partial agg.
    "events_ab_lift" -> Query(
      (s, d) => {
        val arm = (expr("cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint)")
          % 2 === 0)
        val stats = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(when(arm, "A").otherwise("B").as("arm"), col("value"))
          .groupBy(col("arm"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sx"),
            sum((col("value") * col("value")).cast("decimal(26,6)")).cast("double")
              .as("sxx"))
          .withColumn("mean", col("sx") / col("n"))
          .withColumn("var", (col("sxx") - col("sx") * col("sx") / col("n"))
            / (col("n") - 1))
        val a = stats.filter(col("arm") === "A")
          .select(col("n").as("n_a"), col("mean").as("mean_a"), col("var").as("var_a"))
        val b = stats.filter(col("arm") === "B")
          .select(col("n").as("n_b"), col("mean").as("mean_b"), col("var").as("var_b"))
        a.crossJoin(b).select(
          col("n_a"), col("n_b"),
          round(col("mean_a"), 6).as("mean_a"),
          round(col("mean_b"), 6).as("mean_b"),
          round((col("mean_b") - col("mean_a"))
            / sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")), 6)
            .as("welch_z"))
      },
      Some("""WITH p AS (SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
             |                            AS BIGINT) % 2 = 0
             |                  THEN 'A' ELSE 'B' END AS arm, "value" AS v
             |           FROM events WHERE event_type = 'purchase'),
             |s AS (SELECT arm, COUNT(*) AS n,
             |        CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             |        CAST(SUM(CAST(v * v AS DECIMAL(26,6))) AS DOUBLE) AS sxx
             |      FROM p GROUP BY arm),
             |m AS (SELECT arm, n, sx / n AS mean,
             |        (sxx - sx * sx / n) / (n - 1) AS var FROM s)
             |SELECT a.n AS n_a, b.n AS n_b,
             |  ROUND(a.mean, 6) AS mean_a, ROUND(b.mean, 6) AS mean_b,
             |  ROUND((b.mean - a.mean) / sqrt(a.var / a.n + b.var / b.n), 6) AS welch_z
             |FROM m a CROSS JOIN m b WHERE a.arm = 'A' AND b.arm = 'B'""".stripMargin)
    ),

    // DAU/MAU stickiness — the product-analytics ratio every growth
    // dashboard leads with. Two distinct-user aggs (day and 30-day
    // month) + one broadcast-able join back onto the daily row;
    // integer basis points, no floats anywhere.
    "events_stickiness" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"),
          expr("(ts div 1000) div 86400000000").as("di"))
          .withColumn("mi", expr("di div 30"))
        val dau = ev.groupBy(col("di"), col("mi"))
          .agg(countDistinct(col("user_id")).as("dau"))
        val mau = ev.groupBy(col("mi"))
          .agg(countDistinct(col("user_id")).as("mau"))
        dau.join(broadcast(mau), Seq("mi"))
          .select(col("di").as("day"), col("dau"), col("mau"),
            expr("dau * 10000 div mau").as("stickiness_bp"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS di,
             |             (epoch_us(ts) // 86400000000) // 30 AS mi
             |           FROM events),
             |dau AS (SELECT di, mi, COUNT(DISTINCT user_id) AS dau FROM e GROUP BY 1, 2),
             |mau AS (SELECT mi, COUNT(DISTINCT user_id) AS mau FROM e GROUP BY 1)
             |SELECT dau.di AS day, dau.dau, mau.mau,
             |  dau.dau * 10000 // mau.mau AS stickiness_bp
             |FROM dau JOIN mau USING (mi)""".stripMargin)
    ),

    // GINI concentration coefficient of per-part revenue — the
    // inequality summary published next to the Pareto cut. Needs the
    // rank-weighted sum Σ i·xᵢ over the ASCENDING revenue order: same
    // distributed range-sort machinery as abc_pareto (local ranks +
    // broadcast per-partition offsets), so no data-sized single
    // partition; every term is integer cents and only the final ratio
    // divides in double.
    "agg_gini" -> Query(
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .groupBy(col("l_partkey").as("part"))
          .agg((sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")) * 10000).cast("long").as("x"))
        val sorted = graft.Caches.scoped(rev
          .repartitionByRange(32, col("x"), col("part"))
          .sortWithinPartitions(col("x"), col("part"))
          .withColumn("mid", monotonically_increasing_id())
          .withColumn("pid", shiftright(col("mid"), 33))
          .withColumn("lrank", col("mid").bitwiseAND(lit((1L << 33) - 1))))
        val psz = sorted.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
        val offs = psz.withColumn("off",
            coalesce(sum(col("pn")).over(Window.orderBy(col("pid"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("pid"), col("off"))
        sorted.join(broadcast(offs), Seq("pid"))
          .select(col("x"), (col("off") + col("lrank") + 1L).as("i"))
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast("decimal(38,0)")).as("sx"),
            sum((col("i").cast("decimal(38,0)") * col("x"))).as("six"))
          .select(col("n"),
            round((lit(2.0) * col("six").cast("double"))
              / (col("n") * col("sx").cast("double"))
              - (col("n") + lit(1.0)) / col("n"), 6).as("gini"))
      },
      Some("""WITH r AS (
             |  SELECT l_partkey AS part,
             |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
             |         * 10000 AS BIGINT) AS x
             |  FROM lineitem GROUP BY 1),
             |rk AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, part) AS i FROM r),
             |a AS (SELECT COUNT(*) AS n,
             |        SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             |        SUM(CAST(i AS DECIMAL(38,0)) * x) AS six
             |      FROM rk)
             |SELECT n, ROUND((2.0 * CAST(six AS DOUBLE)) / (n * CAST(sx AS DOUBLE))
             |             - (n + 1.0) / n, 6) AS gini
             |FROM a""".stripMargin)
    ),

    // SKYLINE (Pareto frontier): parts no other part beats on BOTH
    // price (lower) and size (bigger) — the multi-criteria shortlist
    // query. One ascending price order; a point survives iff its size
    // exceeds the running max of everything cheaper. The running max
    // distributes exactly like abc_pareto's running sum: local prefix
    // max within range partitions + broadcast prefix-max of the <=32
    // per-partition maxima — no data-sized single partition.
    "q_skyline" -> Query(
      (s, d) => {
        val p = Tables.part(s, d).select(col("p_partkey"),
          col("p_retailprice"), col("p_size").cast("long").as("sz"))
        val sorted = graft.Caches.scoped(p
          .repartitionByRange(32, col("p_retailprice"), col("p_partkey"))
          .sortWithinPartitions(col("p_retailprice"), col("p_partkey"))
          .withColumn("pid", shiftright(monotonically_increasing_id(), 33)))
        val wloc = Window.partitionBy(col("pid"))
          .orderBy(col("p_retailprice"), col("p_partkey"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val pmax = sorted.groupBy(col("pid")).agg(max(col("sz")).as("pm"))
        val offs = pmax.withColumn("om",
            max(col("pm")).over(Window.orderBy(col("pid"))
              .rowsBetween(Window.unboundedPreceding, -1)))
          .select(col("pid"), col("om"))
        sorted
          .withColumn("lm", max(col("sz")).over(wloc))
          .join(broadcast(offs), Seq("pid"))
          .withColumn("mx", greatest(coalesce(col("lm"), lit(Long.MinValue)),
            coalesce(col("om"), lit(Long.MinValue))))
          .filter(col("mx") === Long.MinValue || col("sz") > col("mx"))
          .select(col("p_partkey"), col("p_retailprice"), col("sz").as("p_size"))
      },
      Some("""WITH r AS (SELECT p_partkey, p_retailprice,
             |             CAST(p_size AS BIGINT) AS p_size,
             |             MAX(CAST(p_size AS BIGINT)) OVER (
             |               ORDER BY p_retailprice, p_partkey
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
             |           FROM part)
             |SELECT p_partkey, p_retailprice, p_size
             |FROM r WHERE mx IS NULL OR p_size > mx""".stripMargin)
    ),

    // Seasonal-naive forecast BACKTEST — the baseline every demand
    // forecaster must beat, evaluated in one pass: forecast = the 7th
    // prior OBSERVED day of the series (row-offset lag; on a series
    // with calendar gaps that is not literally t-7 days — gap_fill
    // first for strict calendar seasonality) vs the drift-naive
    // previous observation, scored by MAE per series. Daily counts
    // are integers, lags ride one partitioned window sort, and only the
    // terminal MAE divides in double.
    "events_forecast_naive" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        dailyCounts(s, d)
          .withColumn("f7", lag(col("x"), 7).over(w))
          .withColumn("f1", lag(col("x"), 1).over(w))
          .filter(col("f7").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(abs(col("x") - col("f7"))).as("sae7"),
            sum(abs(col("x") - col("f1"))).as("sae1"))
          .select(col("event_type"), col("n_days"),
            round(col("sae7").cast("double") / col("n_days"), 4).as("mae_seasonal7"),
            round(col("sae1").cast("double") / col("n_days"), 4).as("mae_naive1"))
      },
      Some(s"""WITH daily AS ($dailySql),
             |l AS (SELECT event_type, di, x,
             |        lag(x, 7) OVER (PARTITION BY event_type ORDER BY di) AS f7,
             |        lag(x, 1) OVER (PARTITION BY event_type ORDER BY di) AS f1
             |      FROM daily)
             |SELECT event_type, COUNT(*) AS n_days,
             |  ROUND(CAST(SUM(abs(x - f7)) AS DOUBLE) / COUNT(*), 4) AS mae_seasonal7,
             |  ROUND(CAST(SUM(abs(x - f1)) AS DOUBLE) / COUNT(*), 4) AS mae_naive1
             |FROM l WHERE f7 IS NOT NULL GROUP BY event_type""".stripMargin)
    ),

    // EXACT distinct via bitmap OR — the roaring-bitmap pattern for
    // dense integer id domains: pack ids into long words (63 ids per
    // word per group), OR the words map-side, popcount at the end. Two partial aggs, no count-distinct Expand, and the word
    // table re-aggregates across groups for free (bitmap union = OR) —
    // the property HLL gives approximately, exact here.
    "agg_bitmap_distinct" -> Query(
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"), col("user_id"))
          // 63 ids per word keeps the shift <= 62 — bit 63 would be the
          // sign bit, which DuckDB's checked BIGINT shift rejects
          .groupBy(col("event_type"), expr("user_id div 63").as("word"))
          .agg(expr("bit_or(shiftleft(1L, cast(user_id % 63 as int)))").as("bits"))
          .groupBy(col("event_type"))
          .agg(sum(expr("bit_count(bits)")).cast("long").as("n_users"),
            count(lit(1)).as("n_words")),
      Some("""WITH w AS (SELECT event_type, user_id // 63 AS word,
             |             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER)) AS bits
             |           FROM events GROUP BY 1, 2)
             |SELECT event_type, CAST(SUM(bit_count(bits)) AS BIGINT) AS n_users,
             |  COUNT(*) AS n_words
             |FROM w GROUP BY event_type""".stripMargin)
    ),

    // COUNT-MIN SKETCH frequency estimation (Cormode/Muthukrishnan) —
    // the mergeable heavy-hitter counter streaming systems keep when
    // exact per-key counts don't fit: depth 4 x width 1024 counters,
    // row hashes salted md5 (deterministic), estimate = min over the
    // key's 4 counters. UNLIKE the HLL-family entries this sketch is
    // EXACTLY oracle-checked: both engines rebuild identical counter
    // tables from the same md5 buckets, so the estimates (and the
    // collision-driven overestimates, reported in bp against the
    // exact counts of the top-20 keys) hash-match bit for bit. Plan:
    // one map-side-combinable 1024-row counter agg + a TakeOrdered
    // top-20 + a broadcast counter join — no all-pairs, no value
    // buffers, counters re-aggregable across partitions/batches by
    // construction.
    "agg_count_min_sketch" -> Query(
      (s, d) => {
        val depth = 4
        val width = 1024
        def buckets(key: org.apache.spark.sql.Column) =
          array((0 until depth).map { i =>
            struct(lit(i).as("r"),
              (graft.functions.Hashing.md5Long32(
                concat(lit(s"cms${i}_"), key.cast("string"))) % width).as("b"))
          }: _*)
        val li = Tables.lineitem(s, d).select(col("l_partkey"))
        // value-level fold: counter(r,b) = Σ_key count(key) over keys
        // hashing to b, so the sketch builds from the per-KEY count
        // table — 4 hashes per DISTINCT key instead of per fact row
        // (identical counters), and `truth` shares the same subtree
        val keyCounts = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("kc"))
        val counters = keyCounts
          .select(col("kc"), explode(buckets(col("l_partkey"))).as("rb"))
          .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
          .agg(sum(col("kc")).as("c"))
        val truth = keyCounts
          .select(col("l_partkey"), col("kc").as("true_cnt"))
          .orderBy(col("true_cnt").desc, col("l_partkey")).limit(20)
        truth
          .select(col("l_partkey"), col("true_cnt"),
            explode(buckets(col("l_partkey"))).as("rb"))
          .select(col("l_partkey"), col("true_cnt"),
            col("rb.r").as("r"), col("rb.b").as("b"))
          .join(broadcast(counters), Seq("r", "b"))
          .groupBy(col("l_partkey"), col("true_cnt"))
          .agg(min(col("c")).as("est_cnt"))
          .select(col("l_partkey").as("part"), col("true_cnt"), col("est_cnt"),
            expr("(est_cnt - true_cnt) * 10000 div true_cnt").as("over_bp"))
      },
      Some("""WITH li AS (SELECT l_partkey FROM lineitem),
             |rws AS (SELECT l_partkey, rr.r,
             |          CAST('0x' || substr(md5('cms' || rr.r || '_'
             |            || CAST(l_partkey AS VARCHAR)), 1, 8) AS BIGINT) % 1024 AS b
             |        FROM li CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) rr),
             |counters AS (SELECT r, b, COUNT(*) AS c FROM rws GROUP BY 1, 2),
             |truth AS (SELECT l_partkey, COUNT(*) AS true_cnt FROM li GROUP BY 1
             |          ORDER BY true_cnt DESC, l_partkey LIMIT 20),
             |est AS (SELECT t.l_partkey, t.true_cnt, MIN(c.c) AS est_cnt
             |        FROM truth t
             |        CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) rr
             |        JOIN counters c ON c.r = rr.r
             |          AND c.b = CAST('0x' || substr(md5('cms' || rr.r || '_'
             |            || CAST(t.l_partkey AS VARCHAR)), 1, 8) AS BIGINT) % 1024
             |        GROUP BY 1, 2)
             |SELECT l_partkey AS part, true_cnt, est_cnt,
             |  CAST((est_cnt - true_cnt) * 10000 // true_cnt AS BIGINT) AS over_bp
             |FROM est""".stripMargin)
    ),

    // DIFFERENCE-IN-DIFFERENCES readout — the quasi-experimental
    // causal estimate when randomization isn't available: treatment =
    // odd user ids, post-period = days at or past the observed
    // midpoint (derived in-plan from min/max day, broadcast as a
    // 1-row scalar — no driver action), outcome = events per active
    // user. The four cell rates ship in exact 1e-4 fixed point
    // (ev·10000 div users) and the DiD estimate is pure integer
    // arithmetic on them — the 2x2 table the analysis would publish,
    // hash-exact. One distinct-user agg per cell + the scalar attach.
    "events_did_estimator" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("di"))
        val mid = ev.agg(min(col("di")).as("mn"), max(col("di")).as("mx"))
          .select(expr("(mn + mx + 1) div 2").as("mid"))
        val cells = ev.crossJoin(broadcast(mid))
          .select((col("user_id") % 2).as("treated"),
            (col("di") >= col("mid")).cast("long").as("post"), col("user_id"))
          .groupBy(col("treated"), col("post"))
          .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
          .withColumn("rate_e4", expr("n_events * 10000 div n_users"))
        cells.groupBy()
          .agg(
            sum(when(col("treated") === 1 && col("post") === 1, col("rate_e4"))).as("t_post"),
            sum(when(col("treated") === 1 && col("post") === 0, col("rate_e4"))).as("t_pre"),
            sum(when(col("treated") === 0 && col("post") === 1, col("rate_e4"))).as("c_post"),
            sum(when(col("treated") === 0 && col("post") === 0, col("rate_e4"))).as("c_pre"))
          .select(col("t_pre"), col("t_post"), col("c_pre"), col("c_post"),
            ((col("t_post") - col("t_pre")) - (col("c_post") - col("c_pre"))).as("did_e4"))
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS di FROM events),
             |k AS (SELECT (MIN(di) + MAX(di) + 1) // 2 AS mid FROM ev),
             |cells AS (SELECT user_id % 2 AS treated,
             |            CAST(di >= k.mid AS BIGINT) AS post,
             |            COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
             |          FROM ev CROSS JOIN k GROUP BY 1, 2),
             |r AS (SELECT treated, post, n_events * 10000 // n_users AS rate_e4 FROM cells)
             |SELECT
             |  CAST(SUM(CASE WHEN treated = 1 AND post = 0 THEN rate_e4 END) AS BIGINT) AS t_pre,
             |  CAST(SUM(CASE WHEN treated = 1 AND post = 1 THEN rate_e4 END) AS BIGINT) AS t_post,
             |  CAST(SUM(CASE WHEN treated = 0 AND post = 0 THEN rate_e4 END) AS BIGINT) AS c_pre,
             |  CAST(SUM(CASE WHEN treated = 0 AND post = 1 THEN rate_e4 END) AS BIGINT) AS c_post,
             |  CAST((SUM(CASE WHEN treated = 1 AND post = 1 THEN rate_e4 END)
             |      - SUM(CASE WHEN treated = 1 AND post = 0 THEN rate_e4 END))
             |     - (SUM(CASE WHEN treated = 0 AND post = 1 THEN rate_e4 END)
             |      - SUM(CASE WHEN treated = 0 AND post = 0 THEN rate_e4 END)) AS BIGINT) AS did_e4
             |FROM r""".stripMargin)
    ),

    // SINGLE-CHANGEPOINT detection per event-type daily series — the
    // offline CUSUM argmax (the first split of binary segmentation):
    // the changepoint is the prefix t maximizing |n·S_t − t·S_n|
    // (equivalently the scaled gap between the prefix mean and the
    // global mean), ties to the earliest day. All arithmetic is exact
    // integers — prefix sums ride one partitioned window sort, the
    // argmax is a struct max that combines map-side — and the verdict
    // flags series whose normalized statistic clears a fixed
    // threshold. The level-shift screen run before alerting/forecast
    // work; pairs with events_page_hinkley's sequential detector.
    "events_changepoint_cusum" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        val wt = Window.partitionBy(col("event_type"))
        val pre = dailyCounts(s, d)
          .withColumn("t", row_number().over(w).cast("long"))
          .withColumn("st", sum(col("x")).over(w))
          .withColumn("n", count(lit(1)).over(wt))
          .withColumn("sn", sum(col("x")).over(wt))
          .filter(col("t") < col("n")) // a split needs both sides non-empty
          .withColumn("g", abs(col("n") * col("st") - col("t") * col("sn")))
        pre.groupBy(col("event_type"))
          .agg(max(col("n")).as("n_days"), max(col("sn")).as("total"),
            max(struct(col("g"), (-col("t")).as("nt"), col("di").as("cd"),
              col("st").as("cs"))).as("best"))
          .select(col("event_type"), col("n_days"), col("total"),
            (-col("best.nt")).as("cp_t"), col("best.cd").as("cp_di"),
            col("best.g").as("gap_num"),
            // normalized gap in bp of the worst-case n*S_n scale
            expr("best.g * 10000 div (n_days * total)").as("gap_bp"))
          .withColumn("shifted", (col("gap_bp") >= 500).cast("long"))
      },
      Some(s"""WITH daily AS ($dailySql),
             |p AS (SELECT event_type, di, x,
             |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY di) AS t,
             |        SUM(x) OVER (PARTITION BY event_type ORDER BY di
             |          ROWS UNBOUNDED PRECEDING) AS st,
             |        COUNT(*) OVER (PARTITION BY event_type) AS n,
             |        SUM(x) OVER (PARTITION BY event_type) AS sn
             |      FROM daily),
             |g AS (SELECT event_type, t, di, st, n, sn,
             |        abs(n * st - t * sn) AS gp
             |      FROM p WHERE t < n),
             |b AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
             |        CAST(MAX(sn) AS BIGINT) AS total,
             |        MAX(struct_pack(g := gp, nt := -t, cd := di, cs := st)) AS best
             |      FROM g GROUP BY 1)
             |SELECT event_type, n_days, total,
             |  CAST(-(best.nt) AS BIGINT) AS cp_t,
             |  CAST(best.cd AS BIGINT) AS cp_di,
             |  CAST(best.g AS BIGINT) AS gap_num,
             |  CAST(best.g * 10000 // (n_days * total) AS BIGINT) AS gap_bp,
             |  CAST(best.g * 10000 // (n_days * total) >= 500 AS BIGINT) AS shifted
             |FROM b""".stripMargin)
    ),

    // HOLT LINEAR-TREND smoothing (double exponential) per event-type
    // daily series — the level+trend upgrade of the naive forecasts
    // above, with the 7-day-ahead projection a capacity planner reads.
    // Dyadic parameters (alpha = 1/2, beta = 1/4) keep every update a
    // binary-exact double op: l_t = (y_t + l + b) / 2,
    // b_t = (l_t - l_prev) / 4 + 3 b_prev / 4 — identical operand bits
    // give identical IEEE results in both engines, so the fold is
    // deterministic cross-engine with no integer scaling needed. The
    // recursion is inherently sequential per series, so it runs as a
    // row-local aggregate() fold over the (<=31-day) collected series
    // — the events_survival_km discipline; the data-sized work is one
    // map-side daily agg.
    "window_holt_linear" -> Query(
      (s, d) => {
        val ser = dailyCounts(s, d)
          .groupBy(col("event_type"))
          .agg(sort_array(collect_list(struct(col("di"), col("x")))).as("ds"))
          .filter(size(col("ds")) >= 2)
        val y = (i: Int) => element_at(col("ds"), i).getField("x").cast("double")
        val folded = aggregate(
          expr("slice(ds, 2, size(ds) - 1)"),
          struct(y(1).as("l"), (y(2) - y(1)).as("b")),
          (st, e) => {
            val lNew = (e.getField("x").cast("double") +
              st.getField("l") + st.getField("b")) / lit(2.0)
            struct(lNew.as("l"),
              ((lNew - st.getField("l")) / lit(4.0) +
                lit(3.0) * st.getField("b") / lit(4.0)).as("b"))
          })
        ser.select(col("event_type"), size(col("ds")).cast("long").as("n_days"),
            folded.getField("l").as("l"), folded.getField("b").as("b"))
          .select(col("event_type"), col("n_days"),
            round(col("l"), 6).as("level"), round(col("b"), 6).as("trend"),
            round(col("l") + lit(7.0) * col("b"), 6).as("fc7"))
      },
      Some(s"""WITH RECURSIVE daily AS ($dailySql),
             |t AS (SELECT event_type, di, x,
             |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY di) AS rn,
             |        COUNT(*) OVER (PARTITION BY event_type) AS n
             |      FROM daily),
             |r AS (
             |  SELECT t1.event_type, t1.rn,
             |    CAST(t1.x AS DOUBLE) AS l,
             |    CAST(t2.x AS DOUBLE) - CAST(t1.x AS DOUBLE) AS b
             |  FROM t t1 JOIN t t2 ON t2.event_type = t1.event_type AND t2.rn = 2
             |  WHERE t1.rn = 1 AND t1.n >= 2
             |  UNION ALL
             |  SELECT t.event_type, t.rn,
             |    (CAST(t.x AS DOUBLE) + r.l + r.b) / 2.0 AS l,
             |    ((CAST(t.x AS DOUBLE) + r.l + r.b) / 2.0 - r.l) / 4.0
             |      + 3.0 * r.b / 4.0 AS b
             |  FROM r JOIN t ON t.event_type = r.event_type AND t.rn = r.rn + 1)
             |SELECT r.event_type, CAST(mx.n AS BIGINT) AS n_days,
             |  ROUND(r.l, 6) AS level, ROUND(r.b, 6) AS trend,
             |  ROUND(r.l + 7.0 * r.b, 6) AS fc7
             |FROM r
             |JOIN (SELECT event_type, MAX(rn) AS n FROM t GROUP BY 1) mx
             |  ON mx.event_type = r.event_type AND mx.n = r.rn""".stripMargin)
    ),

    // Bot/burst detection — the traffic-hygiene gate run before any
    // behavioral analytics: per-user event volume, the hottest hour,
    // and the minimum inter-event gap (one partitioned window sort),
    // flagged against integer thresholds. All integer µs arithmetic.
    "events_bot_burst" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
          expr("(ts div 1000)").as("us"))
        val hourly = ev.groupBy(col("user_id"),
            expr("us div 3600000000").as("hr"))
          .agg(count(lit(1)).as("nh"))
          .groupBy(col("user_id")).agg(max(col("nh")).as("max_per_hour"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val gaps = ev.withColumn("gap", col("us") - lag(col("us"), 1).over(w))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), min(col("gap")).as("min_gap_us"))
        gaps.join(hourly, Seq("user_id"))
          .withColumn("is_bot",
            (col("max_per_hour") >= 3 || col("min_gap_us") < 60000000L).cast("long"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
             |h AS (SELECT user_id, MAX(nh) AS max_per_hour FROM (
             |        SELECT user_id, us // 3600000000 AS hr, COUNT(*) AS nh
             |        FROM e GROUP BY 1, 2) GROUP BY user_id),
             |g AS (SELECT user_id, COUNT(*) AS n_events,
             |        MIN(us - lus) AS min_gap_us
             |      FROM (SELECT user_id, us,
             |              lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS lus
             |            FROM e)
             |      GROUP BY user_id)
             |SELECT g.user_id, g.n_events, g.min_gap_us, h.max_per_hour,
             |  CAST(h.max_per_hour >= 3 OR g.min_gap_us < 60000000 AS BIGINT) AS is_bot
             |FROM g JOIN h USING (user_id)""".stripMargin)
    ),

    // SPATIAL distance join via grid blocking — the 2-D analog of the
    // LSH band join: bucket points into r-sized grid cells, replicate
    // the RIGHT side into its 3x3 cell neighborhood (a within-r pair
    // can differ by at most one cell per axis, so every true pair is
    // found exactly once and no pair is found twice), then one cell
    // equi-join + the exact distance filter. Candidates are O(n·k) for
    // local density k — the plan a geo/embedding-space radius query
    // runs at any scale; the naive all-pairs O(n²) never appears.
    "join_spatial_grid" -> Query(
      (s, d) => {
        val r = 0.04
        val p = Tables.embeddings(s, d).select(col("vec_id"),
          col("embedding").getItem(0).cast("double").as("x"),
          col("embedding").getItem(1).cast("double").as("y"))
          .withColumn("cx", floor(col("x") / r).cast("long"))
          .withColumn("cy", floor(col("y") / r).cast("long"))
        val a = p.select(col("vec_id").as("va"), col("x").as("xa"),
          col("y").as("ya"), col("cx"), col("cy"))
        val b = p.select(col("vec_id").as("vb"), col("x").as("xb"),
            col("y").as("yb"), col("cx").as("bcx"), col("cy").as("bcy"))
          .withColumn("dxy", explode(typedlit(
            for { dx <- Seq(-1L, 0L, 1L); dy <- Seq(-1L, 0L, 1L) } yield (dx, dy))))
          .select(col("vb"), col("xb"), col("yb"),
            (col("bcx") + col("dxy._1")).as("cx"),
            (col("bcy") + col("dxy._2")).as("cy"))
        val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb"))
        a.join(b, Seq("cx", "cy"))
          .filter(col("va") < col("vb") && d2 <= r * r)
          .select(col("va"), col("vb"), round(d2, 8).as("dist2"))
      },
      Some("""WITH p AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
             |                  CAST(embedding[2] AS DOUBLE) AS y
             |           FROM embeddings)
             |SELECT a.vec_id AS va, b.vec_id AS vb,
             |  ROUND((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y), 8) AS dist2
             |FROM p a JOIN p b ON a.vec_id < b.vec_id
             |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             |      <= 0.04 * 0.04""".stripMargin)
    ),

    // Conversion-latency distribution: first 'view' -> first LATER
    // 'purchase' per user, bucketed on integer µs thresholds (minute /
    // hour / day / week), with never-converters kept as a censored
    // bucket — the funnel-latency histogram growth teams watch. Two
    // grouped aggs + one join, all keyed on user_id; the conditional
    // min(when(p > v)) keeps censoring in the same pass as the join.
    "events_time_to_convert" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            expr("(ts div 1000)").as("us"))
        val firstView = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("us")).as("v"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("us").as("p"))
        firstView.join(purchases, Seq("user_id"), "left_outer")
          .groupBy(col("user_id"))
          .agg(min(when(col("p") > col("v"), col("p"))).as("fp"),
            first(col("v")).as("v"))
          .withColumn("delta_us", col("fp") - col("v"))
          .withColumn("bucket",
            when(col("delta_us").isNull, "never")
              .when(col("delta_us") < 60000000L, "lt_1m")
              .when(col("delta_us") < 3600000000L, "lt_1h")
              .when(col("delta_us") < 86400000000L, "lt_1d")
              .when(col("delta_us") < 604800000000L, "lt_7d")
              .otherwise("ge_7d"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_users"),
            min(col("delta_us")).as("min_us"),
            max(col("delta_us")).as("max_us"))
      },
      Some("""WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS v
             |           FROM events WHERE event_type = 'view' GROUP BY 1),
             |p AS (SELECT user_id, epoch_us(ts) AS p
             |      FROM events WHERE event_type = 'purchase'),
             |u AS (SELECT v.user_id,
             |        MIN(CASE WHEN p.p > v.v THEN p.p END) - v.v AS delta_us
             |      FROM v LEFT JOIN p ON v.user_id = p.user_id
             |      GROUP BY v.user_id, v.v),
             |b AS (SELECT CASE WHEN delta_us IS NULL THEN 'never'
             |               WHEN delta_us < 60000000 THEN 'lt_1m'
             |               WHEN delta_us < 3600000000 THEN 'lt_1h'
             |               WHEN delta_us < 86400000000 THEN 'lt_1d'
             |               WHEN delta_us < 604800000000 THEN 'lt_7d'
             |               ELSE 'ge_7d' END AS bucket, delta_us
             |      FROM u)
             |SELECT bucket, COUNT(*) AS n_users,
             |  MIN(delta_us) AS min_us, MAX(delta_us) AS max_us
             |FROM b GROUP BY bucket""".stripMargin)
    ),

    // Seasonal decomposition (day-of-week baseline + residual): daily
    // value totals per event type, a per-(type, weekday) seasonal mean
    // — the 7-row-per-type model a weekly-cycle metric needs — and the
    // residual that anomaly alerts threshold on. Two map-side-
    // combinable aggs; the seasonal model is O(types*7) and rides a
    // broadcast back onto the daily series, so the decomposition adds
    // ZERO data-sized shuffles beyond the daily rollup. All means from
    // exact decimal sums (identical operands -> identical residuals
    // cross-engine).
    "events_seasonal_decompose" -> Query(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("di"),
            col("value"))
          .groupBy(col("event_type"), col("di"))
          .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
          .withColumn("dow", ((col("di") + 4) % 7).cast("long"))
        val seas = daily.groupBy(col("event_type"), col("dow"))
          .agg((sum(col("v").cast("decimal(18,6)")).cast("double") / count(lit(1)))
            .as("m"))
        daily.join(broadcast(seas), Seq("event_type", "dow"))
          .select(col("event_type"), col("di"), col("dow"),
            round(col("v"), 4).as("v"),
            round(col("m"), 4).as("seasonal"),
            round(col("v") - col("m"), 4).as("residual"))
      },
      Some("""WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS di,
             |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
             |  FROM events GROUP BY 1, 2),
             |d2 AS (SELECT *, CAST((di + 4) % 7 AS BIGINT) AS dow FROM daily),
             |seas AS (SELECT event_type, dow,
             |    CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS m
             |  FROM d2 GROUP BY 1, 2)
             |SELECT d2.event_type, d2.di, d2.dow, ROUND(v, 4) AS v,
             |  ROUND(m, 4) AS seasonal, ROUND(v - m, 4) AS residual
             |FROM d2 JOIN seas ON d2.event_type = seas.event_type AND d2.dow = seas.dow""".stripMargin)
    ),

    // Sample-ratio-mismatch (SRM) check — the experiment-health gate
    // run BEFORE reading any A/B metric: units (distinct users) hash
    // into 4 equal-intent arms, and a chi-square against the 25%
    // expectation catches broken assignment/logging. The verdict flag
    // is INTEGER-exact (S = Σ(4·obs - n)² against a scaled critical
    // value, no float threshold edge); chi2 itself is emitted rounded
    // for reporting. One distinct + one 4-row agg; the 1-row summary
    // broadcasts back onto the arm rows.
    "events_ab_srm" -> Query(
      (s, d) => {
        val arm = expr(
          "cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint)") % 4
        val per = Tables.events(s, d)
          .select(col("user_id")).distinct()
          .select(concat(lit("arm"), arm.cast("string")).as("arm"))
          .groupBy(col("arm")).agg(count(lit(1)).as("n_units"))
        val withN = per.crossJoin(broadcast(per.agg(sum(col("n_units")).as("n"))))
        val tot = withN.agg(max(col("n")).as("n"),
          sum((col("n_units") * 4 - col("n")) * (col("n_units") * 4 - col("n")))
            .as("s4"))
        per.crossJoin(broadcast(tot))
          .select(col("arm"), col("n_units"),
            round(col("n").cast("double") / 4, 4).as("expected"),
            round(col("s4").cast("double") / (lit(4) * col("n")), 6).as("chi2"),
            when(col("s4") * 1000 > lit(45380L) * col("n"), 1L).otherwise(0L)
              .as("srm_flag"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |p AS (SELECT 'arm' || CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
             |                 AS BIGINT) % 4 AS VARCHAR) AS arm
             |      FROM u),
             |per AS (SELECT arm, COUNT(*) AS n_units FROM p GROUP BY 1),
             |tot AS (SELECT CAST(SUM(n_units) AS BIGINT) AS n,
             |    CAST(SUM((n_units * 4 - (SELECT SUM(n_units) FROM per)) *
             |             (n_units * 4 - (SELECT SUM(n_units) FROM per))) AS BIGINT) AS s4
             |  FROM per)
             |SELECT arm, n_units,
             |  ROUND(CAST(n AS DOUBLE) / 4, 4) AS expected,
             |  ROUND(CAST(s4 AS DOUBLE) / (4 * n), 6) AS chi2,
             |  CASE WHEN s4 * 1000 > 45380 * n THEN CAST(1 AS BIGINT)
             |       ELSE CAST(0 AS BIGINT) END AS srm_flag
             |FROM per CROSS JOIN tot""".stripMargin)
    ),

    // CUSUM change-point detection over the per-type daily series (Page
    // 1954). The textbook recurrence S_t = max(0, S_{t-1} + y_t) is
    // sequential, which SQL windows can't express — but it equals
    // c_t - min(0, min_{j<=t} c_j) where c is the plain cumulative sum,
    // so the whole detector is two windowed aggregates. Arithmetic is
    // INTEGER-exact end to end: the mean-zero residual y_t = n·x_t - Σx
    // is scaled by the day count n instead of dividing by it, and the
    // alarm rule (accumulated positive drift exceeds 10% of the period
    // total) compares drift·10 > n·Σx in BIGINT, no float threshold
    // edge. Per-type totals are a broadcast-able |types|-row table; the
    // windows partition by event_type, and the series length is bounded
    // by (types x days), not the event count — the same plan sweeps a
    // 100 TB log because the heavy groupBy is dailyCounts' map-side-
    // combinable agg.
    "events_cusum" -> Query(
      (s, d) => {
        val t = dailyCounts(s, d).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        dailyCounts(s, d).join(broadcast(t), Seq("event_type"))
          .withColumn("c", sum(col("n") * col("x") - col("sx")).over(w))
          .withColumn("drift", col("c") - least(lit(0L), min(col("c")).over(w)))
          .select(col("event_type"), col("di"), col("x"), col("drift"),
            when(col("drift") * 10 > col("n") * col("sx"), 1L).otherwise(0L)
              .as("alarm"))
      },
      Some(s"""WITH d AS ($dailySql),
             |t AS (SELECT event_type, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx
             |      FROM d GROUP BY 1),
             |c AS (SELECT d.event_type, d.di, d.x, t.n, t.sx,
             |        CAST(SUM(t.n * d.x - t.sx) OVER (PARTITION BY d.event_type ORDER BY d.di
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
             |      FROM d JOIN t USING (event_type)),
             |s AS (SELECT event_type, di, x, n, sx,
             |        c - LEAST(CAST(0 AS BIGINT), CAST(MIN(c) OVER (PARTITION BY event_type ORDER BY di
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)) AS drift
             |      FROM c)
             |SELECT event_type, di, x, drift,
             |  CASE WHEN drift * 10 > n * sx THEN CAST(1 AS BIGINT)
             |       ELSE CAST(0 AS BIGINT) END AS alarm
             |FROM s""".stripMargin)
    ),

    // CUPED variance-reduced A/B readout (Deng et al. 2013): adjust the
    // experiment metric with the pre-period covariate, Y' = Y - θ(X-X̄),
    // θ = cov(X,Y)/var(X) pooled across arms. Per-user X (pre-period
    // purchase value) and Y (post-period) are EXACT decimal sums; every
    // cross-user moment (ΣX, ΣY, ΣX², ΣY², ΣXY) stays decimal until the
    // 1-row summary, so θ, the adjusted means (via linearity:
    // mean(Y')_arm = mean(Y)_arm - θ(mean(X)_arm - X̄)), and the
    // variance-reduction ratio ρ² = cov²/(varX·varY) are identical IEEE
    // scalars cross-engine. The period split is the integer midpoint of
    // the observed µs range (broadcast 1-row agg). One shuffle on
    // user_id; the arm/global summaries are broadcast material.
    "events_ab_cuped" -> Query(
      (s, d) => {
        val p = graft.Caches.scoped(Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), expr("ts div 1000").as("tus"), col("value")))
        val mid = p.agg(expr("(min(tus) + max(tus)) div 2").as("mid"))
        val u = graft.Caches.scoped(p.crossJoin(broadcast(mid))
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("tus") < col("mid"), col("value")).otherwise(lit(0d))
              .cast("decimal(18,6)")).as("xv"),
            sum(when(col("tus") >= col("mid"), col("value")).otherwise(lit(0d))
              .cast("decimal(18,6)")).as("yv"))
          .withColumn("arm",
            when(expr("cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint)")
              % 2 === 0, "A").otherwise("B")))
        val g = u.agg(count(lit(1)).as("nn"),
          sum(col("xv")).cast("double").as("sx"),
          sum(col("yv")).cast("double").as("sy"),
          sum((col("xv") * col("xv")).cast("decimal(38,12)")).cast("double").as("sxx"),
          sum((col("yv") * col("yv")).cast("decimal(38,12)")).cast("double").as("syy"),
          sum((col("xv") * col("yv")).cast("decimal(38,12)")).cast("double").as("sxy"))
        val arms = u.groupBy(col("arm")).agg(count(lit(1)).as("n"),
          sum(col("xv")).cast("double").as("ax"),
          sum(col("yv")).cast("double").as("ay"))
        val a = arms.filter(col("arm") === "A")
          .select(col("n").as("n_a"), col("ax").as("ax_a"), col("ay").as("ay_a"))
        val b = arms.filter(col("arm") === "B")
          .select(col("n").as("n_b"), col("ax").as("ax_b"), col("ay").as("ay_b"))
        val theta = (col("sxy") - col("sx") * col("sy") / col("nn")) /
          (col("sxx") - col("sx") * col("sx") / col("nn"))
        val cupedA = col("ay_a") / col("n_a") -
          theta * (col("ax_a") / col("n_a") - col("sx") / col("nn"))
        val cupedB = col("ay_b") / col("n_b") -
          theta * (col("ax_b") / col("n_b") - col("sx") / col("nn"))
        val rho2 = (col("sxy") - col("sx") * col("sy") / col("nn")) *
          (col("sxy") - col("sx") * col("sy") / col("nn")) /
          ((col("sxx") - col("sx") * col("sx") / col("nn")) *
           (col("syy") - col("sy") * col("sy") / col("nn")))
        a.crossJoin(b).crossJoin(broadcast(g)).select(
          col("n_a"), col("n_b"),
          round(col("ay_a") / col("n_a"), 6).as("mean_a"),
          round(col("ay_b") / col("n_b"), 6).as("mean_b"),
          round(col("ay_b") / col("n_b") - col("ay_a") / col("n_a"), 6).as("lift"),
          round(cupedB - cupedA, 6).as("lift_cuped"),
          round(theta, 6).as("theta"),
          round(rho2 * 100, 4).as("var_reduction_pct"))
      },
      Some("""WITH p AS (SELECT user_id, epoch_us(ts) AS tus, "value" AS v
             |           FROM events WHERE event_type = 'purchase'),
             |mid AS (SELECT (MIN(tus) + MAX(tus)) // 2 AS mid FROM p),
             |u AS (SELECT user_id,
             |        SUM(CAST(CASE WHEN tus < mid THEN v ELSE 0 END AS DECIMAL(18,6))) AS xv,
             |        SUM(CAST(CASE WHEN tus >= mid THEN v ELSE 0 END AS DECIMAL(18,6))) AS yv,
             |        CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
             |                  AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm
             |      FROM p CROSS JOIN mid GROUP BY user_id),
             |g AS (SELECT COUNT(*) AS nn,
             |        CAST(SUM(xv) AS DOUBLE) AS sx, CAST(SUM(yv) AS DOUBLE) AS sy,
             |        CAST(SUM(CAST(xv * xv AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             |        CAST(SUM(CAST(yv * yv AS DECIMAL(38,12))) AS DOUBLE) AS syy,
             |        CAST(SUM(CAST(xv * yv AS DECIMAL(38,12))) AS DOUBLE) AS sxy
             |      FROM u),
             |arms AS (SELECT arm, COUNT(*) AS n,
             |        CAST(SUM(xv) AS DOUBLE) AS ax, CAST(SUM(yv) AS DOUBLE) AS ay
             |      FROM u GROUP BY arm),
             |j AS (SELECT a.n AS n_a, a.ax AS ax_a, a.ay AS ay_a,
             |             b.n AS n_b, b.ax AS ax_b, b.ay AS ay_b, g.*
             |      FROM arms a CROSS JOIN arms b CROSS JOIN g
             |      WHERE a.arm = 'A' AND b.arm = 'B')
             |SELECT n_a, n_b,
             |  ROUND(ay_a / n_a, 6) AS mean_a,
             |  ROUND(ay_b / n_b, 6) AS mean_b,
             |  ROUND(ay_b / n_b - ay_a / n_a, 6) AS lift,
             |  ROUND((ay_b / n_b - ((sxy - sx * sy / nn) / (sxx - sx * sx / nn)) * (ax_b / n_b - sx / nn))
             |      - (ay_a / n_a - ((sxy - sx * sy / nn) / (sxx - sx * sx / nn)) * (ax_a / n_a - sx / nn)), 6)
             |    AS lift_cuped,
             |  ROUND((sxy - sx * sy / nn) / (sxx - sx * sx / nn), 6) AS theta,
             |  ROUND((sxy - sx * sy / nn) * (sxy - sx * sy / nn)
             |      / ((sxx - sx * sx / nn) * (syy - sy * sy / nn)) * 100, 4) AS var_reduction_pct
             |FROM j""".stripMargin)
    ),

    // KAPLAN-MEIER survival curve (Kaplan & Meier 1958) over user
    // lifetimes: per user, lifetime = last event day - first event day;
    // users still active in the final 7 days of the corpus are CENSORED
    // (lost to follow-up), not deaths — the estimator's whole point.
    // The data-sized work is ONE map-side-combinable per-user min/max
    // agg; everything after runs on the <=31-row lifetime series (the
    // same "only summaries cross one partition" contract as
    // abc_pareto). S(t) = prod(1 - d/n) computed as exp(sum(ln)) with
    // integer d, n — identical operand bits both engines, rounded 4dp.
    "events_survival_km" -> Query(
      (s, d) => {
        val days = Tables.events(s, d)
          .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("di"))
        val users = days.groupBy(col("user_id"))
          .agg(min(col("di")).as("fd"), max(col("di")).as("ld"))
        val maxd = days.agg(max(col("di")).as("maxd"))
        val lab = users.crossJoin(broadcast(maxd))
          .select((col("ld") - col("fd")).as("t"),
            (col("ld") <= col("maxd") - 7).cast("long").as("died"))
        val byT = lab.groupBy(col("t"))
          .agg(sum(col("died")).as("n_death"),
            sum(lit(1L) - col("died")).as("n_censor"))
        // everything below is over the tiny per-lifetime series
        val wAll = Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val wPrev = Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wCum = Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, 0)
        byT
          .withColumn("n_risk",
            sum(col("n_death") + col("n_censor")).over(wAll)
              - coalesce(sum(col("n_death") + col("n_censor")).over(wPrev), lit(0L)))
          .withColumn("survival", round(exp(sum(
            log((col("n_risk") - col("n_death")).cast("double")
              / col("n_risk").cast("double"))).over(wCum)), 4))
          .select(col("t"), col("n_risk"), col("n_death"), col("n_censor"),
            col("survival"))
      },
      Some("""WITH dd AS (SELECT user_id, epoch_us(ts) // 86400000000 AS di FROM events),
             |u AS (SELECT user_id, MIN(di) AS fd, MAX(di) AS ld FROM dd GROUP BY 1),
             |mx AS (SELECT MAX(di) AS maxd FROM dd),
             |lab AS (SELECT ld - fd AS t,
             |          CAST(ld <= maxd - 7 AS BIGINT) AS died
             |        FROM u CROSS JOIN mx),
             |byt AS (SELECT t, CAST(SUM(died) AS BIGINT) AS n_death,
             |          CAST(SUM(1 - died) AS BIGINT) AS n_censor
             |        FROM lab GROUP BY 1),
             |r AS (SELECT t, n_death, n_censor,
             |        CAST(SUM(n_death + n_censor) OVER () -
             |          COALESCE(SUM(n_death + n_censor) OVER (ORDER BY t
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
             |      FROM byt)
             |SELECT t, n_risk, n_death, n_censor,
             |  ROUND(exp(SUM(ln(CAST(n_risk - n_death AS DOUBLE) / CAST(n_risk AS DOUBLE)))
             |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 4) AS survival
             |FROM r""".stripMargin)
    ),

    // COHORT LTV triangle — the revenue twin of events_retention: users
    // cohorted by first-seen WEEK, purchase revenue accumulated by
    // cohort age in weeks, reported as cumulative revenue per cohort
    // user (the curve growth/finance teams project forward). Revenue
    // sums are exact DECIMAL; the cumulative window runs over <=5 age
    // rows per cohort. Shuffles: per-user first-day agg + one
    // (cohort, age) rollup — both map-side-combinable.
    "events_cohort_ltv" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("value"),
            expr("(ts div 1000) div 86400000000").as("di"))
        val mind = ev.agg(min(col("di")).as("mind"))
        val first = ev.groupBy(col("user_id")).agg(min(col("di")).as("fd"))
        val sized = first.crossJoin(broadcast(mind))
          .select(col("user_id"), col("fd"),
            ((col("fd") - col("mind")) / 7).cast("long").as("cohort_week"))
        val cohortSize = sized.groupBy(col("cohort_week"))
          .agg(count(lit(1)).as("n_users"))
        val rev = ev.filter(col("event_type") === "purchase")
          .join(sized, Seq("user_id"))
          .groupBy(col("cohort_week"),
            ((col("di") - col("fd")) / 7).cast("long").as("age_week"))
          .agg(sum(col("value").cast("decimal(18,6)")).as("rev_d"))
        val wCum = Window.partitionBy(col("cohort_week")).orderBy(col("age_week"))
          .rowsBetween(Window.unboundedPreceding, 0)
        rev.withColumn("cum_d", sum(col("rev_d")).over(wCum))
          .join(broadcast(cohortSize), Seq("cohort_week"))
          .select(col("cohort_week"), col("age_week"), col("n_users"),
            col("rev_d").cast("double").as("week_rev"),
            col("cum_d").cast("double").as("cum_rev"),
            round(col("cum_d").cast("double") / col("n_users"), 4).as("ltv_per_user"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, "value" AS v,
             |              epoch_us(ts) // 86400000000 AS di FROM events),
             |mind AS (SELECT MIN(di) AS mind FROM ev),
             |f AS (SELECT user_id, MIN(di) AS fd FROM ev GROUP BY 1),
             |sized AS (SELECT user_id, fd, (fd - mind) // 7 AS cohort_week
             |          FROM f CROSS JOIN mind),
             |cs AS (SELECT cohort_week, COUNT(*) AS n_users FROM sized GROUP BY 1),
             |rev AS (SELECT sized.cohort_week, (ev.di - sized.fd) // 7 AS age_week,
             |          SUM(CAST(ev.v AS DECIMAL(18,6))) AS rev_d
             |        FROM ev JOIN sized USING (user_id)
             |        WHERE ev.event_type = 'purchase' GROUP BY 1, 2),
             |cum AS (SELECT cohort_week, age_week, rev_d,
             |          SUM(rev_d) OVER (PARTITION BY cohort_week ORDER BY age_week
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_d
             |        FROM rev)
             |SELECT cum.cohort_week, cum.age_week, cs.n_users,
             |  CAST(rev_d AS DOUBLE) AS week_rev,
             |  CAST(cum_d AS DOUBLE) AS cum_rev,
             |  ROUND(CAST(cum_d AS DOUBLE) / cs.n_users, 4) AS ltv_per_user
             |FROM cum JOIN cs USING (cohort_week)""".stripMargin)
    ),

    // STATIONARY DISTRIBUTION of the user-behavior Markov chain: the
    // long-run fraction of time a user spends in each event state,
    // estimated by 2 power iterations over the transition matrix (the
    // events_transitions artifact), all arithmetic in scaled integers
    // (quantum 1e-12, the graph_pagerank discipline) so both engines
    // agree bit-for-bit with no float threshold edge. The data-sized
    // work is the per-user lead() window + one (src, dst) count agg;
    // the chain itself is O(|event types|^2) rows and rides broadcasts.
    "events_markov_stationary" -> Query(
      (s, d) => {
        val Q = 1000000000000L
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val trans = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("src"))
          .withColumn("dst", lead(col("src"), 1).over(w))
          .filter(col("dst").isNotNull)
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("nij"))
        val outTot = trans.groupBy(col("src")).agg(sum(col("nij")).as("ni"))
        val states = outTot.select(col("src").as("state"))
        val n = states.count()
        var pi = states.select(col("state"), lit(Q / n).as("r"))
        (1 to 2).foreach { _ =>
          val contrib = pi.join(outTot, col("state") === col("src"))
            .join(trans, Seq("src"))
            .select(col("dst"), expr("r * nij div ni").as("c"))
          pi = states.join(
              contrib.groupBy(col("dst")).agg(sum(col("c")).as("rn")),
              col("state") === col("dst"), "left_outer")
            .select(col("state"), coalesce(col("rn"), lit(0L)).as("r"))
        }
        pi.select(col("state"), col("r").as("pi_q"))
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type AS src,
             |            LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
             |          FROM events),
             |tr AS (SELECT src, dst, COUNT(*) AS nij FROM e WHERE dst IS NOT NULL GROUP BY 1, 2),
             |ot AS (SELECT src, SUM(nij) AS ni FROM tr GROUP BY 1),
             |st AS (SELECT src AS state FROM ot),
             |k AS (SELECT 1000000000000 // COUNT(*) AS r0 FROM st),
             |p1 AS (SELECT st.state,
             |         COALESCE((SELECT SUM(k.r0 * tr.nij // ot.ni)
             |                   FROM tr JOIN ot USING (src) CROSS JOIN k
             |                   WHERE tr.dst = st.state), 0) AS r
             |       FROM st),
             |p2 AS (SELECT st.state,
             |         COALESCE((SELECT SUM(p1.r * tr.nij // ot.ni)
             |                   FROM tr JOIN ot USING (src) JOIN p1 ON p1.state = tr.src
             |                   WHERE tr.dst = st.state), 0) AS r
             |       FROM st)
             |SELECT state, CAST(r AS BIGINT) AS pi_q FROM p2""".stripMargin)
    ),

    // AUDIENCE OVERLAP matrix — Jaccard of distinct-user sets for every
    // event-type pair: the segmentation readout (which behaviors share
    // an audience, which are disjoint funnels). One distinct
    // (type, user) projection, a self-equi-join on user_id (the only
    // shuffle that scales with data; the |types|^2 rollup is constant),
    // and integer-bp Jaccard from exact distinct counts.
    "events_audience_overlap" -> Query(
      (s, d) => {
        val u = graft.Caches.scoped(Tables.events(s, d)
          .select(col("event_type"), col("user_id")).distinct())
        val nt = u.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        val inter = u.as("a")
          .join(u.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(broadcast(nt.select(col("event_type").as("type_a"), col("n").as("n_a"))), Seq("type_a"))
          .join(broadcast(nt.select(col("event_type").as("type_b"), col("n").as("n_b"))), Seq("type_b"))
          .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("inter"),
            expr("inter * 10000 div (n_a + n_b - inter)").as("jaccard_bp"))
      },
      Some("""WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
             |nt AS (SELECT event_type, COUNT(*) AS n FROM u GROUP BY 1),
             |iv AS (SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS inter
             |       FROM u a JOIN u b
             |         ON a.user_id = b.user_id AND a.event_type < b.event_type
             |       GROUP BY 1, 2)
             |SELECT type_a, type_b, na.n AS n_a, nb.n AS n_b, inter,
             |  CAST(inter * 10000 // (na.n + nb.n - inter) AS BIGINT) AS jaccard_bp
             |FROM iv JOIN nt na ON na.event_type = type_a
             |        JOIN nt nb ON nb.event_type = type_b""".stripMargin)
    ),

    // MARKOV ENTROPY RATE of the user journey — the one-number
    // predictability score of the whole behavior graph (how many
    // nats the NEXT action carries given the current one): H =
    // -sum_i pi_i sum_j p_ij ln p_ij over the transition matrix,
    // with pi the 2-step power-iteration stationary vector that
    // events_markov_stationary pins (integer quantum 1e-12) and every
    // ln argument an exact integer count (ln c_ij - ln n_i). Per-row
    // terms are identical IEEE doubles both engines, summed in
    // DECIMAL(26,12); the matrix is |types|^2 — driver-free, constant
    // size regardless of event volume.
    "events_entropy_rate" -> Query(
      (s, d) => {
        val Q = 1000000000000L
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val trans = graft.Caches.scoped(Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("src"))
          .withColumn("dst", lead(col("src"), 1).over(w))
          .filter(col("dst").isNotNull)
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("nij")))
        val outTot = trans.groupBy(col("src")).agg(sum(col("nij")).as("ni"))
        val states = outTot.select(col("src").as("state"))
        val n = states.count()
        var pi = states.select(col("state"), lit(Q / n).as("r"))
        (1 to 2).foreach { _ =>
          val contrib = pi.join(outTot, col("state") === col("src"))
            .join(trans, Seq("src"))
            .select(col("dst"), expr("r * nij div ni").as("c"))
          pi = states.join(
              contrib.groupBy(col("dst")).agg(sum(col("c")).as("rn")),
              col("state") === col("dst"), "left_outer")
            .select(col("state"), coalesce(col("rn"), lit(0L)).as("r"))
        }
        trans.join(outTot, Seq("src"))
          .join(broadcast(pi), col("src") === col("state"))
          .agg(count(lit(1)).as("n_trans_cells"),
            sum((col("r").cast("double") * col("nij").cast("double") *
                (log(col("nij").cast("double")) - log(col("ni").cast("double")))
                / col("ni").cast("double"))
              .cast("decimal(26,12)")).as("t"))
          .select(col("n_trans_cells"),
            round(-col("t").cast("double") / lit(Q.toDouble), 4).as("entropy_rate"))
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type AS src,
             |            LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
             |          FROM events),
             |tr AS (SELECT src, dst, COUNT(*) AS nij FROM e WHERE dst IS NOT NULL GROUP BY 1, 2),
             |ot AS (SELECT src, SUM(nij) AS ni FROM tr GROUP BY 1),
             |st AS (SELECT src AS state FROM ot),
             |k AS (SELECT 1000000000000 // COUNT(*) AS r0 FROM st),
             |p1 AS (SELECT st.state,
             |         COALESCE((SELECT SUM(k.r0 * tr.nij // ot.ni)
             |                   FROM tr JOIN ot USING (src) CROSS JOIN k
             |                   WHERE tr.dst = st.state), 0) AS r
             |       FROM st),
             |p2 AS (SELECT st.state,
             |         COALESCE((SELECT SUM(p1.r * tr.nij // ot.ni)
             |                   FROM tr JOIN ot USING (src) JOIN p1 ON p1.state = tr.src
             |                   WHERE tr.dst = st.state), 0) AS r
             |       FROM st)
             |SELECT COUNT(*) AS n_trans_cells,
             |  ROUND(-CAST(SUM(CAST(
             |      CAST(p2.r AS DOUBLE) * CAST(tr.nij AS DOUBLE) *
             |        (ln(CAST(tr.nij AS DOUBLE)) - ln(CAST(ot.ni AS DOUBLE)))
             |        / CAST(ot.ni AS DOUBLE)
             |    AS DECIMAL(26,12))) AS DOUBLE) / 1000000000000.0, 4) AS entropy_rate
             |FROM tr JOIN ot USING (src) JOIN p2 ON p2.state = tr.src""".stripMargin)
    ),

    // BEHAVIORAL ENTROPY per user: Shannon entropy of the user's
    // event-type distribution — the one-number signal separating
    // single-purpose accounts and scripted bots (entropy -> 0) from
    // organic browse-click-buy mixes. H = ln(n) - (sum c*ln c)/n keeps
    // every ln argument an exact integer count; the weighted sum rides
    // DECIMAL(18,12) so partial-agg order can't move an ulp. One
    // map-side-combinable (user, type) agg + one per-user rollup.
    "events_behavior_entropy" -> Query(
      (s, d) => {
        val c = Tables.events(s, d)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("c"))
        c.groupBy(col("user_id"))
          .agg(sum(col("c")).as("n_events"),
            count(lit(1)).as("n_types"),
            sum((col("c").cast("double") * log(col("c").cast("double")))
              .cast("decimal(18,12)")).as("sclnc"))
          .select(col("user_id"), col("n_events"), col("n_types"),
            round(log(col("n_events").cast("double"))
              - col("sclnc").cast("double") / col("n_events"), 4).as("entropy"))
      },
      Some("""WITH c AS (SELECT user_id, event_type, COUNT(*) AS c
             |           FROM events GROUP BY 1, 2)
             |SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
             |  COUNT(*) AS n_types,
             |  ROUND(ln(CAST(SUM(c) AS DOUBLE))
             |    - CAST(SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(18,12))) AS DOUBLE)
             |      / SUM(c), 4) AS entropy
             |FROM c GROUP BY user_id""".stripMargin)
    ),

    // OHLC BARS — the canonical time-series downsample (open/high/low/
    // close + volume) per (event type, day): the shape every metrics
    // store and trading system reduces ticks into. Open/close are
    // first/last in (ts, event_id) order via two row_number frames
    // inside ONE partition sort (no self-join); high/low/volume are
    // plain map-side aggs; turnover sums exact DECIMAL. Raw value
    // doubles pass through untouched so the bars hash-check exactly.
    "window_ohlc" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("value"), col("ts"), col("event_id"),
            expr("(ts div 1000) div 86400000000").as("di"))
        val wA = Window.partitionBy(col("event_type"), col("di"))
          .orderBy(col("ts"), col("event_id"))
        val wD = Window.partitionBy(col("event_type"), col("di"))
          .orderBy(col("ts").desc, col("event_id").desc)
        ev.withColumn("rna", row_number().over(wA))
          .withColumn("rnd", row_number().over(wD))
          .groupBy(col("event_type"), col("di").as("day"))
          .agg(
            max(when(col("rna") === 1, col("value"))).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max(when(col("rnd") === 1, col("value"))).as("close"),
            count(lit(1)).as("volume"),
            graft.Parity.dsum(col("value")).as("turnover"))
      },
      Some("""WITH ev AS (SELECT event_type, "value" AS v, ts, event_id,
             |             epoch_us(ts) // 86400000000 AS di FROM events),
             |r AS (SELECT event_type, di, v,
             |        ROW_NUMBER() OVER (PARTITION BY event_type, di ORDER BY ts, event_id) AS rna,
             |        ROW_NUMBER() OVER (PARTITION BY event_type, di ORDER BY ts DESC, event_id DESC) AS rnd
             |      FROM ev)
             |SELECT event_type, di AS day,
             |  MAX(CASE WHEN rna = 1 THEN v END) AS open,
             |  MAX(v) AS high, MIN(v) AS low,
             |  MAX(CASE WHEN rnd = 1 THEN v END) AS close,
             |  COUNT(*) AS volume,
             |  CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS turnover
             |FROM r GROUP BY 1, 2""".stripMargin)
    ),

    // MOVING-AVERAGE CROSSOVER signals over the daily series — the
    // classic trend-change detector (golden/death cross at MA3 vs MA7
    // grain): a cross fires when the sign of MA3 − MA7 flips. The
    // float-free trick: 7·sum3 vs 3·sum7 compares the SAME quantity in
    // pure integers, so signal days hash-check exactly. One partition
    // sort per event type serves both frames and the lag.
    "window_ma_crossover" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        val daily = dailyCounts(s, d)
          .withColumn("rn", row_number().over(w))
          .withColumn("sum3", sum(col("x")).over(w.rowsBetween(-2, 0)))
          .withColumn("sum7", sum(col("x")).over(w.rowsBetween(-6, 0)))
          .withColumn("diff", col("sum3") * 7 - col("sum7") * 3)
          .withColumn("prev_diff", lag(col("diff"), 1).over(w))
          .filter(col("rn") >= 8)
        daily.select(col("event_type"), col("di"), col("sum3"), col("sum7"),
          col("diff"),
          (col("prev_diff") <= 0 && col("diff") > 0).cast("long").as("cross_up"),
          (col("prev_diff") >= 0 && col("diff") < 0).cast("long").as("cross_down"))
      },
      Some(s"""WITH daily AS ($dailySql),
             |r AS (SELECT event_type, di, x,
             |        ROW_NUMBER() OVER w AS rn,
             |        SUM(x) OVER (PARTITION BY event_type ORDER BY di
             |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sum3,
             |        SUM(x) OVER (PARTITION BY event_type ORDER BY di
             |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sum7
             |      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY di)),
             |dd AS (SELECT event_type, di, rn,
             |         CAST(sum3 AS BIGINT) AS sum3, CAST(sum7 AS BIGINT) AS sum7,
             |         CAST(sum3 * 7 - sum7 * 3 AS BIGINT) AS diff,
             |         LAG(CAST(sum3 * 7 - sum7 * 3 AS BIGINT)) OVER
             |           (PARTITION BY event_type ORDER BY di) AS prev_diff
             |       FROM r)
             |SELECT event_type, di, sum3, sum7, diff,
             |  CAST(prev_diff <= 0 AND diff > 0 AS BIGINT) AS cross_up,
             |  CAST(prev_diff >= 0 AND diff < 0 AS BIGINT) AS cross_down
             |FROM dd WHERE rn >= 8""".stripMargin)
    ),

    // INTER-ARRIVAL statistics per event type — the traffic-model
    // fingerprint (Poisson-ness, burstiness, dead air) capacity
    // planning and anomaly baselines start from: consecutive-event
    // gaps in integer microseconds from one lag over the per-type
    // sort, then min/mean/max + the coefficient-of-variation numerator
    // in exact integers (mean via integer div; cv as a 4dp-rounded
    // double from DECIMAL power sums).
    "events_inter_arrival" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("us"), col("event_id"))
        val gaps = Tables.events(s, d)
          .select(col("event_type"), col("event_id"), expr("(ts div 1000)").as("us"))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
          .filter(col("gap").isNotNull)
        gaps.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_gaps"),
            min(col("gap")).as("min_gap_us"),
            max(col("gap")).as("max_gap_us"),
            expr("sum(gap) div count(1)").as("mean_gap_us"),
            sum(col("gap")).as("s1"),
            sum((col("gap").cast("double") * col("gap"))
              .cast("decimal(38,6)")).as("s2"))
          .select(col("event_type"), col("n_gaps"), col("min_gap_us"),
            col("max_gap_us"), col("mean_gap_us"),
            round(sqrt(greatest(col("s2").cast("double") / col("n_gaps")
                - (col("s1").cast("double") / col("n_gaps"))
                  * (col("s1").cast("double") / col("n_gaps")), lit(0.0)))
              / (col("s1").cast("double") / col("n_gaps")), 4).as("cv"))
      },
      Some("""WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us FROM events),
             |g AS (SELECT event_type,
             |        us - LAG(us) OVER (PARTITION BY event_type ORDER BY us, event_id) AS gap
             |      FROM e)
             |SELECT event_type, COUNT(*) AS n_gaps,
             |  MIN(gap) AS min_gap_us, MAX(gap) AS max_gap_us,
             |  CAST(SUM(gap) // COUNT(*) AS BIGINT) AS mean_gap_us,
             |  ROUND(sqrt(GREATEST(
             |      CAST(SUM(CAST(CAST(gap AS DOUBLE) * gap AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
             |        - (CAST(SUM(gap) AS DOUBLE) / COUNT(*)) * (CAST(SUM(gap) AS DOUBLE) / COUNT(*)),
             |      CAST(0 AS DOUBLE)))
             |    / (CAST(SUM(gap) AS DOUBLE) / COUNT(*)), 4) AS cv
             |FROM g WHERE gap IS NOT NULL
             |GROUP BY event_type""".stripMargin)
    ),

    // BENFORD first-digit audit over order totals — the classic
    // fabricated-numbers screen: organic multi-scale amounts follow
    // log10(1+1/d); injected or capped values don't. First digit by
    // integer string ops on exact cents; the expected Benford shares
    // are LITERAL integer basis points (3010, 1761, ...), so observed
    // share, expected share, and deviation are all integer — the audit
    // verdict hash-checks with no float anywhere.
    "agg_benford" -> Query(
      (s, d) => {
        val benfordBp = Seq(3010L, 1761L, 1249L, 969L, 792L, 669L, 580L, 512L, 458L)
        val cents = floor(col("o_totalprice").cast("double") * 100 + 0.5).cast("long")
        val digits = Tables.orders(s, d)
          .select(substring(cents.cast("string"), 1, 1).cast("long").as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        val tot = digits.agg(sum(col("n")).as("tot"))
        val exp = benfordBp.zipWithIndex
          .map { case (bp, i) => struct(lit(i + 1L).as("digit"), lit(bp).as("benford_bp")) }
        val expTable = s.range(1)
          .select(explode(array(exp: _*)).as("e"))
          .select(col("e.digit").as("digit"), col("e.benford_bp").as("benford_bp"))
        digits.crossJoin(broadcast(tot))
          .join(broadcast(expTable), Seq("digit"))
          .select(col("digit"), col("n"),
            expr("n * 10000 div tot").as("share_bp"), col("benford_bp"),
            abs(expr("n * 10000 div tot") - col("benford_bp")).as("dev_bp"))
      },
      Some("""WITH c AS (SELECT CAST(substr(CAST(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
             |          FROM orders),
             |g AS (SELECT digit, COUNT(*) AS n FROM c GROUP BY 1),
             |t AS (SELECT SUM(n) AS tot FROM g),
             |e AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS digit,
             |             unnest([3010,1761,1249,969,792,669,580,512,458]) AS benford_bp)
             |SELECT g.digit, g.n,
             |  CAST(g.n * 10000 // t.tot AS BIGINT) AS share_bp,
             |  CAST(e.benford_bp AS BIGINT) AS benford_bp,
             |  CAST(abs(g.n * 10000 // t.tot - e.benford_bp) AS BIGINT) AS dev_bp
             |FROM g JOIN e USING (digit) CROSS JOIN t""".stripMargin)
    ),

    // LAG-k AUTOCORRELATION of the daily series (k = 1 and 7) — the
    // time-series diagnostic that separates trending (high r1),
    // weekly-seasonal (high r7), and white-noise metrics before any
    // forecasting model is chosen. Pearson over (x_t, x_{t−k}) pairs
    // from exact integer count sums; both engines run the identical
    // IEEE arithmetic on those integers, rounded 4dp. One partition
    // sort per type serves both lags.
    "events_autocorr" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        def corrCols(k: Int) = {
          val xl = lag(col("x"), k).over(w)
          struct(col("x").as("x"), xl.as("y"))
        }
        val lagged = dailyCounts(s, d)
          .withColumn("p1", corrCols(1)).withColumn("p7", corrCols(7))
        def pearson(p: Column): Column = {
          val n = sum(when(p.getField("y").isNotNull, 1L))
          val sx = sum(when(p.getField("y").isNotNull, p.getField("x")))
          val sy = sum(p.getField("y"))
          val sxx = sum(when(p.getField("y").isNotNull,
            p.getField("x") * p.getField("x")))
          val syy = sum(p.getField("y") * p.getField("y"))
          val sxy = sum(p.getField("x") * p.getField("y"))
          round((n.cast("double") * sxy - sx.cast("double") * sy)
            / (sqrt(n.cast("double") * sxx - sx.cast("double") * sx)
              * sqrt(n.cast("double") * syy - sy.cast("double") * sy)), 4)
        }
        lagged.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            pearson(col("p1")).as("r1"), pearson(col("p7")).as("r7"))
      },
      Some(s"""WITH daily AS ($dailySql),
             |l AS (SELECT event_type, x,
             |        LAG(x, 1) OVER w AS y1, LAG(x, 7) OVER w AS y7
             |      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY di))
             |SELECT event_type, COUNT(*) AS n_days,
             |  ROUND((CAST(SUM(CASE WHEN y1 IS NOT NULL THEN 1 END) AS DOUBLE) * SUM(x * y1)
             |      - CAST(SUM(CASE WHEN y1 IS NOT NULL THEN x END) AS DOUBLE) * SUM(y1))
             |    / (sqrt(CAST(SUM(CASE WHEN y1 IS NOT NULL THEN 1 END) AS DOUBLE) * SUM(CASE WHEN y1 IS NOT NULL THEN x * x END)
             |          - CAST(SUM(CASE WHEN y1 IS NOT NULL THEN x END) AS DOUBLE) * SUM(CASE WHEN y1 IS NOT NULL THEN x END))
             |     * sqrt(CAST(SUM(CASE WHEN y1 IS NOT NULL THEN 1 END) AS DOUBLE) * SUM(y1 * y1)
             |          - CAST(SUM(y1) AS DOUBLE) * SUM(y1))), 4) AS r1,
             |  ROUND((CAST(SUM(CASE WHEN y7 IS NOT NULL THEN 1 END) AS DOUBLE) * SUM(x * y7)
             |      - CAST(SUM(CASE WHEN y7 IS NOT NULL THEN x END) AS DOUBLE) * SUM(y7))
             |    / (sqrt(CAST(SUM(CASE WHEN y7 IS NOT NULL THEN 1 END) AS DOUBLE) * SUM(CASE WHEN y7 IS NOT NULL THEN x * x END)
             |          - CAST(SUM(CASE WHEN y7 IS NOT NULL THEN x END) AS DOUBLE) * SUM(CASE WHEN y7 IS NOT NULL THEN x END))
             |     * sqrt(CAST(SUM(CASE WHEN y7 IS NOT NULL THEN 1 END) AS DOUBLE) * SUM(y7 * y7)
             |          - CAST(SUM(y7) AS DOUBLE) * SUM(y7))), 4) AS r7
             |FROM l GROUP BY event_type""".stripMargin)
    ),

    // BOLLINGER-BAND breakouts on the daily series — the volatility-
    // scaled anomaly gate (vs the fixed-sigma zscore detector): day t
    // is a breakout when |x − MA7| > 2σ7. The float-free rewrite keeps
    // the whole test in integers: (7x − sum7)² > 4·(7·sumsq7 − sum7²),
    // so breakout days hash-check exactly with no sqrt and no float
    // threshold edge. One partition sort serves both rolling sums.
    // THEIL INDEX of customer revenue within each market segment — the
    // decomposable inequality measure (pairs with agg_gini: Theil adds
    // the entropy form that splits into within/between-group terms).
    // T = (1/S) * sum x*(ln(x*n) - ln(S)) with x = customer cents:
    // both ln args are exact INTEGER products (the text_source_kl
    // discipline), the weighted sum rides DECIMAL(26,12), and only the
    // final division is floating, rounded 4dp. One orders rollup + a
    // broadcast per-segment total.
    "agg_theil" -> Query(
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))
        val x = Tables.orders(s, d)
          .select(col("o_custkey"),
            (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
          .groupBy(col("o_custkey")).agg(sum(col("cents")).as("x"))
          .join(cust, col("o_custkey") === col("c_custkey"))
        val seg = x.groupBy(col("c_mktsegment").as("seg"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
        x.join(broadcast(seg), col("c_mktsegment") === col("seg"))
          .groupBy(col("c_mktsegment"), col("n"), col("s"))
          .agg(sum((col("x").cast("double") *
              (log((col("x") * col("n")).cast("double"))
                - log(col("s").cast("double"))))
            .cast("decimal(26,12)")).as("t"))
          .select(col("c_mktsegment"), col("n").as("n_customers"),
            col("s").as("total_cents"),
            round(col("t").cast("double") / col("s"), 4).as("theil"))
      },
      Some("""WITH x AS (SELECT o_custkey,
             |        SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS x
             |      FROM orders GROUP BY 1),
             |j AS (SELECT c_mktsegment, CAST(x.x AS BIGINT) AS x
             |      FROM x JOIN customer ON o_custkey = c_custkey),
             |sg AS (SELECT c_mktsegment, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s
             |       FROM j GROUP BY 1)
             |SELECT j.c_mktsegment, sg.n AS n_customers, sg.s AS total_cents,
             |  ROUND(CAST(SUM(CAST(CAST(j.x AS DOUBLE) *
             |      (ln(CAST(j.x * sg.n AS DOUBLE)) - ln(CAST(sg.s AS DOUBLE)))
             |    AS DECIMAL(26,12))) AS DOUBLE) / sg.s, 4) AS theil
             |FROM j JOIN sg USING (c_mktsegment)
             |GROUP BY 1, 2, 3""".stripMargin)
    ),

    // REPEAT-PURCHASE COHORTS — the acquisition-quality readout:
    // customers grouped by first-order month, with ever-repeat and
    // repeat-within-90-days rates per cohort (the retention curve's
    // first point, on the orders fact rather than the event log — the
    // events_retention twin for transactional data). First/second
    // order dates come from one row_number window per customer;
    // cohort keys and rates are pure integers (yyyymm, day diffs,
    // basis points). One shuffle on o_custkey + a tiny cohort rollup.
    "orders_repeat_cohort" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val f = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
          .withColumn("rn", row_number().over(w))
          .groupBy(col("o_custkey"))
          .agg(min(when(col("rn") === 1, col("o_orderdate"))).as("d1"),
            min(when(col("rn") === 2, col("o_orderdate"))).as("d2"),
            count(lit(1)).as("n"))
        f.select((year(col("d1")) * 100 + month(col("d1"))).cast("long").as("cohort_ym"),
            (col("n") >= 2).cast("long").as("rep"),
            (col("d2").isNotNull && datediff(col("d2"), col("d1")) <= 90)
              .cast("long").as("rep90"))
          .groupBy(col("cohort_ym"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("rep")).as("n_repeat"), sum(col("rep90")).as("n_repeat_90d"))
          .select(col("cohort_ym"), col("n_customers"), col("n_repeat"),
            expr("n_repeat * 10000 div n_customers").as("repeat_bp"),
            col("n_repeat_90d"),
            expr("n_repeat_90d * 10000 div n_customers").as("repeat90_bp"))
      },
      Some("""WITH o AS (SELECT o_custkey, o_orderdate,
             |        ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                           ORDER BY o_orderdate, o_orderkey) AS rn
             |      FROM orders),
             |f AS (SELECT o_custkey,
             |        MIN(CASE WHEN rn = 1 THEN o_orderdate END) AS d1,
             |        MIN(CASE WHEN rn = 2 THEN o_orderdate END) AS d2,
             |        COUNT(*) AS n
             |      FROM o GROUP BY 1),
             |c AS (SELECT CAST(year(d1) * 100 + month(d1) AS BIGINT) AS cohort_ym,
             |        CASE WHEN n >= 2 THEN 1 ELSE 0 END AS rep,
             |        CASE WHEN d2 IS NOT NULL AND date_diff('day', d1, d2) <= 90
             |             THEN 1 ELSE 0 END AS rep90
             |      FROM f)
             |SELECT cohort_ym, COUNT(*) AS n_customers,
             |  CAST(SUM(rep) AS BIGINT) AS n_repeat,
             |  CAST(SUM(rep) * 10000 // COUNT(*) AS BIGINT) AS repeat_bp,
             |  CAST(SUM(rep90) AS BIGINT) AS n_repeat_90d,
             |  CAST(SUM(rep90) * 10000 // COUNT(*) AS BIGINT) AS repeat90_bp
             |FROM c GROUP BY 1""".stripMargin)
    ),

    // UPTIME / SLA profile per event type — the pipeline-health view a
    // feed operator reads first: observed span, days with activity,
    // uptime share in basis points, and the longest silent gap. All
    // integer day arithmetic over the daily series (one lag window on
    // a per-type series that is tiny regardless of corpus size — the
    // heavy lifting is the map-side-combinable daily rollup).
    "events_uptime_sla" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        dailyCounts(s, d)
          .withColumn("gap",
            greatest(coalesce(col("di") - lag(col("di"), 1).over(w) - 1, lit(0L)),
              lit(0L)))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("active_days"),
            (max(col("di")) - min(col("di")) + 1).as("span_days"),
            max(col("gap")).as("longest_gap"))
          .select(col("event_type"), col("active_days"), col("span_days"),
            expr("active_days * 10000 div span_days").as("uptime_bp"),
            col("longest_gap"))
      },
      Some(s"""WITH daily AS ($dailySql),
             |g AS (SELECT event_type, di,
             |        greatest(COALESCE(di - LAG(di, 1) OVER (PARTITION BY event_type ORDER BY di) - 1, 0), 0) AS gap
             |      FROM daily)
             |SELECT event_type, COUNT(*) AS active_days,
             |  MAX(di) - MIN(di) + 1 AS span_days,
             |  CAST(COUNT(*) * 10000 // (MAX(di) - MIN(di) + 1) AS BIGINT) AS uptime_bp,
             |  MAX(gap) AS longest_gap
             |FROM g GROUP BY 1""".stripMargin)
    ),

    // RSI(14) on the daily series — Cutler's simple-average variant
    // (the Wilder EMA form is recursive; the SMA form is the standard
    // window rewrite): gains and losses are INTEGER day-over-day count
    // deltas, the 14-day sums ride a rows-frame window, and the index
    // is reported in basis points by integer division — no float
    // anywhere. rn >= 15 guarantees all 14 deltas in frame are non-null
    // (full lookback), nullif guards the flat-series 0/0. One shuffle
    // on event_type; the frame walks each tiny daily series in order.
    "window_rsi" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        val w14 = w.rowsBetween(-13, 0)
        dailyCounts(s, d)
          .withColumn("dx", col("x") - lag(col("x"), 1).over(w))
          .withColumn("rn", row_number().over(w))
          .withColumn("sg", sum(greatest(col("dx"), lit(0L))).over(w14))
          .withColumn("sl", sum(greatest(-col("dx"), lit(0L))).over(w14))
          .filter(col("rn") >= 15)
          .select(col("event_type"), col("di"),
            expr("sg * 10000 div nullif(sg + sl, 0)").as("rsi_bp"))
      },
      Some(s"""WITH daily AS ($dailySql),
             |l AS (SELECT event_type, di, x - LAG(x, 1) OVER w AS dx,
             |        ROW_NUMBER() OVER w AS rn
             |      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY di)),
             |g AS (SELECT event_type, di, rn,
             |        SUM(greatest(dx, 0)) OVER w14 AS sg,
             |        SUM(greatest(-dx, 0)) OVER w14 AS sl
             |      FROM l WINDOW w14 AS (PARTITION BY event_type ORDER BY di
             |                            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
             |SELECT event_type, di,
             |  CAST(sg * 10000 // nullif(sg + sl, 0) AS BIGINT) AS rsi_bp
             |FROM g WHERE rn >= 15""".stripMargin)
    ),

    // HOUR x DAY-OF-WEEK traffic profile — the capacity-planning /
    // anomaly-baseline heatmap (which cells carry the load, where the
    // quiet windows for maintenance are). Bucket arithmetic is pure
    // integer on epoch micros (epoch day 0 = Thursday, so dow =
    // (day+4) % 7 with 0=Sunday, both engines literal); counts and
    // the share ride one 168-cell map-side-combinable agg plus a
    // broadcast total — a plan that is scan-bound at any corpus size.
    "events_hour_dow_profile" -> Query(
      (s, d) => {
        val g = Tables.events(s, d)
          .select(expr("((ts div 1000) div 86400000000 + 4) % 7").as("dow"),
            expr("((ts div 1000) div 3600000000) % 24").as("hour"),
            col("user_id"))
          .groupBy(col("dow"), col("hour"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
        val tot = g.agg(sum(col("n_events")).as("tot"))
        g.crossJoin(broadcast(tot))
          .select(col("dow"), col("hour"), col("n_events"), col("n_users"),
            expr("n_events * 10000 div tot").as("share_bp"))
      },
      Some("""WITH b AS (SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
             |                  (epoch_us(ts) // 3600000000) % 24 AS hour, user_id
             |            FROM events),
             |g AS (SELECT dow, hour, COUNT(*) AS n_events,
             |        COUNT(DISTINCT user_id) AS n_users
             |      FROM b GROUP BY 1, 2),
             |t AS (SELECT SUM(n_events) AS tot FROM g)
             |SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
             |  n_events, n_users,
             |  CAST(n_events * 10000 // t.tot AS BIGINT) AS share_bp
             |FROM g CROSS JOIN t""".stripMargin)
    ),

    "window_bollinger" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        dailyCounts(s, d)
          .withColumn("rn", row_number().over(w))
          .withColumn("sum7", sum(col("x")).over(w.rowsBetween(-6, 0)))
          .withColumn("sumsq7", sum(col("x") * col("x")).over(w.rowsBetween(-6, 0)))
          .filter(col("rn") >= 7)
          .select(col("event_type"), col("di"), col("x"), col("sum7"), col("sumsq7"),
            ((col("x") * 7 - col("sum7")) * (col("x") * 7 - col("sum7"))
              > (col("sumsq7") * 7 - col("sum7") * col("sum7")) * 4)
              .cast("long").as("breakout"))
      },
      Some(s"""WITH daily AS ($dailySql),
             |r AS (SELECT event_type, di, x,
             |        ROW_NUMBER() OVER w AS rn,
             |        CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY di
             |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum7,
             |        CAST(SUM(x * x) OVER (PARTITION BY event_type ORDER BY di
             |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS sumsq7
             |      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY di))
             |SELECT event_type, di, x, sum7, sumsq7,
             |  CAST((x * 7 - sum7) * (x * 7 - sum7)
             |       > (sumsq7 * 7 - sum7 * sum7) * 4 AS BIGINT) AS breakout
             |FROM r WHERE rn >= 7""".stripMargin)
    ),

    // CONVERSION-RATE confidence intervals (Wilson score, the interval
    // that behaves at small n and extreme p): per event type, the
    // daily-active-user conversion to purchase with 95% Wilson bounds.
    // Counts are exact integers; the interval arithmetic is identical
    // IEEE from those integers on both engines, rounded 6dp. One
    // distinct-user agg per side + a broadcast join.
    "events_conversion_ci" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d)
        val base = ev.filter(col("event_type") === "view")
          .agg(countDistinct(col("user_id")).as("n_base"))
        val conv = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_conv"))
        val z2 = 3.8416 // 1.96^2
        conv.crossJoin(broadcast(base))
          .filter(col("event_type") =!= "view")
          .select(col("event_type"), col("n_conv"), col("n_base"))
          .withColumn("p", col("n_conv").cast("double") / col("n_base"))
          .withColumn("den", lit(1.0) + lit(z2) / col("n_base"))
          .withColumn("ctr", (col("p") + lit(z2) / (col("n_base") * 2)) / col("den"))
          .withColumn("hw",
            (lit(1.96) * sqrt(col("p") * (lit(1.0) - col("p")) / col("n_base")
              + lit(z2) / (col("n_base") * col("n_base") * 4))) / col("den"))
          .select(col("event_type"), col("n_conv"), col("n_base"),
            round(col("p"), 6).as("rate"),
            round(col("ctr") - col("hw"), 6).as("wilson_lo"),
            round(col("ctr") + col("hw"), 6).as("wilson_hi"))
      },
      Some("""WITH base AS (SELECT COUNT(DISTINCT user_id) AS n_base
             |              FROM events WHERE event_type = 'view'),
             |conv AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_conv
             |         FROM events GROUP BY 1),
             |j AS (SELECT event_type, n_conv, n_base,
             |        CAST(n_conv AS DOUBLE) / n_base AS p
             |      FROM conv CROSS JOIN base WHERE event_type <> 'view'),
             |k AS (SELECT event_type, n_conv, n_base, p,
             |        1.0 + 3.8416 / n_base AS den,
             |        (p + 3.8416 / (n_base * 2)) AS ctrn,
             |        1.96 * sqrt(p * (1.0 - p) / n_base
             |          + 3.8416 / (CAST(n_base AS BIGINT) * n_base * 4)) AS hwn
             |      FROM j)
             |SELECT event_type, n_conv, n_base,
             |  ROUND(p, 6) AS rate,
             |  ROUND(ctrn / den - hwn / den, 6) AS wilson_lo,
             |  ROUND(ctrn / den + hwn / den, 6) AS wilson_hi
             |FROM k""".stripMargin)
    ),

    // ORDER BACKLOG curve — work-in-progress over time: an order opens
    // at o_orderdate and closes when its LAST lineitem ships; backlog
    // on day t = cumulative opens − cumulative closes. The data-sized
    // work is one per-order max-shipdate agg + two day-grain rollups;
    // the running difference walks only the bounded calendar series
    // (the events_running_distinct contract: windows over day series,
    // never over rows). Pure integer day arithmetic.
    "orders_backlog" -> Query(
      (s, d) => {
        val closes = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(max(datediff(to_date(col("l_shipdate")), lit("1970-01-01")))
            .cast("long").as("cd"))
        val opens = Tables.orders(s, d)
          .select(col("o_orderkey"),
            datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
              .cast("long").as("od"))
          .join(closes, Seq("o_orderkey"))
        val byOpen = opens.groupBy(col("od").as("day")).agg(count(lit(1)).as("n_opened"))
        val byClose = opens.groupBy(col("cd").as("day")).agg(count(lit(1)).as("n_closed"))
        val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
        byOpen.join(byClose, Seq("day"), "full_outer")
          .select(col("day"),
            coalesce(col("n_opened"), lit(0L)).as("n_opened"),
            coalesce(col("n_closed"), lit(0L)).as("n_closed"))
          .withColumn("backlog",
            sum(col("n_opened") - col("n_closed")).over(w))
      },
      Some("""WITH cl AS (SELECT l_orderkey AS o_orderkey,
             |              MAX(CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)) AS cd
             |            FROM lineitem GROUP BY 1),
             |op AS (SELECT o.o_orderkey,
             |         CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS od, cl.cd
             |       FROM orders o JOIN cl USING (o_orderkey)),
             |d1 AS (SELECT od AS day, COUNT(*) AS n_opened FROM op GROUP BY 1),
             |d2 AS (SELECT cd AS day, COUNT(*) AS n_closed FROM op GROUP BY 1),
             |dd AS (SELECT COALESCE(d1.day, d2.day) AS day,
             |         COALESCE(d1.n_opened, 0) AS n_opened,
             |         COALESCE(d2.n_closed, 0) AS n_closed
             |       FROM d1 FULL OUTER JOIN d2 ON d1.day = d2.day)
             |SELECT day, n_opened, n_closed,
             |  CAST(SUM(n_opened - n_closed) OVER (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
             |FROM dd""".stripMargin)
    ),

    // UP/DOWN STREAKS of the daily volume series per event type — the
    // gaps-and-islands run-length readout ("7 straight days of growth")
    // a trend monitor alerts on. Group ids come from the classic
    // cumulative-resets trick (sum of NOT-up over the ordered days), so
    // the whole thing is two windows + two rollups over the tiny daily
    // series — integer-only, per-type partitions, day count bounded by
    // the calendar regardless of event volume.
    "events_streaks" -> Query(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("di"))
          .groupBy(col("event_type"), col("di")).agg(count(lit(1)).as("c"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        val dir = daily
          .withColumn("delta", col("c") - lag(col("c"), 1).over(w))
          .filter(col("delta").isNotNull)
          .withColumn("up", (col("delta") > 0).cast("long"))
          .withColumn("dn", (col("delta") < 0).cast("long"))
          .withColumn("grp_up", sum(lit(1) - col("up")).over(w))
          .withColumn("grp_dn", sum(lit(1) - col("dn")).over(w))
        val ups = dir.filter(col("up") === 1)
          .groupBy(col("event_type"), col("grp_up")).agg(count(lit(1)).as("len"))
          .groupBy(col("event_type")).agg(max(col("len")).as("max_up_streak"))
        val dns = dir.filter(col("dn") === 1)
          .groupBy(col("event_type"), col("grp_dn")).agg(count(lit(1)).as("len"))
          .groupBy(col("event_type")).agg(max(col("len")).as("max_down_streak"))
        dir.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_deltas"), sum(col("up")).as("n_up_days"),
            sum(col("dn")).as("n_down_days"))
          .join(ups, Seq("event_type"), "left_outer")
          .join(dns, Seq("event_type"), "left_outer")
          .select(col("event_type"), col("n_deltas"),
            col("n_up_days"), col("n_down_days"),
            coalesce(col("max_up_streak"), lit(0L)).as("max_up_streak"),
            coalesce(col("max_down_streak"), lit(0L)).as("max_down_streak"))
      },
      Some("""WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS di, COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |dir AS (SELECT event_type, di,
             |          c - LAG(c) OVER (PARTITION BY event_type ORDER BY di) AS delta
             |        FROM daily),
             |f AS (SELECT event_type, di, CAST(delta > 0 AS BIGINT) AS up,
             |        CAST(delta < 0 AS BIGINT) AS dn
             |      FROM dir WHERE delta IS NOT NULL),
             |g AS (SELECT event_type, up, dn,
             |        SUM(1 - up) OVER (PARTITION BY event_type ORDER BY di) AS grp_up,
             |        SUM(1 - dn) OVER (PARTITION BY event_type ORDER BY di) AS grp_dn
             |      FROM f),
             |us AS (SELECT event_type, MAX(len) AS max_up_streak FROM (
             |        SELECT event_type, grp_up, COUNT(*) AS len FROM g
             |        WHERE up = 1 GROUP BY 1, 2) GROUP BY 1),
             |ds AS (SELECT event_type, MAX(len) AS max_down_streak FROM (
             |        SELECT event_type, grp_dn, COUNT(*) AS len FROM g
             |        WHERE dn = 1 GROUP BY 1, 2) GROUP BY 1),
             |b AS (SELECT event_type, COUNT(*) AS n_deltas,
             |        CAST(SUM(up) AS BIGINT) AS n_up_days,
             |        CAST(SUM(dn) AS BIGINT) AS n_down_days
             |      FROM f GROUP BY 1)
             |SELECT b.event_type, b.n_deltas, b.n_up_days, b.n_down_days,
             |  CAST(COALESCE(us.max_up_streak, 0) AS BIGINT) AS max_up_streak,
             |  CAST(COALESCE(ds.max_down_streak, 0) AS BIGINT) AS max_down_streak
             |FROM b LEFT JOIN us ON us.event_type = b.event_type
             |       LEFT JOIN ds ON ds.event_type = b.event_type""".stripMargin)
    ),

    // CUMULATIVE VWAP per event type — the volume-weighted benchmark
    // price (here: value weighted by the props.k quantity) every
    // execution-quality report compares fills against. Quantities come
    // off the JSON props via the native from_json path; the weighted
    // turnover accumulates as exact DECIMAL, and only the final
    // ratio-of-cumulatives floats (both operands bit-identical, 4dp).
    // One daily partial agg + a per-type cumulative window over the
    // calendar-bounded daily series.
    "window_vwap" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"),
            expr("(ts div 1000) div 86400000000").as("di"),
            col("value"),
            expr("from_json(props, 'k INT').k").cast("long").as("vol"))
        val daily = ev.groupBy(col("event_type"), col("di"))
          .agg(sum((col("value") * col("vol")).cast("decimal(26,6)")).as("pv"),
            sum(col("vol")).as("vv"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        daily
          .withColumn("cum_pv", sum(col("pv")).over(w))
          .withColumn("cum_v", sum(col("vv")).over(w))
          .select(col("event_type"), col("di").as("day"), col("vv").as("volume"),
            round(col("cum_pv").cast("double") / col("cum_v").cast("double"), 4)
              .as("vwap"))
      },
      Some("""WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS di, "value" AS v,
             |        CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS vol
             |      FROM events),
             |daily AS (SELECT event_type, di,
             |            SUM(CAST(v * vol AS DECIMAL(26,6))) AS pv, SUM(vol) AS vv
             |          FROM ev GROUP BY 1, 2),
             |c AS (SELECT event_type, di, vv,
             |        SUM(pv) OVER (PARTITION BY event_type ORDER BY di) AS cum_pv,
             |        SUM(vv) OVER (PARTITION BY event_type ORDER BY di) AS cum_v
             |      FROM daily)
             |SELECT event_type, di AS day, CAST(vv AS BIGINT) AS volume,
             |  ROUND(CAST(cum_pv AS DOUBLE) / CAST(cum_v AS DOUBLE), 4) AS vwap
             |FROM c""".stripMargin)
    ),

    // REACTIVATION monitor — users returning after >= 14 silent days,
    // per day: the win-back readout that separates real growth from
    // resurrection in a DAU curve. One distinct (user, day) projection,
    // a lag window along each user's own day series (shuffles once on
    // user_id; per-user rows are calendar-bounded), then a per-day
    // rollup with integer-bp shares.
    "events_reactivation" -> Query(
      (s, d) => {
        val ud = Tables.events(s, d)
          .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("di"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("di"))
        ud.withColumn("gap", col("di") - lag(col("di"), 1).over(w))
          .groupBy(col("di").as("day"))
          .agg(count(lit(1)).as("n_active"),
            sum((col("gap") >= 14).cast("long")).as("n_reactivated"),
            sum(col("gap").isNull.cast("long")).as("n_new"))
          .select(col("day"), col("n_active"), col("n_reactivated"), col("n_new"),
            expr("n_reactivated * 10000 div n_active").as("react_bp"))
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS di FROM events),
             |g AS (SELECT user_id, di,
             |        di - LAG(di) OVER (PARTITION BY user_id ORDER BY di) AS gap
             |      FROM ud)
             |SELECT di AS day, COUNT(*) AS n_active,
             |  CAST(SUM(CAST(gap >= 14 AS BIGINT)) AS BIGINT) AS n_reactivated,
             |  CAST(SUM(CAST(gap IS NULL AS BIGINT)) AS BIGINT) AS n_new,
             |  CAST(SUM(CAST(gap >= 14 AS BIGINT)) * 10000 // COUNT(*) AS BIGINT) AS react_bp
             |FROM g GROUP BY 1""".stripMargin)
    ),

    // TYPE-PAIR CORRELATION MATRIX of the daily volume series — which
    // behaviors move together day over day (shared driver) and which
    // anti-correlate (cannibalization): Pearson over the per-day count
    // pairs, every sum an exact integer (counts), only the final r
    // floats (6dp, the events_autocorr discipline). The matrix is
    // |types|^2 over the calendar-bounded daily series — constant work
    // regardless of event volume; only days where BOTH types fired
    // enter a pair (inner join on day).
    "events_type_corr_matrix" -> Query(
      (s, d) => {
        val daily = graft.Caches.scoped(Tables.events(s, d)
          .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("di"))
          .groupBy(col("event_type"), col("di")).agg(count(lit(1)).as("c")))
        daily.as("a")
          .join(daily.as("b"),
            col("a.di") === col("b.di") &&
              col("a.event_type") < col("b.event_type"))
          .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
            col("a.c").as("x"), col("b.c").as("y"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
            sum(col("x") * col("y")).as("sxy"))
          .select(col("type_a"), col("type_b"), col("n_days"),
            round((col("n_days").cast("double") * col("sxy")
              - col("sx").cast("double") * col("sy"))
              / (sqrt(col("n_days").cast("double") * col("sxx")
                  - col("sx").cast("double") * col("sx"))
                * sqrt(col("n_days").cast("double") * col("syy")
                  - col("sy").cast("double") * col("sy"))), 6).as("corr"))
      },
      Some("""WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS di, COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             |        a.c AS x, b.c AS y
             |      FROM daily a JOIN daily b
             |        ON a.di = b.di AND a.event_type < b.event_type),
             |m AS (SELECT type_a, type_b, COUNT(*) AS n_days,
             |        SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx,
             |        SUM(y*y) AS syy, SUM(x*y) AS sxy
             |      FROM p GROUP BY 1, 2)
             |SELECT type_a, type_b, n_days,
             |  ROUND((CAST(n_days AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |    / (sqrt(CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             |     * sqrt(CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS corr
             |FROM m""".stripMargin)
    ),

    // LEAD-LAG detection: events_type_corr_matrix extended over shifted
    // day axes — for every type pair, Pearson r at every lag in [-7, 7]
    // days, then the best lag by |r| (rounded-6 compare, smaller lag
    // breaks ties deterministically). "logins lead purchases by 2 days"
    // is the causal-ordering signal the lag-0 matrix can't see. Shape:
    // day-grain aggregates fan out 15x via a broadcast lag spine, one
    // equi-join on the shifted day, a partial-aggregatable rollup, and
    // a window over |types|^2 * 15 summary rows — corpus size only
    // enters through the first daily rollup.
    "events_lead_lag" -> Query(
      (s, d) => {
        val dc = graft.Caches.scoped(dailyCounts(s, d))
        val lagsDf = s.range(1)
          .select(explode(sequence(lit(-7), lit(7))).as("lag"))
          .select(col("lag").cast("long").as("lag"))
        val a = dc.select(col("event_type").as("ta"), col("di"), col("x").as("xa"))
          .crossJoin(broadcast(lagsDf))
          .withColumn("jd", col("di") + col("lag"))
        val b = dc.select(col("event_type").as("tb"), col("di").as("jd"),
          col("x").as("xb"))
        val g = a.join(b, Seq("jd")).filter(col("ta") < col("tb"))
          .groupBy(col("ta"), col("tb"), col("lag"))
          .agg(count(lit(1)).as("n"), sum(col("xa")).as("sx"), sum(col("xb")).as("sy"),
            sum(col("xa") * col("xb")).as("sxy"),
            sum(col("xa") * col("xa")).as("sxx"),
            sum(col("xb") * col("xb")).as("syy"))
        val r = g
          .withColumn("den",
            sqrt(col("n").cast("double") * col("sxx")
              - col("sx").cast("double") * col("sx"))
              * sqrt(col("n").cast("double") * col("syy")
                - col("sy").cast("double") * col("sy")))
          .withColumn("r",
            when(col("den") > 0,
              round((col("n").cast("double") * col("sxy")
                - col("sx").cast("double") * col("sy")) / col("den"), 6)))
          .filter(col("n") >= 8 && col("r").isNotNull)
        val w = Window.partitionBy(col("ta"), col("tb"))
          .orderBy(abs(col("r")).desc, col("lag"))
        r.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("ta"), col("tb"), col("lag").as("best_lag"), col("r"),
            col("n").as("n_days"))
      },
      Some(s"""WITH dc AS ($dailySql),
             |l AS (SELECT unnest(generate_series(-7, 7)) AS lag),
             |j AS (SELECT a.event_type AS ta, b.event_type AS tb, l.lag,
             |        a.x AS xa, b.x AS xb
             |      FROM dc a CROSS JOIN l
             |      JOIN dc b ON b.di = a.di + l.lag AND a.event_type < b.event_type),
             |g AS (SELECT ta, tb, lag, COUNT(*) AS n, SUM(xa) AS sx, SUM(xb) AS sy,
             |        SUM(xa*xb) AS sxy, SUM(xa*xa) AS sxx, SUM(xb*xb) AS syy
             |      FROM j GROUP BY 1, 2, 3),
             |r AS (SELECT ta, tb, lag, n,
             |        ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |          / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             |           * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS r
             |      FROM g
             |      WHERE n >= 8
             |        AND sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             |          * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0),
             |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY ta, tb
             |         ORDER BY abs(r) DESC, lag) AS rn FROM r)
             |SELECT ta, tb, CAST(lag AS BIGINT) AS best_lag, r,
             |  CAST(n AS BIGINT) AS n_days
             |FROM rk WHERE rn = 1""".stripMargin)
    ),

    // DISTRIBUTION-DRIFT monitor: weekly event-type mix vs the overall
    // corpus mix as a chi-square statistic per ISO-ish week (µs-epoch
    // day // 7) — the standard feed-health gate catching a source whose
    // type distribution shifts. exp = week_total * type_share_overall;
    // each (obs-exp)^2/exp term is computed identically both engines
    // then summed as DECIMAL(28,12) (exact, order-independent) before
    // the terminal round. Three partial-aggregatable count rollups and
    // a broadcast-size join of |weeks|x|types| summaries.
    "events_dist_drift" -> Query(
      (s, d) => {
        val wc = Tables.events(s, d)
          .select(col("event_type"),
            expr("((ts div 1000) div 86400000000) div 7").as("wk"))
          .groupBy(col("wk"), col("event_type")).agg(count(lit(1)).as("obs"))
        val wt = wc.groupBy(col("wk")).agg(sum(col("obs")).as("wtot"))
        val ct = wc.groupBy(col("event_type")).agg(sum(col("obs")).as("ctot"))
        val tot = ct.agg(sum(col("ctot")).as("tot"))
        val term = wc.join(wt, Seq("wk")).join(broadcast(ct), Seq("event_type"))
          .crossJoin(broadcast(tot))
          .withColumn("exp",
            col("wtot").cast("double") * col("ctot") / col("tot"))
          .withColumn("term",
            ((col("obs") - col("exp")) * (col("obs") - col("exp")) / col("exp"))
              .cast("decimal(28,12)"))
        term.groupBy(col("wk"))
          .agg(max(col("wtot")).as("week_total"),
            round(sum(col("term")).cast("double"), 4).as("chi2"))
          .withColumn("drifted", (col("chi2") > 21.67).cast("long"))
      },
      Some("""WITH wc AS (SELECT event_type,
             |    (epoch_us(ts) // 86400000000) // 7 AS wk, COUNT(*) AS obs
             |  FROM events GROUP BY 1, 2),
             |wt AS (SELECT wk, SUM(obs) AS wtot FROM wc GROUP BY 1),
             |ct AS (SELECT event_type, SUM(obs) AS ctot FROM wc GROUP BY 1),
             |tot AS (SELECT SUM(ctot) AS tot FROM ct),
             |base AS (SELECT wc.wk, wt.wtot, wc.obs,
             |    CAST(wt.wtot AS DOUBLE) * ct.ctot / tot.tot AS exp
             |  FROM wc JOIN wt USING (wk) JOIN ct USING (event_type) CROSS JOIN tot),
             |term AS (SELECT wk, wtot,
             |    CAST((obs - exp) * (obs - exp) / exp AS DECIMAL(28,12)) AS term
             |  FROM base),
             |g AS (SELECT wk, MAX(wtot) AS week_total,
             |        ROUND(CAST(SUM(term) AS DOUBLE), 4) AS chi2
             |      FROM term GROUP BY 1)
             |SELECT wk, CAST(week_total AS BIGINT) AS week_total, chi2,
             |  CAST(chi2 > 21.67 AS BIGINT) AS drifted
             |FROM g""".stripMargin)
    ),

    // GROUPED OLS: quantity-on-discount regression per part brand
    // (slope/intercept/r2) — the price-elasticity screen a merchandising
    // warehouse runs per SKU family. Inputs quantized to exact integers
    // (quantity integral; discount in whole percent via floor(x*100+.5))
    // so all five sufficient statistics are exact BIGINT sums from ONE
    // map-side-combinable aggregation; floats appear only in the three
    // terminal rounded formulas, written identically both engines.
    "agg_ols_slope" -> Query(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_partkey"),
          floor(col("l_quantity") + 0.5).cast("long").as("qk"),
          floor(col("l_discount") * 100 + 0.5).cast("long").as("dk"))
        val j = li.join(
          Tables.part(s, d).select(col("p_partkey").as("l_partkey"), col("p_brand")),
          Seq("l_partkey"))
        val g = j.groupBy(col("p_brand")).agg(count(lit(1)).as("n"),
          sum(col("dk")).as("sx"), sum(col("qk")).as("sy"),
          sum(col("dk") * col("qk")).as("sxy"),
          sum(col("dk") * col("dk")).as("sxx"),
          sum(col("qk") * col("qk")).as("syy"))
        val dx = (col("n").cast("double") * col("sxx")) -
          (col("sx").cast("double") * col("sx"))
        val dy = (col("n").cast("double") * col("syy")) -
          (col("sy").cast("double") * col("sy"))
        val cov = (col("n").cast("double") * col("sxy")) -
          (col("sx").cast("double") * col("sy"))
        g.filter(col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
            col("n") * col("syy") - col("sy") * col("sy") > 0)
          .select(col("p_brand"), col("n"),
            round(cov / dx, 6).as("slope"),
            round((col("sy").cast("double") - (cov / dx) * col("sx")) / col("n"), 6)
              .as("intercept"),
            round(cov * cov / (dx * dy), 6).as("r2"))
      },
      Some("""WITH q AS (SELECT l_partkey,
             |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS qk,
             |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dk
             |  FROM lineitem),
             |g AS (SELECT p.p_brand, COUNT(*) AS n, SUM(dk) AS sx, SUM(qk) AS sy,
             |        SUM(dk*qk) AS sxy, SUM(dk*dk) AS sxx, SUM(qk*qk) AS syy
             |      FROM q JOIN part p ON p.p_partkey = q.l_partkey
             |      GROUP BY 1)
             |SELECT p_brand, n,
             |  ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS slope,
             |  ROUND((CAST(sy AS DOUBLE)
             |      - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)
             |    / n, 6) AS intercept,
             |  ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |      * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |    / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             |     * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS r2
             |FROM g
             |WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0""".stripMargin)
    ),

    // MONTH-OF-YEAR seasonality index: each calendar month's share of
    // revenue vs a flat-year baseline (index 10000 = exactly average) —
    // the demand-planning staple. Money stays integer cents; the index
    // is one integer cross-multiplication, so the whole op is exact.
    // One map-side-combinable 12-group aggregation.
    "orders_month_seasonality" -> Query(
      (s, d) => {
        val o = Tables.orders(s, d).select(
          month(col("o_orderdate")).cast("long").as("m"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        val g = o.groupBy(col("m"))
          .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev_c"))
        val tot = g.agg(sum(col("rev_c")).as("tot"))
        g.crossJoin(broadcast(tot))
          .select(col("m"), col("n_orders"), col("rev_c"),
            expr("rev_c * 120000 div tot").as("season_idx_bp"))
      },
      Some("""WITH o AS (SELECT CAST(month(o_orderdate) AS BIGINT) AS m,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders),
             |g AS (SELECT m, COUNT(*) AS n_orders, SUM(cents) AS rev_c FROM o GROUP BY 1),
             |tot AS (SELECT SUM(rev_c) AS tot FROM g)
             |SELECT m, n_orders, CAST(rev_c AS BIGINT) AS rev_c,
             |  CAST(rev_c * 120000 // tot AS BIGINT) AS season_idx_bp
             |FROM g CROSS JOIN tot""".stripMargin)
    )
  )
}
