package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 analytics wave: lifecycle (churn, RFM migration), change
  * detection (Page-Hinkley), experiment planning (power analysis), and
  * two market-style rolling indicators (stochastic oscillator, ATR).
  *
  * Scale shapes: every data-sized shuffle keys on user_id or
  * (event_type, day); windows partition by event_type over the
  * types x days series (bounded by the calendar, not the event count);
  * cross-user scalars ride 1-row broadcasts. Arithmetic is integer/
  * decimal-exact everywhere a float edge could flip a verdict.
  */
object Analytics2 {

  private def dailyCounts(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("di"))
      .groupBy(col("event_type"), col("di")).agg(count(lit(1)).as("x"))

  private val dailySql =
    """SELECT event_type, epoch_us(ts) // 86400000000 AS di, COUNT(*) AS x
      |FROM events GROUP BY 1, 2""".stripMargin

  val entries: Seq[(String, Query)] = Seq(

    // MONTHLY CHURN / RETENTION: per 30-day bucket, how many of the
    // previous bucket's active users came back. The active set is one
    // distinct on (user, month); retention is a self equi-join on
    // (user, month+1) — both shuffle on the user key, so the plan is
    // two user-keyed exchanges regardless of event volume. All rates
    // integer basis points.
    "events_churn" -> Query(
      (s, d) => {
        val am = graft.Caches.scoped(Tables.events(s, d)
          .select(col("user_id"),
            expr("(ts div 1000) div 2592000000000").as("mi"))
          .distinct())
        val act = am.groupBy(col("mi")).agg(count(lit(1)).as("active"))
        val ret = am.join(
            am.select(col("user_id"), (col("mi") + 1).as("mi")),
            Seq("user_id", "mi"))
          .groupBy(col("mi")).agg(count(lit(1)).as("retained"))
        act.join(act.select((col("mi") + 1).as("mi"),
            col("active").as("active_prev")), Seq("mi"))
          .join(ret, Seq("mi"), "left")
          .select(col("mi"), col("active"), col("active_prev"),
            coalesce(col("retained"), lit(0L)).as("retained"),
            (col("active_prev") - coalesce(col("retained"), lit(0L)))
              .as("churned"),
            (col("active") - coalesce(col("retained"), lit(0L)))
              .as("new_users"),
            expr("coalesce(retained, 0) * 10000 div active_prev")
              .as("retention_bp"))
      },
      Some("""WITH am AS (SELECT DISTINCT user_id,
             |    epoch_us(ts) // 2592000000000 AS mi FROM events),
             |act AS (SELECT mi, COUNT(*) AS active FROM am GROUP BY 1),
             |ret AS (SELECT a.mi, COUNT(*) AS retained
             |        FROM am a JOIN am p ON p.user_id = a.user_id
             |          AND p.mi = a.mi - 1
             |        GROUP BY 1)
             |SELECT act.mi, CAST(act.active AS BIGINT) AS active,
             |  CAST(prev.active AS BIGINT) AS active_prev,
             |  CAST(COALESCE(retained, 0) AS BIGINT) AS retained,
             |  CAST(prev.active - COALESCE(retained, 0) AS BIGINT) AS churned,
             |  CAST(act.active - COALESCE(retained, 0) AS BIGINT) AS new_users,
             |  CAST(COALESCE(retained, 0) * 10000 // prev.active AS BIGINT)
             |    AS retention_bp
             |FROM act JOIN act prev ON prev.mi = act.mi - 1
             |LEFT JOIN ret ON ret.mi = act.mi""".stripMargin)
    ),

    // A/B TEST POWER ANALYSIS: the pre-experiment sample-size readout —
    // users needed per arm to detect a +2pp lift at alpha=.05
    // (two-sided) with 80% power. The baseline proportion is the share
    // of purchasers buying more than the per-user average (compared by
    // integer cross-multiplication, and never degenerate at 0 or 1 the
    // way raw did-they-purchase is). One user-keyed shuffle, then 1-row
    // broadcast scalars; IEEE sqrt is correctly rounded, so the doubles
    // match cross-engine bit for bit.
    "events_ab_power" -> Query(
      (s, d) => {
        val pc = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        val t = pc.agg(count(lit(1)).as("n_users"), sum(col("c")).as("tot"))
        val g = pc.crossJoin(broadcast(t)).agg(
          max(col("n_users")).as("n_users"),
          sum(when(col("c") * col("n_users") > col("tot"), 1L).otherwise(0L))
            .as("converters"))
        val p1 = col("converters").cast("double") / col("n_users").cast("double")
        val p2 = p1 + lit(0.02)
        val pbar = (p1 + p2) / 2
        val num = lit(1.959963984540054) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar)) +
          lit(0.8416212335729143) * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
        val nArm = ceil(num * num / lit(0.0004)).cast("long")
        g.select(col("n_users"), col("converters"),
          round(p1, 6).as("baseline_p"),
          nArm.as("n_per_arm"), (nArm * 2).as("n_total"),
          (col("n_users") >= nArm * 2).cast("long").as("feasible"))
      },
      Some("""WITH pc AS (SELECT user_id, COUNT(*) AS c FROM events
             |  WHERE event_type = 'purchase' GROUP BY 1),
             |t AS (SELECT COUNT(*) AS n_users, SUM(c) AS tot FROM pc),
             |g AS (SELECT MAX(n_users) AS n_users,
             |    SUM(CASE WHEN c * n_users > tot THEN 1 ELSE 0 END) AS converters
             |  FROM pc CROSS JOIN t),
             |f AS (SELECT n_users, converters,
             |    CAST(converters AS DOUBLE) / CAST(n_users AS DOUBLE) AS p1
             |  FROM g),
             |n AS (SELECT n_users, converters, p1,
             |    CAST(ceil(
             |      pow(1.959963984540054
             |            * sqrt(2.0 * ((p1 + p1 + 0.02) / 2) * (1.0 - (p1 + p1 + 0.02) / 2))
             |          + 0.8416212335729143
             |            * sqrt(p1 * (1.0 - p1) + (p1 + 0.02) * (1.0 - (p1 + 0.02))), 2)
             |      / 0.0004) AS BIGINT) AS n_per_arm
             |  FROM f)
             |SELECT CAST(n_users AS BIGINT) AS n_users,
             |  CAST(converters AS BIGINT) AS converters,
             |  ROUND(p1, 6) AS baseline_p, n_per_arm,
             |  n_per_arm * 2 AS n_total,
             |  CAST(n_users >= n_per_arm * 2 AS BIGINT) AS feasible
             |FROM n""".stripMargin)
    ),

    // PAGE-HINKLEY drift detector on the per-type daily series: the
    // sequential change test that CUSUM's integer trick can't express
    // (the residual is against the RUNNING mean S_i/i, not the period
    // mean). Per-row residuals are doubles from identical integer
    // operands; the running accumulation goes through an exact DECIMAL
    // window sum so partition order can't wiggle an ulp. Alarm when
    // the accumulated drift exceeds one day's running average volume.
    "events_page_hinkley" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val base = dailyCounts(s, d)
          .withColumn("i", row_number().over(w))
          .withColumn("sx", sum(col("x")).over(wc))
        val term = (col("x").cast("double") -
          col("sx").cast("double") / col("i").cast("double"))
          .cast("decimal(28,12)")
        base.withColumn("m", sum(term).over(wc))
          .withColumn("ph",
            (col("m") - min(col("m")).over(wc)).cast("double"))
          .select(col("event_type"), col("di"), col("x"),
            round(col("ph"), 4).as("ph"),
            (col("ph") > col("sx").cast("double") / col("i").cast("double"))
              .cast("long").as("alarm"))
      },
      Some(s"""WITH d AS ($dailySql),
             |r AS (SELECT event_type, di, x,
             |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY di) AS i,
             |        CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY di
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sx
             |      FROM d),
             |m AS (SELECT event_type, di, x, i, sx,
             |        SUM(CAST(CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(i AS DOUBLE)
             |            AS DECIMAL(28,12)))
             |          OVER (PARTITION BY event_type ORDER BY di
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
             |      FROM r),
             |p AS (SELECT event_type, di, x, i, sx,
             |        CAST(m - MIN(m) OVER (PARTITION BY event_type ORDER BY di
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS ph
             |      FROM m)
             |SELECT event_type, di, x, ROUND(ph, 4) AS ph,
             |  CAST(ph > CAST(sx AS DOUBLE) / CAST(i AS DOUBLE) AS BIGINT) AS alarm
             |FROM p""".stripMargin)
    ),

    // STOCHASTIC OSCILLATOR (%K/%D) on the per-type daily volume
    // series: where today's volume sits inside its trailing 14-day
    // range, smoothed over 3 days — the overbought/oversold screen.
    // Flat ranges pin %K at 5000 bp. Entirely integer: bp division is
    // BIGINT div, so no float edge can flip a reading; the window
    // partitions by event_type over the bounded daily series.
    "window_stochastic" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        val w14 = w.rowsBetween(-13, 0)
        val k = dailyCounts(s, d)
          .withColumn("rn", row_number().over(w))
          .withColumn("mn", min(col("x")).over(w14))
          .withColumn("mx", max(col("x")).over(w14))
          .withColumn("k_bp",
            when(col("mx") > col("mn"),
              expr("(x - mn) * 10000 div (mx - mn)")).otherwise(lit(5000L)))
        k.withColumn("d_bp",
            expr("(k_bp + lag(k_bp, 1) over (partition by event_type order by di)"
              + " + lag(k_bp, 2) over (partition by event_type order by di)) div 3"))
          .filter(col("rn") >= 16)
          .select(col("event_type"), col("di"), col("x"), col("k_bp"),
            col("d_bp"))
      },
      Some(s"""WITH d AS ($dailySql),
             |k AS (SELECT event_type, di, x,
             |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY di) AS rn,
             |        CASE WHEN MAX(x) OVER w14 > MIN(x) OVER w14
             |          THEN (x - MIN(x) OVER w14) * 10000 // (MAX(x) OVER w14 - MIN(x) OVER w14)
             |          ELSE 5000 END AS k_bp
             |      FROM d
             |      WINDOW w14 AS (PARTITION BY event_type ORDER BY di
             |        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
             |s AS (SELECT event_type, di, x, rn, k_bp,
             |        (k_bp + LAG(k_bp, 1) OVER (PARTITION BY event_type ORDER BY di)
             |         + LAG(k_bp, 2) OVER (PARTITION BY event_type ORDER BY di)) // 3 AS d_bp
             |      FROM k)
             |SELECT event_type, di, x, CAST(k_bp AS BIGINT) AS k_bp,
             |  CAST(d_bp AS BIGINT) AS d_bp
             |FROM s WHERE rn >= 16""".stripMargin)
    ),

    // AVERAGE TRUE RANGE: daily (hi, lo, close) bars in exact cents,
    // true range vs the previous close, 14-day rolling ATR — the
    // volatility gauge for alerting thresholds. Bars reuse the OHLC
    // row_number-in-one-sort idiom; the rolling mean is an integer div
    // of an integer window sum, so the whole indicator is float-free.
    "window_atr" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("ts"), col("event_id"),
            expr("cast(floor(value * 100 + 0.5) as bigint)").as("vc"),
            expr("(ts div 1000) div 86400000000").as("di"))
        val wD = Window.partitionBy(col("event_type"), col("di"))
          .orderBy(col("ts").desc, col("event_id").desc)
        val bars = ev.withColumn("rnd", row_number().over(wD))
          .groupBy(col("event_type"), col("di"))
          .agg(max(col("vc")).as("hi_c"), min(col("vc")).as("lo_c"),
            max(when(col("rnd") === 1, col("vc"))).as("close_c"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        bars.withColumn("prev_c", lag(col("close_c"), 1).over(w))
          .withColumn("tr_c",
            when(col("prev_c").isNull, col("hi_c") - col("lo_c"))
              .otherwise(greatest(col("hi_c") - col("lo_c"),
                abs(col("hi_c") - col("prev_c")),
                abs(col("lo_c") - col("prev_c")))))
          .withColumn("atr_c",
            expr("sum(tr_c) over (partition by event_type order by di"
              + " rows between 13 preceding and current row)"
              + " div count(tr_c) over (partition by event_type order by di"
              + " rows between 13 preceding and current row)"))
          .select(col("event_type"), col("di"), col("hi_c"), col("lo_c"),
            col("close_c"), col("tr_c"), col("atr_c"))
      },
      Some("""WITH ev AS (SELECT event_type, ts, event_id,
             |    CAST(floor("value" * 100 + 0.5) AS BIGINT) AS vc,
             |    epoch_us(ts) // 86400000000 AS di FROM events),
             |r AS (SELECT event_type, di, vc,
             |        ROW_NUMBER() OVER (PARTITION BY event_type, di
             |          ORDER BY ts DESC, event_id DESC) AS rnd
             |      FROM ev),
             |bars AS (SELECT event_type, di, MAX(vc) AS hi_c, MIN(vc) AS lo_c,
             |           MAX(CASE WHEN rnd = 1 THEN vc END) AS close_c
             |         FROM r GROUP BY 1, 2),
             |tr AS (SELECT event_type, di, hi_c, lo_c, close_c,
             |         CASE WHEN LAG(close_c) OVER w IS NULL THEN hi_c - lo_c
             |           ELSE GREATEST(hi_c - lo_c,
             |             ABS(hi_c - LAG(close_c) OVER w),
             |             ABS(lo_c - LAG(close_c) OVER w)) END AS tr_c
             |       FROM bars
             |       WINDOW w AS (PARTITION BY event_type ORDER BY di))
             |SELECT event_type, di, hi_c, lo_c, close_c, tr_c,
             |  CAST(SUM(tr_c) OVER w14 // COUNT(tr_c) OVER w14 AS BIGINT) AS atr_c
             |FROM tr
             |WINDOW w14 AS (PARTITION BY event_type ORDER BY di
             |  ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin)
    ),

    // RFM SEGMENT MIGRATION: split the period at its midpoint, segment
    // every user's activity in each half relative to that half's
    // average events-per-user (high >= 1.1x avg, mid >= 0.9x avg,
    // low > 0, none = absent), and emit the migration matrix — the
    // lifecycle health readout. Segment thresholds compare integers
    // cross-multiplied (c * users * 10 >= 11 * total), no float edge;
    // one shuffle on user_id, everything after is broadcast-sized.
    "events_rfm_migration" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("ts div 1000").as("tus"))
        val mid = ev.agg(expr("(min(tus) + max(tus)) div 2").as("mid"))
        val u = ev.crossJoin(broadcast(mid)).groupBy(col("user_id"))
          .agg(sum(when(col("tus") < col("mid"), 1L).otherwise(0L)).as("c1"),
            sum(when(col("tus") >= col("mid"), 1L).otherwise(0L)).as("c2"))
        val tot = u.agg(count(lit(1)).as("n_users"),
          sum(when(col("c1") > 0, 1L).otherwise(0L)).as("u1"),
          sum(col("c1")).as("t1"),
          sum(when(col("c2") > 0, 1L).otherwise(0L)).as("u2"),
          sum(col("c2")).as("t2"))
        def seg(c: org.apache.spark.sql.Column, uu: org.apache.spark.sql.Column,
                tt: org.apache.spark.sql.Column) =
          when(c === 0, "none")
            .when(c * uu * 10 >= tt * 11, "high")
            .when(c * uu * 10 >= tt * 9, "mid")
            .otherwise("low")
        u.crossJoin(broadcast(tot))
          .select(seg(col("c1"), col("u1"), col("t1")).as("seg_h1"),
            seg(col("c2"), col("u2"), col("t2")).as("seg_h2"),
            col("n_users"))
          .groupBy(col("seg_h1"), col("seg_h2"))
          .agg(count(lit(1)).as("n"), max(col("n_users")).as("n_users"))
          .select(col("seg_h1"), col("seg_h2"), col("n"),
            expr("n * 10000 div n_users").as("share_bp"))
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
             |mid AS (SELECT (MIN(tus) + MAX(tus)) // 2 AS mid FROM ev),
             |u AS (SELECT user_id,
             |        SUM(CASE WHEN tus < mid THEN 1 ELSE 0 END) AS c1,
             |        SUM(CASE WHEN tus >= mid THEN 1 ELSE 0 END) AS c2
             |      FROM ev CROSS JOIN mid GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS n_users,
             |          SUM(CASE WHEN c1 > 0 THEN 1 ELSE 0 END) AS u1,
             |          SUM(c1) AS t1,
             |          SUM(CASE WHEN c2 > 0 THEN 1 ELSE 0 END) AS u2,
             |          SUM(c2) AS t2
             |        FROM u),
             |segd AS (SELECT
             |    CASE WHEN c1 = 0 THEN 'none'
             |         WHEN c1 * u1 * 10 >= t1 * 11 THEN 'high'
             |         WHEN c1 * u1 * 10 >= t1 * 9 THEN 'mid'
             |         ELSE 'low' END AS seg_h1,
             |    CASE WHEN c2 = 0 THEN 'none'
             |         WHEN c2 * u2 * 10 >= t2 * 11 THEN 'high'
             |         WHEN c2 * u2 * 10 >= t2 * 9 THEN 'mid'
             |         ELSE 'low' END AS seg_h2,
             |    n_users
             |  FROM u CROSS JOIN tot)
             |SELECT seg_h1, seg_h2, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(COUNT(*) * 10000 // MAX(n_users) AS BIGINT) AS share_bp
             |FROM segd GROUP BY 1, 2""".stripMargin)
    ),

    // ORDER-TO-SHIP LAG SLOs per priority class: p50/p90/p99 of the
    // ship lag in days — the fulfillment SLA readout. Quantiles come
    // from GroupedPercentile.exact (histogram-bisect over weekly lag
    // buckets — bounded memory on any priority's volume, the shared
    // machinery agg_percentiles pinned); the only data-sized shuffle
    // is the lineitem->orders key join.
    "orders_ship_lag_sla" -> Query(
      (s, d) => {
        val lag = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_shipdate"))
          .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
            col("o_orderdate"), col("o_orderpriority")), Seq("l_orderkey"))
          .select(col("o_orderpriority").as("priority"),
            datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
              .cast("long").as("lag_d"))
        val durs = graft.Caches.scoped(lag)
        GroupedPercentile.exact(durs, "priority", "lag_d",
            Seq(("p50", 0.50), ("p90", 0.90), ("p99", 0.99)),
            expr("lag_d div 7"), _.cast("double"))
          .withColumn("res", round(col("res"), 4))
          .groupBy(col("priority"))
          .agg(max(when(col("pname") === "p50", col("res"))).as("p50_days"),
            max(when(col("pname") === "p90", col("res"))).as("p90_days"),
            max(when(col("pname") === "p99", col("res"))).as("p99_days"))
          .join(durs.groupBy(col("priority")).agg(count(lit(1)).as("n_lines")),
            Seq("priority"))
      },
      Some("""WITH lag AS (SELECT o_orderpriority AS priority,
             |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
             |      AS BIGINT) AS lag_d
             |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey)
             |SELECT priority,
             |  ROUND(quantile_cont(CAST(lag_d AS DOUBLE), 0.50), 4) AS p50_days,
             |  ROUND(quantile_cont(CAST(lag_d AS DOUBLE), 0.90), 4) AS p90_days,
             |  ROUND(quantile_cont(CAST(lag_d AS DOUBLE), 0.99), 4) AS p99_days,
             |  CAST(COUNT(*) AS BIGINT) AS n_lines
             |FROM lag GROUP BY 1""".stripMargin)
    ),

    // SEASONALLY-ADJUSTED volume anomalies: a (type, day, hour) cell
    // alarms when its count exceeds 2x the average for that type's
    // same (day-of-week, hour) slot — the traffic monitor that doesn't
    // page on every Monday morning. The verdict is one integer
    // cross-multiplication (c * n_days > 2 * slot_total); baselines
    // are (type x 168)-sized broadcast material, and the only
    // data-sized agg is the hourly rollup.
    "events_anomaly_seasonal" -> Query(
      (s, d) => {
        val hc = Tables.events(s, d)
          .select(col("event_type"),
            expr("(ts div 1000) div 86400000000").as("di"),
            expr("((ts div 1000) div 3600000000) % 24").as("hr"))
          .groupBy(col("event_type"), col("di"), col("hr"))
          .agg(count(lit(1)).as("c"))
        val days = Tables.events(s, d)
          .select(expr("(ts div 1000) div 86400000000").as("di")).distinct()
          .groupBy(pmod(col("di"), lit(7)).as("dow"))
          .agg(count(lit(1)).as("n_days"))
        val slot = hc.withColumn("dow", pmod(col("di"), lit(7)))
          .groupBy(col("event_type"), col("dow"), col("hr"))
          .agg(sum(col("c")).as("slot_total"))
        hc.withColumn("dow", pmod(col("di"), lit(7)))
          .join(broadcast(slot), Seq("event_type", "dow", "hr"))
          .join(broadcast(days), Seq("dow"))
          .filter(col("c") * col("n_days") > col("slot_total") * 2)
          .select(col("event_type"), col("di"), col("hr"), col("c"),
            col("slot_total"), col("n_days"))
      },
      Some("""WITH e AS (SELECT event_type,
             |    epoch_us(ts) // 86400000000 AS di,
             |    (epoch_us(ts) // 3600000000) % 24 AS hr
             |  FROM events),
             |hc AS (SELECT event_type, di, hr, COUNT(*) AS c
             |       FROM e GROUP BY 1, 2, 3),
             |days AS (SELECT di % 7 AS dow, COUNT(*) AS n_days
             |         FROM (SELECT DISTINCT di FROM e) GROUP BY 1),
             |slot AS (SELECT event_type, di % 7 AS dow, hr,
             |           SUM(c) AS slot_total
             |         FROM hc GROUP BY 1, 2, 3)
             |SELECT hc.event_type, hc.di, hc.hr, CAST(c AS BIGINT) AS c,
             |  CAST(slot_total AS BIGINT) AS slot_total,
             |  CAST(n_days AS BIGINT) AS n_days
             |FROM hc
             |JOIN slot ON slot.event_type = hc.event_type
             |  AND slot.dow = hc.di % 7 AND slot.hr = hc.hr
             |JOIN days ON days.dow = hc.di % 7
             |WHERE c * n_days > slot_total * 2""".stripMargin)
    ),

    // USER GROWTH CURVE: per day, how many users appeared for the
    // FIRST time, and the cumulative distinct-user count — the
    // adoption curve without any running count-distinct: first-seen
    // day per user is one user-keyed min, the cumulative is a window
    // over the bounded daily series.
    "events_user_growth" -> Query(
      (s, d) => {
        val first = Tables.events(s, d)
          .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("di"))
          .groupBy(col("user_id")).agg(min(col("di")).as("d0"))
          .groupBy(col("d0").as("di")).agg(count(lit(1)).as("new_users"))
        first.withColumn("cum_users",
          sum(col("new_users")).over(Window.orderBy(col("di"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      },
      Some("""WITH f AS (SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS d0
             |           FROM events GROUP BY 1),
             |n AS (SELECT d0 AS di, COUNT(*) AS new_users FROM f GROUP BY 1)
             |SELECT di, CAST(new_users AS BIGINT) AS new_users,
             |  CAST(SUM(new_users) OVER (ORDER BY di
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS cum_users
             |FROM n""".stripMargin)
    ),

    // RETURN / FILL RATE by order month: share of lineitems flagged
    // returned per month plus the month-over-month delta — the
    // fulfillment-quality trendline. One map-side monthly rollup;
    // the delta window runs over the bounded monthly series.
    "orders_fill_rate" -> Query(
      (s, d) => {
        val w = Window.orderBy(col("m"))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
            col("o_orderdate")), Seq("l_orderkey"))
          .groupBy(expr("year(o_orderdate) * 100 + month(o_orderdate)")
            .cast("long").as("m"))
          .agg(count(lit(1)).as("n_lines"),
            sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
              .as("returned"))
          .select(col("m"), col("n_lines"), col("returned"),
            expr("returned * 10000 div n_lines").as("ret_bp"))
          .withColumn("delta_bp",
            col("ret_bp") - coalesce(lag(col("ret_bp"), 1).over(w),
              col("ret_bp")))
      },
      Some("""WITH m AS (SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
             |      AS BIGINT) AS m,
             |    COUNT(*) AS n_lines,
             |    SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS returned
             |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |  GROUP BY 1),
             |r AS (SELECT m, CAST(n_lines AS BIGINT) AS n_lines,
             |        CAST(returned AS BIGINT) AS returned,
             |        CAST(returned * 10000 // n_lines AS BIGINT) AS ret_bp
             |      FROM m)
             |SELECT m, n_lines, returned, ret_bp,
             |  CAST(ret_bp - COALESCE(LAG(ret_bp) OVER (ORDER BY m), ret_bp)
             |    AS BIGINT) AS delta_bp
             |FROM r""".stripMargin)
    ),

    // POPULATION STABILITY INDEX per event type: the standard ML
    // feature-drift score between the period halves,
    // PSI = sum (p2-p1)*ln(p2/p1) over 21 clamped value bins with
    // add-one smoothing (no ln(0) edge). Complements the chi-square
    // events_dist_drift with the metric model-monitoring stacks
    // actually alert on (0.2 = investigate). Counts are one partial
    // agg on (type, half, bin); the PSI fold runs over |types| x 21
    // broadcast-scale rows.
    "events_psi_drift" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), expr("ts div 1000").as("tus"),
            expr("cast(floor(value * 100 + 0.5) as bigint)").as("vc"))
        val mid = ev.agg(expr("(min(tus) + max(tus)) div 2").as("mid"))
        val binned = ev.crossJoin(broadcast(mid))
          .select(col("event_type"),
            when(col("tus") < col("mid"), 1L).otherwise(2L).as("half"),
            least(greatest(expr("vc div 5000"), lit(-10L)), lit(10L)).as("bin"))
        val cnt = binned.groupBy(col("event_type"), col("half"), col("bin"))
          .agg(count(lit(1)).as("c"))
        val tot = binned.groupBy(col("event_type"), col("half"))
          .agg(count(lit(1)).as("n"))
        val wide = cnt.groupBy(col("event_type"), col("bin"))
          .agg(
            coalesce(max(when(col("half") === 1, col("c"))), lit(0L)).as("c1"),
            coalesce(max(when(col("half") === 2, col("c"))), lit(0L)).as("c2"))
          .join(broadcast(tot.filter(col("half") === 1)
            .select(col("event_type"), col("n").as("n1"))), Seq("event_type"))
          .join(broadcast(tot.filter(col("half") === 2)
            .select(col("event_type"), col("n").as("n2"))), Seq("event_type"))
        val p1 = (col("c1") + 1).cast("double") / (col("n1") + 21).cast("double")
        val p2 = (col("c2") + 1).cast("double") / (col("n2") + 21).cast("double")
        val term = ((p2 - p1) * log(p2 / p1)).cast("decimal(28,12)")
        wide.groupBy(col("event_type"))
          .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
            sum(term).as("psi_d"))
          .select(col("event_type"), col("n1"), col("n2"),
            round(col("psi_d").cast("double"), 4).as("psi"),
            (col("psi_d").cast("double") > 0.2).cast("long").as("drifted"))
      },
      Some("""WITH ev AS (SELECT event_type, epoch_us(ts) AS tus,
             |    CAST(floor("value" * 100 + 0.5) AS BIGINT) AS vc FROM events),
             |mid AS (SELECT (MIN(tus) + MAX(tus)) // 2 AS mid FROM ev),
             |b AS (SELECT event_type,
             |        CASE WHEN tus < mid THEN 1 ELSE 2 END AS half,
             |        LEAST(GREATEST(vc // 5000, -10), 10) AS bin
             |      FROM ev CROSS JOIN mid),
             |cnt AS (SELECT event_type, half, bin, COUNT(*) AS c
             |        FROM b GROUP BY 1, 2, 3),
             |tot AS (SELECT event_type, half, COUNT(*) AS n
             |        FROM b GROUP BY 1, 2),
             |piv AS (SELECT event_type, bin,
             |    COALESCE(MAX(CASE WHEN half = 1 THEN c END), 0) AS c1,
             |    COALESCE(MAX(CASE WHEN half = 2 THEN c END), 0) AS c2
             |  FROM cnt GROUP BY 1, 2),
             |wide AS (SELECT piv.event_type, bin, c1, c2, t1.n AS n1, t2.n AS n2
             |  FROM piv
             |  JOIN tot t1 ON t1.event_type = piv.event_type AND t1.half = 1
             |  JOIN tot t2 ON t2.event_type = piv.event_type AND t2.half = 2),
             |t AS (SELECT event_type, n1, n2,
             |    SUM(CAST((CAST(c2 + 1 AS DOUBLE) / CAST(n2 + 21 AS DOUBLE)
             |          - CAST(c1 + 1 AS DOUBLE) / CAST(n1 + 21 AS DOUBLE))
             |        * ln((CAST(c2 + 1 AS DOUBLE) / CAST(n2 + 21 AS DOUBLE))
             |            / (CAST(c1 + 1 AS DOUBLE) / CAST(n1 + 21 AS DOUBLE)))
             |        AS DECIMAL(28,12))) AS psi_d
             |  FROM wide GROUP BY 1, 2, 3)
             |SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             |  ROUND(CAST(psi_d AS DOUBLE), 4) AS psi,
             |  CAST(CAST(psi_d AS DOUBLE) > 0.2 AS BIGINT) AS drifted
             |FROM t""".stripMargin)
    )
  )
}
