package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Query, Tables}

/** Hypothesis-test and distribution-comparison analytics — the
  * statistical battery an experimentation/curation warehouse runs on
  * top of the relational core: chi-square independence, Mann-Whitney
  * rank-sum, two-sample Kolmogorov-Smirnov, Welch's t, rolling
  * correlation, and demand-volatility classes.
  *
  * Exactness discipline (see graft.Parity): every sufficient statistic
  * is an integer/DECIMAL sum from ONE map-side-combinable aggregation;
  * doubles appear only in terminal formulas written identically in the
  * DuckDB oracles, with `round` absorbing any last-ulp divergence.
  * Scale discipline: each test aggregates the fact table down to a
  * value-level or cell-level summary FIRST (distinct discount/quantity
  * values, contingency cells, daily buckets), so the windows that
  * follow run over dimension-sized inputs no matter the fact size.
  */
object Analytics3 {

  val entries: Seq[(String, Query)] = Seq(

    // CHI-SQUARE independence of return flag x line status — the
    // canonical "are these two categoricals related" gate. One partial
    // agg folds the contingency cells (|cells| = r*c, here 3x2); row/
    // column/grand totals come from windows over that tiny cell table.
    // Each cell term uses the integer-numerator form
    // (cnt*tot - rowt*colt)^2 / (rowt*colt*tot) so both engines square
    // and divide the same exact operands; only the 6-term chi2 sum is
    // a double. Cramer's V and the 5%-critical verdict derive from the
    // ROUNDED chi2 so the comparison never sits on an ulp.
    "agg_chisq_independence" -> Query(
      (s, d) => {
        val cells = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"))
        val wr = Window.partitionBy(col("l_returnflag"))
        val wc = Window.partitionBy(col("l_linestatus"))
        val wt = Window.partitionBy()
        val t = cells
          .withColumn("rowt", sum(col("cnt")).over(wr))
          .withColumn("colt", sum(col("cnt")).over(wc))
          .withColumn("tot", sum(col("cnt")).over(wt))
          .withColumn("num",
            // decimal(38)/HUGEINT route for the n^2-scale products —
            // past ~3e9 fact rows the raw long products wrap silently
            (col("cnt").cast("decimal(38,0)") * col("tot")
              - col("rowt").cast("decimal(38,0)") * col("colt")).cast("double"))
          .withColumn("den",
            (col("rowt").cast("decimal(38,0)") * col("colt") * col("tot"))
              .cast("double"))
          .withColumn("term", col("num") * col("num") / col("den"))
        val g = t.agg(
          max(col("tot")).as("n"),
          countDistinct(col("l_returnflag")).as("r"),
          countDistinct(col("l_linestatus")).as("c"),
          round(sum(col("term")), 4).as("chi2"))
        g.select(col("n"), col("r"), col("c"),
            ((col("r") - 1) * (col("c") - 1)).as("dof"), col("chi2"),
            round(sqrt(col("chi2") /
              (col("n") * least(col("r") - 1, col("c") - 1)).cast("double")), 6)
              .as("cramers_v"))
          .withColumn("crit",
            when(col("dof") === 1, 3.841).when(col("dof") === 2, 5.991)
              .when(col("dof") === 3, 7.815).when(col("dof") === 4, 9.488)
              .when(col("dof") === 5, 11.07).otherwise(12.592))
          .withColumn("dependent", (col("chi2") > col("crit")).cast("long"))
          .drop("crit")
      },
      Some("""WITH cells AS (
             |  SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
             |  FROM lineitem GROUP BY 1, 2),
             |t AS (
             |  SELECT cnt,
             |    SUM(cnt) OVER (PARTITION BY l_returnflag) AS rowt,
             |    SUM(cnt) OVER (PARTITION BY l_linestatus) AS colt,
             |    SUM(cnt) OVER () AS tot,
             |    l_returnflag, l_linestatus
             |  FROM cells),
             |g AS (
             |  SELECT CAST(MAX(tot) AS BIGINT) AS n,
             |    COUNT(DISTINCT l_returnflag) AS r,
             |    COUNT(DISTINCT l_linestatus) AS c,
             |    ROUND(SUM(CAST(CAST(cnt AS HUGEINT)*tot - CAST(rowt AS HUGEINT)*colt AS DOUBLE)
             |              * CAST(CAST(cnt AS HUGEINT)*tot - CAST(rowt AS HUGEINT)*colt AS DOUBLE)
             |              / CAST(CAST(rowt AS HUGEINT)*colt*tot AS DOUBLE)), 4)
             |      AS chi2
             |  FROM t)
             |SELECT n, r, c, (r-1)*(c-1) AS dof, chi2,
             |  ROUND(sqrt(chi2 / CAST(n * LEAST(r-1, c-1) AS DOUBLE)), 6)
             |    AS cramers_v,
             |  CAST(chi2 > (CASE (r-1)*(c-1) WHEN 1 THEN 3.841 WHEN 2 THEN 5.991
             |    WHEN 3 THEN 7.815 WHEN 4 THEN 9.488 WHEN 5 THEN 11.07
             |    ELSE 12.592 END) AS BIGINT) AS dependent
             |FROM g""".stripMargin)
    ),

    // MANN-WHITNEY U rank-sum: do returned (R) and delivered (N) lines
    // draw their discounts from the same distribution? Nonparametric —
    // the A/B workhorse when values are skewed and a t-test lies. The
    // fact table folds to per-distinct-value counts first (discount has
    // 11 whole-percent values), so the rank window runs over 11 rows
    // regardless of fact size. Tie-averaged ranks ride the 2x-integer
    // trick (2*avgrank = 2*cumlo + cnt + 1, always integral): the
    // rank-sum and U stay EXACT integers; the tie-corrected normal
    // approximation z is the only double. cnt^3 in the tie term goes
    // through DECIMAL(38,0)/HUGEINT so a hot value at 100x cannot
    // overflow. No continuity correction (same formula both engines).
    "agg_mannwhitney" -> Query(
      (s, d) => {
        val base = Tables.lineitem(s, d)
          .filter(col("l_returnflag").isin("R", "N"))
          .select(floor(col("l_discount") * 100 + 0.5).cast("long").as("dk"),
            (col("l_returnflag") === "R").cast("long").as("isr"))
        val v = base.groupBy(col("dk"))
          .agg(count(lit(1)).as("cnt"), sum(col("isr")).as("cr"))
        val wo = Window.orderBy(col("dk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ranked = v.withColumn("cumlo",
          coalesce(sum(col("cnt")).over(wo), lit(0L)))
        val g = ranked.agg(
          sum(col("cnt")).as("n"),
          sum(col("cr")).as("n1"),
          // decimal(38) route for the n^2-scale rank-sum product (cast
          // back to long: the emitted value is contract-capped anyway)
          sum(col("cr").cast("decimal(38,0)")
            * (lit(2) * col("cumlo") + col("cnt") + 1)).cast("long").as("rs2"),
          sum(col("cnt").cast("decimal(38,0)") * col("cnt") * col("cnt")
            - col("cnt")).cast("double").as("ties"))
        g.select(col("n1"), (col("n") - col("n1")).as("n2"),
            (col("rs2") - col("n1") * (col("n1") + 1)).as("u2"),
            col("n"), col("rs2"), col("ties"))
          .withColumn("varu",
            (col("n1").cast("double") * (col("n") - col("n1")) / 12.0) *
              ((col("n") + 1).cast("double") -
                col("ties") / (col("n").cast("double") * (col("n") - 1))))
          .withColumn("z", round(
            (col("u2") - col("n1") * (col("n") - col("n1"))).cast("double") /
              (lit(2.0) * sqrt(col("varu"))), 4))
          .select(col("n1"), col("n2"), col("u2"), col("z"),
            (abs(col("z")) > 1.96).cast("long").as("significant"))
      },
      Some("""WITH base AS (
             |  SELECT CAST(floor(l_discount*100 + 0.5) AS BIGINT) AS dk,
             |    CAST(l_returnflag = 'R' AS BIGINT) AS isr
             |  FROM lineitem WHERE l_returnflag IN ('R','N')),
             |v AS (SELECT dk, COUNT(*) AS cnt, SUM(isr) AS cr
             |      FROM base GROUP BY 1),
             |r AS (SELECT *, COALESCE(SUM(cnt) OVER (ORDER BY dk
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |        AS cumlo
             |      FROM v),
             |g AS (SELECT SUM(cnt) AS n, SUM(cr) AS n1,
             |        SUM(CAST(cr AS HUGEINT) * (2*cumlo + cnt + 1)) AS rs2,
             |        CAST(SUM(CAST(cnt AS HUGEINT)*cnt*cnt - cnt) AS DOUBLE)
             |          AS ties
             |      FROM r),
             |f AS (SELECT CAST(n1 AS BIGINT) AS n1, CAST(n - n1 AS BIGINT) AS n2,
             |        CAST(rs2 - n1*(n1+1) AS BIGINT) AS u2, n,
             |        (CAST(n1 AS DOUBLE) * (n - n1) / 12.0) *
             |          (CAST(n + 1 AS DOUBLE)
             |           - ties / (CAST(n AS DOUBLE) * (n - 1))) AS varu
             |      FROM g)
             |SELECT n1, n2, u2,
             |  ROUND(CAST(u2 - n1*(n - n1) AS DOUBLE) / (2.0*sqrt(varu)), 4)
             |    AS z,
             |  CAST(abs(ROUND(CAST(u2 - n1*(n - n1) AS DOUBLE)
             |    / (2.0*sqrt(varu)), 4)) > 1.96 AS BIGINT) AS significant
             |FROM f""".stripMargin)
    ),

    // Two-sample KOLMOGOROV-SMIRNOV on order quantity, R vs N lines —
    // "same distribution?" without binning assumptions. The ECDF gap at
    // every distinct value is the EXACT rational |C1*n2 - C2*n1| /
    // (n1*n2): the max runs over integer numerators, so the supremum
    // D is found exactly and becomes a double only at the terminal
    // division. Value-level fold first (50 distinct quantities) keeps
    // the cumulative window dimension-sized. The 5% verdict compares
    // rounded D against the rounded large-sample critical value
    // c(alpha)*sqrt((n1+n2)/(n1*n2)), c(0.05)=1.358.
    "agg_ks_test" -> Query(
      (s, d) => {
        val base = Tables.lineitem(s, d)
          .filter(col("l_returnflag").isin("R", "N"))
          .select(floor(col("l_quantity") + 0.5).cast("long").as("qk"),
            (col("l_returnflag") === "R").cast("long").as("isr"))
        val v = base.groupBy(col("qk"))
          .agg(sum(col("isr")).as("c1"),
            (count(lit(1)) - sum(col("isr"))).as("c2"))
        val wo = Window.orderBy(col("qk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wt = Window.partitionBy()
        val cum = v
          .withColumn("cc1", sum(col("c1")).over(wo))
          .withColumn("cc2", sum(col("c2")).over(wo))
          .withColumn("n1", sum(col("c1")).over(wt))
          .withColumn("n2", sum(col("c2")).over(wt))
          // decimal(38)/HUGEINT route for the n^2-scale ECDF numerator
          .withColumn("num", abs(col("cc1").cast("decimal(38,0)") * col("n2")
            - col("cc2").cast("decimal(38,0)") * col("n1")))
        val g = cum.agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          max(col("num")).as("dnum"))
        g.select(col("n1"), col("n2"),
            round(col("dnum").cast("double") /
              (col("n1").cast("double") * col("n2")), 6).as("d"),
            round(lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") /
              (col("n1").cast("double") * col("n2"))), 6).as("crit"))
          .withColumn("reject", (col("d") > col("crit")).cast("long"))
      },
      Some("""WITH base AS (
             |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS qk,
             |    CAST(l_returnflag = 'R' AS BIGINT) AS isr
             |  FROM lineitem WHERE l_returnflag IN ('R','N')),
             |v AS (SELECT qk, SUM(isr) AS c1, COUNT(*) - SUM(isr) AS c2
             |      FROM base GROUP BY 1),
             |cum AS (SELECT
             |    SUM(c1) OVER (ORDER BY qk ROWS UNBOUNDED PRECEDING) AS cc1,
             |    SUM(c2) OVER (ORDER BY qk ROWS UNBOUNDED PRECEDING) AS cc2,
             |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
             |  FROM v),
             |g AS (SELECT CAST(MAX(n1) AS BIGINT) AS n1,
             |        CAST(MAX(n2) AS BIGINT) AS n2,
             |        MAX(abs(CAST(cc1 AS HUGEINT)*n2 - CAST(cc2 AS HUGEINT)*n1)) AS dnum
             |      FROM cum)
             |SELECT n1, n2,
             |  ROUND(CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS d,
             |  ROUND(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE)
             |    / (CAST(n1 AS DOUBLE) * n2)), 6) AS crit,
             |  CAST(ROUND(CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6)
             |    > ROUND(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE)
             |      / (CAST(n1 AS DOUBLE) * n2)), 6) AS BIGINT) AS reject
             |FROM g""".stripMargin)
    ),

    // WELCH'S t-test (unequal variances): do URGENT and LOW priority
    // orders differ in mean order value? Means and sample variances
    // come from exact integer-cent power sums (squares summed as
    // DECIMAL(38,0)/HUGEINT — a cents^2 sum overflows BIGINT at scale);
    // t and the Welch-Satterthwaite df are terminal double formulas on
    // those exact operands. One partial agg over the fact table, a
    // 2-row pivot, one output row.
    "agg_welch_ttest" -> Query(
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(col("o_orderpriority").as("pri"),
            (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
              .as("cents"))
        val g = o.groupBy(col("pri")).agg(count(lit(1)).as("n"),
          sum(col("cents")).as("s1"),
          sum((col("cents") * col("cents")).cast("decimal(38,0)")).as("s2"))
        val p = g.agg(
          max(when(col("pri") === "1-URGENT", col("n"))).as("n1"),
          max(when(col("pri") === "1-URGENT", col("s1"))).as("a1"),
          max(when(col("pri") === "1-URGENT", col("s2"))).as("q1"),
          max(when(col("pri") === "5-LOW", col("n"))).as("n2"),
          max(when(col("pri") === "5-LOW", col("s1"))).as("a2"),
          max(when(col("pri") === "5-LOW", col("s2"))).as("q2"))
        val m1 = col("a1").cast("double") / 100.0 / col("n1")
        val m2 = col("a2").cast("double") / 100.0 / col("n2")
        val v1 = (col("q1").cast("double") / 10000.0 -
          (col("a1").cast("double") / 100.0) *
            (col("a1").cast("double") / 100.0) / col("n1")) / (col("n1") - 1)
        val v2 = (col("q2").cast("double") / 10000.0 -
          (col("a2").cast("double") / 100.0) *
            (col("a2").cast("double") / 100.0) / col("n2")) / (col("n2") - 1)
        val se2 = v1 / col("n1") + v2 / col("n2")
        p.select(col("n1"), col("n2"),
            round(m1 - m2, 4).as("mean_diff"),
            round((m1 - m2) / sqrt(se2), 4).as("t"),
            round(se2 * se2 / ((v1 / col("n1")) * (v1 / col("n1")) / (col("n1") - 1)
              + (v2 / col("n2")) * (v2 / col("n2")) / (col("n2") - 1)), 2).as("df"))
          .withColumn("significant", (abs(col("t")) > 1.96).cast("long"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderpriority AS pri,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM orders WHERE o_orderpriority IN ('1-URGENT','5-LOW')),
             |g AS (SELECT pri, COUNT(*) AS n, SUM(cents) AS s1,
             |        SUM(CAST(cents*cents AS HUGEINT)) AS s2
             |      FROM o GROUP BY 1),
             |p AS (SELECT
             |    MAX(CASE WHEN pri='1-URGENT' THEN n END) AS n1,
             |    MAX(CASE WHEN pri='1-URGENT' THEN s1 END) AS a1,
             |    MAX(CASE WHEN pri='1-URGENT' THEN s2 END) AS q1,
             |    MAX(CASE WHEN pri='5-LOW' THEN n END) AS n2,
             |    MAX(CASE WHEN pri='5-LOW' THEN s1 END) AS a2,
             |    MAX(CASE WHEN pri='5-LOW' THEN s2 END) AS q2
             |  FROM g),
             |f AS (SELECT n1, n2,
             |    CAST(a1 AS DOUBLE)/100.0/n1 AS m1,
             |    CAST(a2 AS DOUBLE)/100.0/n2 AS m2,
             |    (CAST(q1 AS DOUBLE)/10000.0
             |     - (CAST(a1 AS DOUBLE)/100.0)*(CAST(a1 AS DOUBLE)/100.0)/n1)
             |      / (n1 - 1) AS v1,
             |    (CAST(q2 AS DOUBLE)/10000.0
             |     - (CAST(a2 AS DOUBLE)/100.0)*(CAST(a2 AS DOUBLE)/100.0)/n2)
             |      / (n2 - 1) AS v2
             |  FROM p)
             |SELECT n1, n2, ROUND(m1 - m2, 4) AS mean_diff,
             |  ROUND((m1 - m2) / sqrt(v1/n1 + v2/n2), 4) AS t,
             |  ROUND((v1/n1 + v2/n2)*(v1/n1 + v2/n2)
             |    / ((v1/n1)*(v1/n1)/(n1-1) + (v2/n2)*(v2/n2)/(n2-1)), 2) AS df,
             |  CAST(abs(ROUND((m1 - m2) / sqrt(v1/n1 + v2/n2), 4)) > 1.96
             |    AS BIGINT) AS significant
             |FROM f""".stripMargin)
    ),

    // ROLLING 14-day Pearson correlation between daily revenue and
    // daily quantity — the demand-vs-price comovement monitor. The
    // fact table folds to one row per ship DAY first (exact integer
    // sums; revenue quantized to $1000 units by integer division so
    // the squared rolling sums stay in BIGINT range at 10000x); the
    // rolling window then runs over the calendar-bounded daily series
    // (~2,400 rows regardless of fact size; precedent: the other
    // calendar-series windows). All five rolling sums are LONG-exact;
    // the corr formula is one terminal double expression.
    "window_rolling_corr" -> Query(
      (s, d) => {
        val daily = Tables.lineitem(s, d)
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
          .agg(expr("sum(cast(cast(l_extendedprice as decimal(18,2))*100 as long)) div 100000")
            .as("rev_k"),
            sum(floor(col("l_quantity") + 0.5).cast("long")).as("qty"))
        val w = Window.orderBy(col("day")).rowsBetween(-13, 0)
        val r = daily
          .withColumn("rn", row_number().over(Window.orderBy(col("day"))))
          .withColumn("sx", sum(col("rev_k")).over(w))
          .withColumn("sy", sum(col("qty")).over(w))
          .withColumn("sxx", sum(col("rev_k") * col("rev_k")).over(w))
          .withColumn("syy", sum(col("qty") * col("qty")).over(w))
          .withColumn("sxy", sum(col("rev_k") * col("qty")).over(w))
          .filter(col("rn") >= 14)
          .withColumn("dxx", lit(14) * col("sxx") - col("sx") * col("sx"))
          .withColumn("dyy", lit(14) * col("syy") - col("sy") * col("sy"))
          .filter(col("dxx") > 0 && col("dyy") > 0)
        r.select(col("day"), col("rev_k"), col("qty"),
          round((lit(14) * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt(col("dxx").cast("double") * col("dyy").cast("double")), 6)
            .as("corr14"))
      },
      Some("""WITH daily AS (
             |  SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,
             |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT))
             |      // 100000 AS BIGINT) AS rev_k,
             |    CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty
             |  FROM lineitem GROUP BY 1),
             |r AS (SELECT day, rev_k, qty,
             |    ROW_NUMBER() OVER (ORDER BY day) AS rn,
             |    SUM(rev_k) OVER w AS sx, SUM(qty) OVER w AS sy,
             |    SUM(rev_k*rev_k) OVER w AS sxx,
             |    SUM(qty*qty) OVER w AS syy,
             |    SUM(rev_k*qty) OVER w AS sxy
             |  FROM daily
             |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
             |f AS (SELECT day, rev_k, qty,
             |    14*sxx - sx*sx AS dxx, 14*syy - sy*sy AS dyy,
             |    14*sxy - sx*sy AS num
             |  FROM r WHERE rn >= 14)
             |SELECT day, rev_k, qty,
             |  ROUND(CAST(num AS DOUBLE)
             |    / sqrt(CAST(dxx AS DOUBLE) * CAST(dyy AS DOUBLE)), 6) AS corr14
             |FROM f WHERE dxx > 0 AND dyy > 0""".stripMargin)
    ),

    // XYZ demand-volatility classes — the planning-side complement of
    // ABC revenue classes: per part, the coefficient of variation of
    // MONTHLY demand buckets parts into steady (X, cv<=0.5), variable
    // (Y, cv<=1.0), and erratic (Z). CV is quantized to integer basis
    // points the moment it is born, so the per-brand rollup (counts +
    // integer-division mean cv_bp) is pure LONG arithmetic — no
    // double-summation order nondeterminism and no round-half edges. Two partial aggs (part-month, then part) + one
    // broadcast dim join + one small rollup.
    // SAFETY-STOCK plan per brand — the inventory-planning readout on
    // top of part_xyz_class's demand-variability machinery: per part,
    // monthly demand mean/σ from exact integer power sums, safety
    // stock = z·σ·√L (z = 1.645 service level, L = 2 months lead
    // time), reorder point = L·mean + ss. Rolled to brand level as
    // exact integer sums of per-part CEILED units (ceil keeps the
    // plan integral and conservative, and makes the rollup
    // order-independent) — parts with one observed month have no σ
    // and are excluded identically by both engines.
    "part_safety_stock" -> Query(
      (s, d) => {
        val monthly = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"),
            date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM").as("m"))
          .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("q"))
        val per = monthly.groupBy(col("l_partkey")).agg(
          count(lit(1)).as("nm"),
          sum(col("q")).as("s1"),
          sum(col("q") * col("q")).as("s2"))
          .filter(col("nm") >= 2)
        val mean = col("s1").cast("double") / col("nm")
        val sd = sqrt(greatest(
          (col("nm") * col("s2") - col("s1") * col("s1")).cast("double") /
            (col("nm").cast("double") * (col("nm") - 1)), lit(0.0)))
        val planned = per
          .withColumn("ss_units",
            ceil(lit(1.645) * sd * sqrt(lit(2.0))).cast("long"))
          .withColumn("rop_units",
            ceil(lit(2.0) * mean).cast("long") + col("ss_units"))
        planned
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey").as("l_partkey"), col("p_brand"))),
            Seq("l_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_parts"),
            sum(col("ss_units")).as("ss_total"),
            sum(col("rop_units")).as("rop_total"),
            max(col("ss_units")).as("ss_max"))
      },
      Some("""WITH monthly AS (
             |  SELECT l_partkey, strftime(date_trunc('month', l_shipdate), '%Y-%m') AS m,
             |    SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS q
             |  FROM lineitem GROUP BY 1, 2),
             |per AS (SELECT l_partkey, COUNT(*) AS nm,
             |          SUM(q) AS s1, SUM(q*q) AS s2
             |        FROM monthly GROUP BY 1 HAVING COUNT(*) >= 2),
             |pl AS (SELECT l_partkey,
             |         CAST(ceil(1.645 * sqrt(GREATEST(
             |           CAST(nm*s2 - s1*s1 AS DOUBLE) / (CAST(nm AS DOUBLE) * (nm - 1)),
             |           0.0)) * sqrt(2.0)) AS BIGINT) AS ss_units,
             |         CAST(ceil(2.0 * CAST(s1 AS DOUBLE) / nm) AS BIGINT) AS base_units
             |       FROM per)
             |SELECT p.p_brand,
             |  COUNT(*) AS n_parts,
             |  CAST(SUM(ss_units) AS BIGINT) AS ss_total,
             |  CAST(SUM(base_units + ss_units) AS BIGINT) AS rop_total,
             |  CAST(MAX(ss_units) AS BIGINT) AS ss_max
             |FROM pl JOIN part p ON p.p_partkey = pl.l_partkey
             |GROUP BY 1""".stripMargin)
    ),

    "part_xyz_class" -> Query(
      (s, d) => {
        val monthly = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"),
            date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM").as("m"))
          .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("q"))
        val per = monthly.groupBy(col("l_partkey")).agg(
          count(lit(1)).as("n_months"),
          sum(col("q")).as("s1"),
          sum(col("q") * col("q")).as("s2"))
        val cv = sqrt(greatest(
          col("s2").cast("double") / col("n_months") -
            (col("s1").cast("double") / col("n_months")) *
              (col("s1").cast("double") / col("n_months")), lit(0.0))) /
          (col("s1").cast("double") / col("n_months"))
        val classed = per
          .withColumn("cv_bp", floor(cv * 10000 + 0.5).cast("long"))
          .withColumn("xyz",
            when(col("cv_bp") <= 5000, "X")
              .when(col("cv_bp") <= 10000, "Y").otherwise("Z"))
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey").as("l_partkey"), col("p_brand"))),
            Seq("l_partkey"))
        classed.groupBy(col("p_brand"), col("xyz"))
          .agg(count(lit(1)).as("n_parts"),
            expr("sum(cv_bp) div count(1)").as("avg_cv_bp"))
      },
      Some("""WITH monthly AS (
             |  SELECT l_partkey, strftime(date_trunc('month', l_shipdate), '%Y-%m') AS m,
             |    SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS q
             |  FROM lineitem GROUP BY 1, 2),
             |per AS (SELECT l_partkey, COUNT(*) AS n_months,
             |          SUM(q) AS s1, SUM(q*q) AS s2
             |        FROM monthly GROUP BY 1),
             |classed AS (SELECT l_partkey,
             |    CAST(floor(sqrt(GREATEST(
             |        CAST(s2 AS DOUBLE)/n_months
             |          - (CAST(s1 AS DOUBLE)/n_months)*(CAST(s1 AS DOUBLE)/n_months),
             |        CAST(0 AS DOUBLE)))
             |      / (CAST(s1 AS DOUBLE)/n_months) * 10000 + 0.5) AS BIGINT) AS cv_bp
             |  FROM per)
             |SELECT p.p_brand, CASE WHEN cv_bp <= 5000 THEN 'X'
             |    WHEN cv_bp <= 10000 THEN 'Y' ELSE 'Z' END AS xyz,
             |  COUNT(*) AS n_parts,
             |  CAST(SUM(cv_bp) // COUNT(*) AS BIGINT) AS avg_cv_bp
             |FROM classed c JOIN part p ON p.p_partkey = c.l_partkey
             |GROUP BY 1, 2""".stripMargin)
    ),

    // FUNNEL STEP-LAG percentiles — the latency companion to
    // events_funnel's conversion counts: per step pair, how long users
    // take from their FIRST upstream event to their first later
    // downstream event (p50/p90). Per-user firsts are one pivot agg;
    // the pair lags explode from a literal 3-element array on the
    // single user-keyed join; quantiles ride GroupedPercentile.exact
    // over hour buckets (bounded memory at any user count).
    "events_funnel_lag_percentiles" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
          expr("(ts div 1000)").as("us"))
        val firsts = ev.groupBy(col("user_id")).agg(
          min(when(col("event_type") === "view", col("us"))).as("fa_view"),
          min(when(col("event_type") === "click", col("us"))).as("fa_click"),
          min(when(col("event_type") === "signup", col("us"))).as("fa_signup"))
        val ul = graft.Caches.scoped(ev.join(firsts, Seq("user_id"))
          .select(col("user_id"),
            explode(array(
              struct(lit("view->click").as("pair"),
                when(col("event_type") === "click" && col("us") > col("fa_view"),
                  col("us") - col("fa_view")).as("lag")),
              struct(lit("click->signup").as("pair"),
                when(col("event_type") === "signup" && col("us") > col("fa_click"),
                  col("us") - col("fa_click")).as("lag")),
              struct(lit("signup->purchase").as("pair"),
                when(col("event_type") === "purchase" && col("us") > col("fa_signup"),
                  col("us") - col("fa_signup")).as("lag")))).as("pl"))
          .select(col("user_id"), col("pl.pair").as("pair"), col("pl.lag").as("lag"))
          .filter(col("lag").isNotNull)
          .groupBy(col("pair"), col("user_id")).agg(min(col("lag")).as("lag"))
          .select(col("pair"), col("lag")))
        val pcts = GroupedPercentile.exact(ul, "pair", "lag",
            Seq(("p50", 0.50), ("p90", 0.90)),
            expr("lag div 3600000000"), _.cast("double"))
          .withColumn("res", round(col("res"), 4))
          .groupBy(col("pair"))
          .agg(max(when(col("pname") === "p50", col("res"))).as("p50_us"),
            max(when(col("pname") === "p90", col("res"))).as("p90_us"))
        val counts = ul.groupBy(col("pair")).agg(count(lit(1)).as("n_users"))
        pcts.join(counts, Seq("pair"))
          .select(col("pair"), col("n_users"), col("p50_us"), col("p90_us"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
             |f AS (SELECT user_id,
             |        MIN(CASE WHEN event_type='view' THEN us END) AS fa_view,
             |        MIN(CASE WHEN event_type='click' THEN us END) AS fa_click,
             |        MIN(CASE WHEN event_type='signup' THEN us END) AS fa_signup
             |      FROM e GROUP BY 1),
             |l AS (
             |  SELECT 'view->click' AS pair, e.user_id, MIN(e.us - f.fa_view) AS lag
             |  FROM e JOIN f USING (user_id)
             |  WHERE e.event_type = 'click' AND e.us > f.fa_view GROUP BY 1, 2
             |  UNION ALL
             |  SELECT 'click->signup', e.user_id, MIN(e.us - f.fa_click)
             |  FROM e JOIN f USING (user_id)
             |  WHERE e.event_type = 'signup' AND e.us > f.fa_click GROUP BY 1, 2
             |  UNION ALL
             |  SELECT 'signup->purchase', e.user_id, MIN(e.us - f.fa_signup)
             |  FROM e JOIN f USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.us > f.fa_signup GROUP BY 1, 2)
             |SELECT pair, COUNT(*) AS n_users,
             |  ROUND(quantile_cont(lag, 0.50), 4) AS p50_us,
             |  ROUND(quantile_cont(lag, 0.90), 4) AS p90_us
             |FROM l GROUP BY 1""".stripMargin)
    ),

    // POISSON RATE comparison across equal-exposure halves of the
    // error stream — the incident-rate regression check SRE runs after
    // a rollout: split the error events at the midpoint of their time
    // span (two exactly equal exposures by construction), then the
    // conditional test of equal rates reduces to the binomial normal
    // approximation z = (k1 - k2)/sqrt(k1 + k2). Counts are exact
    // integers from one partial agg + a broadcast scalar midpoint; z
    // is the single terminal double.
    "agg_poisson_rate_test" -> Query(
      (s, d) => {
        val er = Tables.events(s, d).filter(col("event_type") === "error")
          .select(expr("(ts div 1000)").as("us"))
        val mm = er.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
        val g = er.crossJoin(broadcast(mm))
          .select((col("us") * 2 <= col("lo") + col("hi")).cast("long").as("h1"))
          .agg(sum(col("h1")).as("k1"),
            (count(lit(1)) - sum(col("h1"))).as("k2"))
        g.select(col("k1"), col("k2"),
            round((col("k1") - col("k2")).cast("double") /
              sqrt((col("k1") + col("k2")).cast("double")), 4).as("z"))
          .withColumn("significant", (abs(col("z")) > 1.96).cast("long"))
      },
      Some("""WITH er AS (SELECT epoch_us(ts) AS us FROM events
             |            WHERE event_type = 'error'),
             |mm AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM er),
             |g AS (SELECT
             |    CAST(SUM(CASE WHEN us * 2 <= lo + hi THEN 1 ELSE 0 END) AS BIGINT) AS k1,
             |    CAST(SUM(CASE WHEN us * 2 <= lo + hi THEN 0 ELSE 1 END) AS BIGINT) AS k2
             |  FROM er CROSS JOIN mm)
             |SELECT k1, k2,
             |  ROUND(CAST(k1 - k2 AS DOUBLE) / sqrt(CAST(k1 + k2 AS DOUBLE)), 4) AS z,
             |  CAST(abs(ROUND(CAST(k1 - k2 AS DOUBLE)
             |    / sqrt(CAST(k1 + k2 AS DOUBLE)), 4)) > 1.96 AS BIGINT) AS significant
             |FROM g""".stripMargin)
    ),

    // EVENT-TIME DISORDER profile — the empirical input to every
    // watermark decision: within each (event type, day) shard, replay
    // events in ARRIVAL order and measure how far each event's
    // timestamp lags the running event-time maximum seen so far. The
    // out-of-order share plus the p50/p99 lateness of late events IS
    // the allowed-lateness setting a streaming job should use. The
    // generator's ingest sequence is perfectly time-ordered (verified:
    // zero inversions), so arrival = event time + a DETERMINISTIC
    // md5-salted ingest jitter of 0-120s — the documented network-delay
    // model both engines replay bit-identically (same salted-hash
    // family as the samplers). The running-max window partitions on
    // (type, event-time day) — calendar-bounded shards, no hot single
    // partition — and the quantiles ride GroupedPercentile.exact over
    // minute buckets. All lateness values are exact integer micros.
    "events_disorder_profile" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("event_type"), col("day"))
          .orderBy(col("arr"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ev = graft.Caches.scoped(Tables.events(s, d)
          .select(col("event_type"), col("event_id"), expr("(ts div 1000)").as("us"))
          .withColumn("arr", col("us") +
            graft.functions.Hashing.md5Long60(
              concat(lit("jit_"), col("event_id").cast("string"))) % 120000000L)
          .withColumn("day", expr("us div 86400000000"))
          .withColumn("late",
            when(max(col("us")).over(w) > col("us"),
              max(col("us")).over(w) - col("us"))))
        val stats = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("late").isNotNull, 1L).otherwise(0L)).as("n_late"))
          .withColumn("late_bp", expr("n_late * 10000 div n_events"))
        val pcts = GroupedPercentile.exact(
            ev.filter(col("late").isNotNull).select(col("event_type"), col("late")),
            "event_type", "late", Seq(("p50", 0.50), ("p99", 0.99)),
            expr("late div 60000000"), _.cast("double"))
          .withColumn("res", round(col("res"), 4))
          .groupBy(col("event_type"))
          .agg(max(when(col("pname") === "p50", col("res"))).as("p50_late_us"),
            max(when(col("pname") === "p99", col("res"))).as("p99_late_us"))
        stats.join(pcts, Seq("event_type"), "left")
          .select(col("event_type"), col("n_events"), col("n_late"),
            col("late_bp"), col("p50_late_us"), col("p99_late_us"))
      },
      Some("""WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us,
             |             epoch_us(ts)
             |               + CAST('0x' || substr(md5('jit_' || CAST(event_id AS VARCHAR)), 1, 15)
             |                      AS BIGINT) % 120000000 AS arr,
             |             epoch_us(ts) // 86400000000 AS day
             |           FROM events),
             |l AS (SELECT event_type, us,
             |        CASE WHEN MAX(us) OVER w > us THEN MAX(us) OVER w - us END AS late
             |      FROM e
             |      WINDOW w AS (PARTITION BY event_type, day ORDER BY arr, event_id
             |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |st AS (SELECT event_type, COUNT(*) AS n_events,
             |         CAST(SUM(CASE WHEN late IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |           AS n_late
             |       FROM l GROUP BY 1),
             |p AS (SELECT event_type,
             |        ROUND(quantile_cont(late, 0.50), 4) AS p50_late_us,
             |        ROUND(quantile_cont(late, 0.99), 4) AS p99_late_us
             |      FROM l WHERE late IS NOT NULL GROUP BY 1)
             |SELECT st.event_type, st.n_events, st.n_late,
             |  CAST(st.n_late * 10000 // st.n_events AS BIGINT) AS late_bp,
             |  p.p50_late_us, p.p99_late_us
             |FROM st LEFT JOIN p USING (event_type)""".stripMargin)
    ),

    // HASH-DETERMINISTIC POISSON BOOTSTRAP CI for the mean order value —
    // the way a warehouse actually bootstraps 100 TB (Poisson/online
    // bootstrap: no resample materialization, each row carries a
    // per-resample multiplicity): B=16 resamples ride ONE exploded
    // literal; each row's weight in resample b is Binomial(4, 1/4)
    // (mean 1 — the documented Poisson(1) stand-in) from salted md5
    // draws, so both engines replay the identical resampling. Each
    // resample mean is an exact-integer weighted sum; the nearest-rank
    // p5/p95 of the 16 means (indexes 1 and 15) bound the CI. One
    // map-side-combinable 16-group shuffle — the 16x row fan-out is
    // the entire cost, at any scale.
    "agg_bootstrap_ci" -> Query(
      (s, d) => {
        val base = Tables.orders(s, d).select(col("o_orderkey"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        val stats = base.agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
        // repartition before the 16x explode: B*n md5 draws off a
        // ~1-split scan would otherwise hash on one core (the pair-
        // family rule — the small exchange is amortized by the fan-out).
        // The partition count is EXPLICIT: the exchange's byte size is
        // tiny relative to its downstream CPU, so AQE would coalesce a
        // plain repartition(col) right back to ~1 task (round-11's
        // AQE-compounding note; event-log measured it)
        val w = base.repartition(s.sparkContext.defaultParallelism, col("o_orderkey"))
          .select(col("o_orderkey"), col("cents"),
            explode(sequence(lit(0), lit(15))).as("b"))
          .withColumn("h", graft.functions.Hashing.md5Long60(concat(lit("bs_"),
            col("b").cast("string"), lit("_"), col("o_orderkey").cast("string"))))
          // 4 Bernoulli(1/4) draws from disjoint bit pairs of ONE hash
          // (4 md5s/row measured 4x the whole query's cost)
          .withColumn("w", (0 until 4).map { j =>
            (shiftright(col("h"), 2 * j).bitwiseAND(3) === 0).cast("long")
          }.reduce(_ + _))
        val m = w.groupBy(col("b"))
          .agg((sum(col("w") * col("cents")).cast("double") / 100.0 / sum(col("w")))
            .as("mb"))
        val g = m.agg(sort_array(collect_list(col("mb"))).as("ms"))
        stats.crossJoin(g).select(col("n"),
          round(col("sc").cast("double") / 100.0 / col("n"), 4).as("mean"),
          round(element_at(col("ms"), 1), 4).as("ci_lo"),
          round(element_at(col("ms"), 15), 4).as("ci_hi"))
      },
      Some("""WITH base AS (SELECT o_orderkey,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |  FROM orders),
             |bb AS (SELECT unnest(generate_series(0, 15)) AS b),
             |hh AS (SELECT b, cents,
             |    CAST('0x' || substr(md5('bs_' || CAST(b AS VARCHAR) || '_' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
             |  FROM base CROSS JOIN bb),
             |w AS (SELECT b, cents,
             |    CAST((h // 1) % 4 = 0 AS INT) + CAST((h // 4) % 4 = 0 AS INT)
             |  + CAST((h // 16) % 4 = 0 AS INT) + CAST((h // 64) % 4 = 0 AS INT) AS w
             |  FROM hh),
             |m AS (SELECT b, CAST(SUM(w * cents) AS DOUBLE) / 100.0
             |               / CAST(SUM(w) AS BIGINT) AS mb
             |      FROM w GROUP BY 1),
             |g AS (SELECT list(mb ORDER BY mb) AS ms FROM m),
             |s AS (SELECT COUNT(*) AS n, CAST(SUM(cents) AS DOUBLE) / 100.0 / COUNT(*) AS mean
             |      FROM base)
             |SELECT s.n, ROUND(s.mean, 4) AS mean,
             |  ROUND(g.ms[1], 4) AS ci_lo, ROUND(g.ms[15], 4) AS ci_hi
             |FROM s CROSS JOIN g""".stripMargin)
    ),

    // CUME_DIST completeness — the one rank-family member the other
    // window ops don't cover: the fraction of peers at or below each
    // value band, ties sharing the last-peer rank. The ratio is an
    // exact int/int division (identical bits both engines), rounded
    // only against ulp paranoia. Status-partitioned window, no global
    // sort.
    "window_cume_dist" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("band"))
        Tables.orders(s, d)
          .withColumn("band", floor(col("o_totalprice") / 10000).cast("long"))
          .select(col("o_orderkey"), col("o_orderstatus"), col("band"),
            round(cume_dist().over(w), 6).as("cd"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, band,
             |  ROUND(CUME_DIST() OVER (PARTITION BY o_orderstatus ORDER BY band), 6) AS cd
             |FROM (SELECT *, CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS band
             |      FROM orders)""".stripMargin)
    ),

    // POSITION-BASED (U-shaped) multi-touch attribution — the 40/20/40
    // credit model next to events_attribution's last-touch: every click
    // in the 7-day lookback of a purchase gets basis-point credit by
    // PATH POSITION (first 4000, last 4000, middles split 2000 by
    // integer division; solo touch 10000, pair 5000/5000). Channels
    // derive deterministically from the props payload (k mod 4). The
    // click-purchase join is user-keyed with the lookback bounding the
    // fanout; the position windows partition per purchase (lookback-
    // bounded frames). All credits are exact integers.
    "events_attribution_position" -> Query(
      (s, d) => {
        val lookbackUs = 7L * 86400 * 1000000
        val ev = Tables.events(s, d)
        val cl = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            expr("ts div 1000").as("cus"),
            concat(lit("ch"),
              (get_json_object(col("props"), "$.k").cast("long") % 4)
                .cast("string")).as("ch"))
        val pu = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            expr("ts div 1000").as("pus"))
        val j = cl.join(pu, Seq("user_id"))
          .filter(col("cus") < col("pus") &&
            col("pus") - col("cus") <= lookbackUs)
        val wc = Window.partitionBy(col("purchase_id"))
        val wr = Window.partitionBy(col("purchase_id"))
          .orderBy(col("cus"), col("click_id"))
        val t = j.withColumn("k", count(lit(1)).over(wc))
          .withColumn("rn", row_number().over(wr).cast("long"))
          .withColumn("credit_bp",
            when(col("k") === 1, 10000L)
              .when(col("k") === 2, 5000L)
              .when(col("rn") === 1 || col("rn") === col("k"), 4000L)
              .otherwise(expr("2000 div (k - 2)")))
        t.groupBy(col("ch"))
          .agg(count(lit(1)).as("n_touches"),
            sum(col("credit_bp")).as("credit_total_bp"),
            countDistinct(col("purchase_id")).as("n_conversions"))
      },
      Some("""WITH cl AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS cus,
             |        'ch' || CAST(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 4
             |                     AS VARCHAR) AS ch
             |      FROM events WHERE event_type = 'click'),
             |pu AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pus
             |       FROM events WHERE event_type = 'purchase'),
             |j AS (SELECT cl.*, pu.purchase_id
             |      FROM cl JOIN pu ON pu.user_id = cl.user_id
             |      WHERE cl.cus < pu.pus AND pu.pus - cl.cus <= 604800000000),
             |t AS (SELECT ch, purchase_id,
             |        COUNT(*) OVER (PARTITION BY purchase_id) AS k,
             |        ROW_NUMBER() OVER (PARTITION BY purchase_id
             |                           ORDER BY cus, click_id) AS rn
             |      FROM j),
             |c AS (SELECT ch, purchase_id,
             |        CASE WHEN k = 1 THEN 10000
             |             WHEN k = 2 THEN 5000
             |             WHEN rn = 1 OR rn = k THEN 4000
             |             ELSE 2000 // (k - 2) END AS credit_bp
             |      FROM t)
             |SELECT ch, COUNT(*) AS n_touches,
             |  CAST(SUM(credit_bp) AS BIGINT) AS credit_total_bp,
             |  COUNT(DISTINCT purchase_id) AS n_conversions
             |FROM c GROUP BY 1""".stripMargin)
    ),

    // WILCOXON SIGNED-RANK — the PAIRED companion to agg_mannwhitney:
    // does each part's demand differ between even and odd calendar
    // months (a seasonality screen robust to outlier parts)? The
    // paired difference per part folds to |d|-value level first, so
    // the rank window is value-distinct-sized; tie-averaged ranks ride
    // the same 2x-integer trick (W+ exact), zero differences drop per
    // the standard procedure, and the tie-corrected normal z is the
    // terminal double. cnt^3 through DECIMAL(38)/HUGEINT.
    "agg_wilcoxon_signed" -> Query(
      (s, d) => {
        val monthly = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(sum(when(month(col("l_shipdate")) % 2 === 0,
              floor(col("l_quantity") + 0.5).cast("long")).otherwise(0L)).as("qe"),
            sum(when(month(col("l_shipdate")) % 2 === 1,
              floor(col("l_quantity") + 0.5).cast("long")).otherwise(0L)).as("qo"))
          .select((col("qe") - col("qo")).as("dd"))
          .filter(col("dd") =!= 0)
        val v = monthly.groupBy(abs(col("dd")).as("ad"))
          .agg(count(lit(1)).as("cnt"),
            sum((col("dd") > 0).cast("long")).as("cpos"))
        val wo = Window.orderBy(col("ad"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ranked = v.withColumn("cumlo",
          coalesce(sum(col("cnt")).over(wo), lit(0L)))
        val g = ranked.agg(
          sum(col("cnt")).as("n"),
          // decimal(38) route for the n^2-scale signed-rank product
          sum(col("cpos").cast("decimal(38,0)")
            * (lit(2) * col("cumlo") + col("cnt") + 1)).cast("long").as("wp2"),
          sum(col("cnt").cast("decimal(38,0)") * col("cnt") * col("cnt")
            - col("cnt")).cast("double").as("ties"))
        // E[2W+] = n(n+1)/2; Var[W+] = n(n+1)(2n+1)/24 - ties/48
        g.select(col("n"), col("wp2"),
            round((col("wp2") - col("n") * (col("n") + 1) / 2).cast("double") /
              (lit(2.0) * sqrt(
                col("n").cast("double") * (col("n") + 1) * (col("n") * 2 + 1) / 24.0 -
                  col("ties") / 48.0)), 4).as("z"))
          .withColumn("significant", (abs(col("z")) > 1.96).cast("long"))
      },
      Some("""WITH m AS (SELECT l_partkey,
             |    SUM(CASE WHEN month(l_shipdate) % 2 = 0
             |             THEN CAST(floor(l_quantity + 0.5) AS BIGINT) ELSE 0 END)
             |  - SUM(CASE WHEN month(l_shipdate) % 2 = 1
             |             THEN CAST(floor(l_quantity + 0.5) AS BIGINT) ELSE 0 END) AS dd
             |  FROM lineitem GROUP BY 1),
             |nz AS (SELECT dd FROM m WHERE dd <> 0),
             |v AS (SELECT abs(dd) AS ad, COUNT(*) AS cnt,
             |        CAST(SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cpos
             |      FROM nz GROUP BY 1),
             |r AS (SELECT *, COALESCE(SUM(cnt) OVER (ORDER BY ad
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumlo
             |      FROM v),
             |g AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             |        CAST(SUM(CAST(cpos AS HUGEINT) * (2*cumlo + cnt + 1)) AS BIGINT) AS wp2,
             |        CAST(SUM(CAST(cnt AS HUGEINT)*cnt*cnt - cnt) AS DOUBLE) AS ties
             |      FROM r)
             |SELECT n, wp2,
             |  ROUND(CAST(wp2 - n*(n+1)/2 AS DOUBLE)
             |    / (2.0 * sqrt(CAST(n AS DOUBLE)*(n+1)*(2*n+1)/24.0 - ties/48.0)), 4) AS z,
             |  CAST(abs(ROUND(CAST(wp2 - n*(n+1)/2 AS DOUBLE)
             |    / (2.0 * sqrt(CAST(n AS DOUBLE)*(n+1)*(2*n+1)/24.0 - ties/48.0)), 4))
             |    > 1.96 AS BIGINT) AS significant
             |FROM g""".stripMargin)
    ),

    // SPEARMAN rank correlation of quantity vs discount — the
    // robust-correlation companion to agg_corr (Pearson): tie-averaged
    // midranks for BOTH variables come from the marginals of one
    // (qk, dk) cell fold (~550 cells), so the whole computation after
    // the first partial agg runs over a constant-size contingency
    // table at any fact size. Midranks ride the 2x-integer trick
    // (rank doubling cancels in the correlation), every weighted
    // power sum is an exact DECIMAL(38)/HUGEINT, and the Pearson
    // formula over midranks is the one terminal double.
    "agg_spearman_corr" -> Query(
      (s, d) => {
        val cells = Tables.lineitem(s, d)
          .groupBy(floor(col("l_quantity") + 0.5).cast("long").as("qk"),
            floor(col("l_discount") * 100 + 0.5).cast("long").as("dk"))
          .agg(count(lit(1)).as("w"))
        def midranks(key: String, rname: String) = {
          val wo = Window.orderBy(col(key))
            .rowsBetween(Window.unboundedPreceding, -1)
          cells.groupBy(col(key)).agg(sum(col("w")).as("c"))
            .withColumn("cumlo", coalesce(sum(col("c")).over(wo), lit(0L)))
            .select(col(key), (lit(2) * col("cumlo") + col("c") + 1).as(rname))
        }
        val t = cells
          .join(broadcast(midranks("qk", "rq")), Seq("qk"))
          .join(broadcast(midranks("dk", "rd")), Seq("dk"))
        val g = t.agg(
          sum(col("w")).as("n"),
          sum(col("w").cast("decimal(38,0)") * col("rq")).as("sa"),
          sum(col("w").cast("decimal(38,0)") * col("rd")).as("sb"),
          sum(col("w").cast("decimal(38,0)") * col("rq") * col("rd")).as("sab"),
          sum(col("w").cast("decimal(38,0)") * col("rq") * col("rq")).as("saa"),
          sum(col("w").cast("decimal(38,0)") * col("rd") * col("rd")).as("sbb"))
        g.select(col("n"),
            round((col("n").cast("double") * col("sab").cast("double") -
                col("sa").cast("double") * col("sb").cast("double")) /
              sqrt((col("n").cast("double") * col("saa").cast("double") -
                  col("sa").cast("double") * col("sa").cast("double")) *
                (col("n").cast("double") * col("sbb").cast("double") -
                  col("sb").cast("double") * col("sb").cast("double"))), 6)
              .as("spearman"))
      },
      Some("""WITH cells AS (
             |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS qk,
             |    CAST(floor(l_discount*100 + 0.5) AS BIGINT) AS dk,
             |    COUNT(*) AS w
             |  FROM lineitem GROUP BY 1, 2),
             |mq AS (SELECT qk, 2*COALESCE(SUM(c) OVER (ORDER BY qk
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS rq
             |       FROM (SELECT qk, SUM(w) AS c FROM cells GROUP BY 1)),
             |md AS (SELECT dk, 2*COALESCE(SUM(c) OVER (ORDER BY dk
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS rd
             |       FROM (SELECT dk, SUM(w) AS c FROM cells GROUP BY 1)),
             |t AS (SELECT cells.w, mq.rq, md.rd
             |      FROM cells JOIN mq USING (qk) JOIN md USING (dk)),
             |g AS (SELECT SUM(w) AS n,
             |        SUM(CAST(w AS HUGEINT) * rq) AS sa,
             |        SUM(CAST(w AS HUGEINT) * rd) AS sb,
             |        SUM(CAST(w AS HUGEINT) * rq * rd) AS sab,
             |        SUM(CAST(w AS HUGEINT) * rq * rq) AS saa,
             |        SUM(CAST(w AS HUGEINT) * rd * rd) AS sbb
             |      FROM t)
             |SELECT CAST(n AS BIGINT) AS n,
             |  ROUND((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
             |         - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
             |    / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
             |            - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
             |         * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
             |            - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6) AS spearman
             |FROM g""".stripMargin)
    ),

    // KENDALL tau-b of quantity vs discount — the pair-concordance
    // view of the same association: concordant/discordant mass comes
    // from the CELL-PAIR join of the ~550-cell contingency table
    // (strictly-greater in both coordinates), so the O(cells^2) work
    // is CONSTANT in the fact size — the reason engines compute tau
    // from contingency cells and never from row pairs. Tie terms use
    // the standard n0/n1/n2 closed forms; everything is exact
    // DECIMAL(38)/HUGEINT until the terminal tau-b double.
    "agg_kendall_tau" -> Query(
      (s, d) => {
        val cells = graft.Caches.scoped(Tables.lineitem(s, d)
          .groupBy(floor(col("l_quantity") + 0.5).cast("long").as("qk"),
            floor(col("l_discount") * 100 + 0.5).cast("long").as("dk"))
          .agg(count(lit(1)).as("w")))
        val b = cells.select(col("qk").as("qb"), col("dk").as("db"),
          col("w").as("wb"))
        val conc = cells.join(b, col("qb") > col("qk") && col("db") > col("dk"))
          .agg(coalesce(sum(col("w").cast("decimal(38,0)") * col("wb")),
            lit(0).cast("decimal(38,0)")).as("cc"))
        val disc = cells.join(b, col("qb") > col("qk") && col("db") < col("dk"))
          .agg(coalesce(sum(col("w").cast("decimal(38,0)") * col("wb")),
            lit(0).cast("decimal(38,0)")).as("dd"))
        val ties = cells.agg(sum(col("w")).as("n"))
        val tq = cells.groupBy(col("qk")).agg(sum(col("w")).as("c"))
          .agg(sum(col("c").cast("decimal(38,0)") * (col("c") - 1)).as("t1x2"))
        val td = cells.groupBy(col("dk")).agg(sum(col("w")).as("c"))
          .agg(sum(col("c").cast("decimal(38,0)") * (col("c") - 1)).as("t2x2"))
        val g = ties.crossJoin(broadcast(conc)).crossJoin(broadcast(disc))
          .crossJoin(broadcast(tq)).crossJoin(broadcast(td))
        // n0, n1, n2 doubled (x2) so every term stays integral
        g.select(col("n"), col("cc").cast("double").as("concordant"),
            col("dd").cast("double").as("discordant"),
            (col("n").cast("decimal(38,0)") * (col("n") - 1)).as("n0x2"),
            col("t1x2"), col("t2x2"))
          .select(col("n"),
            round((col("concordant") - col("discordant")) /
              sqrt((col("n0x2").cast("double") - col("t1x2").cast("double")) / 2.0 *
                ((col("n0x2").cast("double") - col("t2x2").cast("double")) / 2.0)), 6)
              .as("tau_b"))
      },
      Some("""WITH cells AS (
             |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS qk,
             |    CAST(floor(l_discount*100 + 0.5) AS BIGINT) AS dk,
             |    COUNT(*) AS w
             |  FROM lineitem GROUP BY 1, 2),
             |conc AS (SELECT COALESCE(SUM(CAST(a.w AS HUGEINT) * b.w), 0) AS cc
             |         FROM cells a JOIN cells b ON b.qk > a.qk AND b.dk > a.dk),
             |disc AS (SELECT COALESCE(SUM(CAST(a.w AS HUGEINT) * b.w), 0) AS dd
             |         FROM cells a JOIN cells b ON b.qk > a.qk AND b.dk < a.dk),
             |nn AS (SELECT SUM(w) AS n FROM cells),
             |t1 AS (SELECT SUM(CAST(c AS HUGEINT) * (c - 1)) AS t1x2
             |       FROM (SELECT qk, SUM(w) AS c FROM cells GROUP BY 1)),
             |t2 AS (SELECT SUM(CAST(c AS HUGEINT) * (c - 1)) AS t2x2
             |       FROM (SELECT dk, SUM(w) AS c FROM cells GROUP BY 1))
             |SELECT CAST(nn.n AS BIGINT) AS n,
             |  ROUND((CAST(conc.cc AS DOUBLE) - CAST(disc.dd AS DOUBLE))
             |    / sqrt((CAST(CAST(nn.n AS HUGEINT) * (nn.n - 1) AS DOUBLE)
             |            - CAST(t1.t1x2 AS DOUBLE)) / 2.0
             |         * ((CAST(CAST(nn.n AS HUGEINT) * (nn.n - 1) AS DOUBLE)
             |            - CAST(t2.t2x2 AS DOUBLE)) / 2.0)), 6) AS tau_b
             |FROM nn CROSS JOIN conc CROSS JOIN disc CROSS JOIN t1 CROSS JOIN t2""".stripMargin)
    ),

    // WINDOW FUNNEL (the ClickHouse windowFunnel shape): deepest
    // view -> click -> purchase chain completed within 3 DAYS of the
    // STARTING view, chains greedy-earliest per start. Differs from
    // events_funnel (first-ever chain, unbounded) in both the sliding
    // deadline and the per-start maximization. Each stage is a
    // user-keyed join whose fanout the window bounds; depth rolls up
    // to a histogram. No data-sized windows, no unkeyed joins.
    "events_window_funnel" -> Query(
      (s, d) => {
        val winUs = 3L * 86400 * 1000000
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
        val v = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("tus").as("v_us"))
        val c2 = v.join(ev.filter(col("event_type") === "click")
              .select(col("user_id"), col("tus").as("c_us")), Seq("user_id"))
          .filter(col("c_us") > col("v_us") && col("c_us") <= col("v_us") + winUs)
          .groupBy(col("user_id"), col("v_us")).agg(min(col("c_us")).as("c_us"))
        val c3 = c2.join(ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("tus").as("p_us")), Seq("user_id"))
          .filter(col("p_us") > col("c_us") && col("p_us") <= col("v_us") + winUs)
          .groupBy(col("user_id"), col("v_us")).agg(min(col("p_us")).as("p_us"))
        val depth = v.select(col("user_id"), lit(1L).as("dep"))
          .unionByName(c2.select(col("user_id"), lit(2L).as("dep")))
          .unionByName(c3.select(col("user_id"), lit(3L).as("dep")))
          .groupBy(col("user_id")).agg(max(col("dep")).as("depth"))
        depth.groupBy(col("depth")).agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
             |v AS (SELECT user_id, tus AS v_us FROM ev WHERE event_type = 'view'),
             |c2 AS (SELECT v.user_id, v.v_us, MIN(e.tus) AS c_us
             |       FROM v JOIN ev e ON e.user_id = v.user_id
             |       WHERE e.event_type = 'click' AND e.tus > v.v_us
             |         AND e.tus <= v.v_us + 259200000000
             |       GROUP BY 1, 2),
             |c3 AS (SELECT c2.user_id, c2.v_us, MIN(e.tus) AS p_us
             |       FROM c2 JOIN ev e ON e.user_id = c2.user_id
             |       WHERE e.event_type = 'purchase' AND e.tus > c2.c_us
             |         AND e.tus <= c2.v_us + 259200000000
             |       GROUP BY 1, 2),
             |depth AS (SELECT user_id, MAX(dep) AS depth FROM (
             |    SELECT user_id, 1 AS dep FROM v
             |    UNION ALL SELECT user_id, 2 FROM c2
             |    UNION ALL SELECT user_id, 3 FROM c3)
             |  GROUP BY 1)
             |SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_users
             |FROM depth GROUP BY 1""".stripMargin)
    ),

    // RATIO-METRIC delta-method CI — how experimentation platforms put
    // error bars on "revenue per purchase"-style ratios where both
    // numerator and denominator are per-user random sums: R = Σx/Σy,
    // Var(R) ≈ (Var x - 2R Cov(x,y) + R² Var y) / (n ȳ²). All five
    // moment sums are exact DECIMALs from ONE user-level fold; the
    // delta formula is terminal double arithmetic, identical in the
    // oracle.
    "agg_ratio_delta_method" -> Query(
      (s, d) => {
        val u = Tables.events(s, d).filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sum(col("value").cast("decimal(18,6)")).as("x"),
            count(lit(1)).as("y"))
        val g = u.agg(
          count(lit(1)).as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum((col("x") * col("x")).cast("decimal(38,12)")).cast("double").as("sxx"),
          sum(col("y") * col("y")).cast("double").as("syy"),
          sum((col("x") * col("y")).cast("decimal(38,6)")).cast("double").as("sxy"))
        val n = col("n").cast("double")
        val r = col("sx") / col("sy")
        val vx = col("sxx") / n - (col("sx") / n) * (col("sx") / n)
        val vy = col("syy") / n - (col("sy") / n) * (col("sy") / n)
        val cxy = col("sxy") / n - (col("sx") / n) * (col("sy") / n)
        val ybar = col("sy") / n
        val se = sqrt((vx - lit(2.0) * r * cxy + r * r * vy) / n) / ybar
        g.select(col("n"), round(r, 6).as("ratio"), round(se, 6).as("se"),
          round(r - lit(1.96) * se, 6).as("ci_lo"),
          round(r + lit(1.96) * se, 6).as("ci_hi"))
      },
      Some("""WITH u AS (SELECT user_id,
             |    SUM(CAST(value AS DECIMAL(18,6))) AS x, COUNT(*) AS y
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |g AS (SELECT COUNT(*) AS n,
             |    CAST(SUM(x) AS DOUBLE) AS sx,
             |    CAST(SUM(y) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             |    CAST(SUM(y * y) AS DOUBLE) AS syy,
             |    CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy
             |  FROM u),
             |f AS (SELECT n, sx, sy, sxx, syy, sxy,
             |    CAST(n AS DOUBLE) AS nd, sx / sy AS r, sy / CAST(n AS DOUBLE) AS ybar
             |  FROM g)
             |SELECT n, ROUND(r, 6) AS ratio,
             |  ROUND(sqrt((sxx/nd - (sx/nd)*(sx/nd)
             |              - 2.0 * r * (sxy/nd - (sx/nd)*(sy/nd))
             |              + r * r * (syy/nd - (sy/nd)*(sy/nd))) / nd) / ybar, 6) AS se,
             |  ROUND(r - 1.96 * (sqrt((sxx/nd - (sx/nd)*(sx/nd)
             |              - 2.0 * r * (sxy/nd - (sx/nd)*(sy/nd))
             |              + r * r * (syy/nd - (sy/nd)*(sy/nd))) / nd) / ybar), 6) AS ci_lo,
             |  ROUND(r + 1.96 * (sqrt((sxx/nd - (sx/nd)*(sx/nd)
             |              - 2.0 * r * (sxy/nd - (sx/nd)*(sy/nd))
             |              + r * r * (syy/nd - (sy/nd)*(sy/nd))) / nd) / ybar), 6) AS ci_hi
             |FROM f""".stripMargin)
    ),

    // NET REVENUE RETENTION by first-order-year cohort — the
    // revenue-weighted complement of orders_repeat_cohort's count
    // rates: each cohort's year-k revenue against its year-(k-1)
    // revenue, in exact integer cents with a bp ratio. Two user-keyed
    // partial aggs (cohort assignment, cohort-year revenue) and a lag
    // window over the ≤|years| rows per cohort.
    "orders_cohort_nrr" -> Query(
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        val cohort = o.groupBy(col("o_custkey")).agg(min(col("yr")).as("cohort"))
        val cy = o.join(cohort, Seq("o_custkey"))
          .groupBy(col("cohort"), col("yr"))
          .agg(sum(col("cents")).as("rev_c"),
            countDistinct(col("o_custkey")).as("n_active"))
        val w = Window.partitionBy(col("cohort")).orderBy(col("yr"))
        cy.withColumn("prev_rev_c", lag(col("rev_c"), 1).over(w))
          .withColumn("prev_yr", lag(col("yr"), 1).over(w))
          .filter(col("prev_rev_c").isNotNull && col("prev_yr") === col("yr") - 1)
          .select(col("cohort"), col("yr"), col("n_active"), col("rev_c"),
            col("prev_rev_c"),
            expr("rev_c * 10000 div prev_rev_c").as("nrr_bp"))
      },
      Some("""WITH o AS (SELECT o_custkey,
             |    CAST(year(o_orderdate) AS BIGINT) AS yr,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |  FROM orders),
             |ch AS (SELECT o_custkey, MIN(yr) AS cohort FROM o GROUP BY 1),
             |cy AS (SELECT ch.cohort, o.yr,
             |         CAST(SUM(o.cents) AS BIGINT) AS rev_c,
             |         COUNT(DISTINCT o.o_custkey) AS n_active
             |       FROM o JOIN ch USING (o_custkey) GROUP BY 1, 2),
             |lg AS (SELECT *,
             |         LAG(rev_c) OVER (PARTITION BY cohort ORDER BY yr) AS prev_rev_c,
             |         LAG(yr) OVER (PARTITION BY cohort ORDER BY yr) AS prev_yr
             |       FROM cy)
             |SELECT cohort, yr, n_active, rev_c, prev_rev_c,
             |  CAST(rev_c * 10000 // prev_rev_c AS BIGINT) AS nrr_bp
             |FROM lg WHERE prev_rev_c IS NOT NULL AND prev_yr = yr - 1""".stripMargin)
    ),

    // GENERALIZED-ESD multiple-outlier screen (Rosner) on daily event
    // counts — the multi-anomaly upgrade of the single-pass z-score:
    // THREE rounds per type, each re-estimating mean/sd WITHOUT the
    // previously removed day (a masked outlier only surfaces once the
    // bigger one is out). Every round's candidate ships with its
    // round-4 z and a rejected flag vs the (simplified, documented)
    // constant lambda=2.0, so the audit trail is complete even on a
    // clean series. Moments come from exact integer/DECIMAL sums; the
    // per-round tables are |types| x |days| — calendar-bounded.
    "events_anomaly_esd" -> Query(
      (s, d) => {
        val series = graft.Caches.scoped(Tables.events(s, d)
          .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("c")))
        def zscored(rem: org.apache.spark.sql.DataFrame) = {
          val st = rem.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
              sum(col("c") * col("c")).as("s2"))
          rem.join(broadcast(st), Seq("event_type"))
            .withColumn("z", round(
              abs(col("c").cast("double") - col("s1").cast("double") / col("n")) /
                sqrt(greatest(col("s2").cast("double") / col("n") -
                  (col("s1").cast("double") / col("n")) *
                    (col("s1").cast("double") / col("n")), lit(1e-12))), 4))
        }
        def pick(rem: org.apache.spark.sql.DataFrame, r: Int) =
          zscored(rem)
            .withColumn("rn", row_number().over(
              Window.partitionBy(col("event_type"))
                .orderBy(col("z").desc, col("day"))))
            .filter(col("rn") === 1)
            .select(col("event_type"), col("day"), col("c"),
              lit(r.toLong).as("round"), col("z"),
              (col("z") > 2.0).cast("long").as("rejected"))
        val p1 = graft.Caches.scoped(pick(series, 1))
        val rem2 = series.join(p1.select(col("event_type"), col("day")),
          Seq("event_type", "day"), "left_anti")
        val p2 = graft.Caches.scoped(pick(rem2, 2))
        val rem3 = rem2.join(p2.select(col("event_type"), col("day")),
          Seq("event_type", "day"), "left_anti")
        val p3 = pick(rem3, 3)
        p1.unionByName(p2).unionByName(p3)
      },
      Some("""WITH series AS (
             |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |z1 AS (SELECT s.*, ROUND(abs(CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE)/n)
             |         / sqrt(GREATEST(CAST(s2 AS DOUBLE)/n
             |             - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n), 1e-12)), 4) AS z
             |       FROM series s JOIN (
             |         SELECT event_type, COUNT(*) AS n, SUM(c) AS s1, SUM(c*c) AS s2
             |         FROM series GROUP BY 1) g USING (event_type)),
             |p1 AS (SELECT event_type, day, c, CAST(1 AS BIGINT) AS round, z,
             |         CAST(z > 2.0 AS BIGINT) AS rejected
             |       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
             |               ORDER BY z DESC, day) AS rn FROM z1) WHERE rn = 1),
             |r2 AS (SELECT s.* FROM series s
             |       WHERE NOT EXISTS (SELECT 1 FROM p1
             |         WHERE p1.event_type = s.event_type AND p1.day = s.day)),
             |z2 AS (SELECT s.*, ROUND(abs(CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE)/n)
             |         / sqrt(GREATEST(CAST(s2 AS DOUBLE)/n
             |             - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n), 1e-12)), 4) AS z
             |       FROM r2 s JOIN (
             |         SELECT event_type, COUNT(*) AS n, SUM(c) AS s1, SUM(c*c) AS s2
             |         FROM r2 GROUP BY 1) g USING (event_type)),
             |p2 AS (SELECT event_type, day, c, CAST(2 AS BIGINT) AS round, z,
             |         CAST(z > 2.0 AS BIGINT) AS rejected
             |       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
             |               ORDER BY z DESC, day) AS rn FROM z2) WHERE rn = 1),
             |r3 AS (SELECT s.* FROM r2 s
             |       WHERE NOT EXISTS (SELECT 1 FROM p2
             |         WHERE p2.event_type = s.event_type AND p2.day = s.day)),
             |z3 AS (SELECT s.*, ROUND(abs(CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE)/n)
             |         / sqrt(GREATEST(CAST(s2 AS DOUBLE)/n
             |             - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n), 1e-12)), 4) AS z
             |       FROM r3 s JOIN (
             |         SELECT event_type, COUNT(*) AS n, SUM(c) AS s1, SUM(c*c) AS s2
             |         FROM r3 GROUP BY 1) g USING (event_type)),
             |p3 AS (SELECT event_type, day, c, CAST(3 AS BIGINT) AS round, z,
             |         CAST(z > 2.0 AS BIGINT) AS rejected
             |       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
             |               ORDER BY z DESC, day) AS rn FROM z3) WHERE rn = 1)
             |SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3"""
        .stripMargin)
    ),

    // FEATURE-LEAKAGE audit (training-serving skew) — the ML-ops gate
    // that catches "trained on tomorrow's feature": for every purchase
    // (the label event), compare the POINT-IN-TIME feature value (the
    // user's last view-event value strictly before the purchase — the
    // as-of last(ignoreNulls) idiom over one user-keyed sort) with the
    // user's CURRENT value (what naive training joins would leak).
    // Reported per label month: sample count, how many samples would
    // silently train on a different value than serving saw, and the
    // mean absolute drift — the mismatch share IS the leakage risk.
    // Diffs quantize to integer cents before summation.
    "etl_feature_leakage_audit" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("view", "purchase"))
          .select(col("user_id"), col("event_id"), col("value"),
            expr("ts div 1000").as("tus"),
            (col("event_type") === "purchase").cast("int").as("tag"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("tag"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val pit = ev
          .withColumn("pit_v",
            last(when(col("tag") === 0, col("value")), ignoreNulls = true).over(w))
          .filter(col("tag") === 1 && col("pit_v").isNotNull)
          .select(col("user_id"), col("tus"), col("pit_v"))
        val cur = ev.filter(col("tag") === 0)
          .groupBy(col("user_id"))
          .agg(max(struct(col("tus"), col("event_id"), col("value"))).as("m"))
          .select(col("user_id"), col("m.value").as("cur_v"))
        pit.join(cur, Seq("user_id"))
          .select(date_format(expr("cast((tus div 1000000) as timestamp)"), "yyyy-MM")
              .as("label_month"),
            (col("pit_v") =!= col("cur_v")).cast("long").as("leaky"),
            floor(abs(col("pit_v") - col("cur_v")) * 100 + 0.5).cast("long")
              .as("drift_c"))
          .groupBy(col("label_month"))
          .agg(count(lit(1)).as("n_samples"),
            sum(col("leaky")).as("n_leaky"),
            sum(col("drift_c")).as("drift_sum_c"))
          .select(col("label_month"), col("n_samples"), col("n_leaky"),
            expr("n_leaky * 10000 div n_samples").as("leak_bp"),
            expr("drift_sum_c div n_samples").as("mean_drift_c"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS tus,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS tag
             |  FROM events WHERE event_type IN ('view', 'purchase')),
             |p AS (SELECT user_id, tus, pit_v FROM (
             |    SELECT *, last_value(CASE WHEN tag = 0 THEN value END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY tus, tag, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pit_v
             |    FROM e)
             |  WHERE tag = 1 AND pit_v IS NOT NULL),
             |c AS (SELECT user_id, cur_v FROM (
             |        SELECT user_id, value AS cur_v,
             |          ROW_NUMBER() OVER (PARTITION BY user_id
             |                             ORDER BY tus DESC, event_id DESC) AS rn
             |        FROM e WHERE tag = 0) WHERE rn = 1),
             |j AS (SELECT strftime(make_timestamp(p.tus), '%Y-%m') AS label_month,
             |        CAST(p.pit_v <> c.cur_v AS BIGINT) AS leaky,
             |        CAST(floor(abs(p.pit_v - c.cur_v) * 100 + 0.5) AS BIGINT) AS drift_c
             |      FROM p JOIN c USING (user_id))
             |SELECT label_month, COUNT(*) AS n_samples,
             |  CAST(SUM(leaky) AS BIGINT) AS n_leaky,
             |  CAST(SUM(leaky) * 10000 // COUNT(*) AS BIGINT) AS leak_bp,
             |  CAST(SUM(drift_c) // COUNT(*) AS BIGINT) AS mean_drift_c
             |FROM j GROUP BY 1""".stripMargin)
    ),

    // STRATIFIED A/B comparison (post-stratification) — the
    // controlled-for-activity estimate next to events_ab_lift's raw
    // difference: users bucket into MEAN-RELATIVE activity strata
    // (below 0.9x / within / above 1.1x of the average events-per-user
    // — the rfm_migration threshold idiom: scale-free, one broadcast
    // scalar, integer cross-multiplied, no global rank), conversion
    // gaps are computed within each stratum, and the pooled estimate
    // weights the per-stratum gaps by stratum mass. The standard
    // answer to "arm A just has heavier users". All integer bp; one
    // user fold + a 3-row rollup. Arms ride the same md5 hash as the
    // other A/B ops.
    "events_propensity_strata" -> Query(
      (s, d) => {
        val armA = (expr("cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint)")
          % 2 === 0)
        val ua = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("activity"),
            sum((col("event_type") === "purchase").cast("long")).as("np"))
        val tot = ua.agg(sum(col("activity")).as("te"),
          sum(col("np")).as("tp"), count(lit(1)).as("nu"))
        // outcome: ABOVE-AVERAGE purchaser (events_ab_power's baseline
        // definition) — "any purchase" saturates on this event mix
        val u = ua.crossJoin(broadcast(tot))
          .select(when(armA, "A").otherwise("B").as("arm"),
            when(col("activity") * col("nu") * 10 < col("te") * 9, 0L)
              .when(col("activity") * col("nu") * 10 > col("te") * 11, 2L)
              .otherwise(1L).as("stratum"),
            (col("np") * col("nu") > col("tp")).cast("long").as("conv"))
        // a stratum missing an arm entirely carries no comparison
        // (and would divide by zero) — drop it from both views
        val st = u.groupBy(col("stratum")).agg(
            sum((col("arm") === "A").cast("long")).as("na"),
            sum(when(col("arm") === "A", col("conv")).otherwise(0L)).as("ca"),
            sum((col("arm") === "B").cast("long")).as("nb"),
            sum(when(col("arm") === "B", col("conv")).otherwise(0L)).as("cb"))
          .filter(col("na") > 0 && col("nb") > 0)
        val per = st.select(col("stratum").cast("string").as("stratum"),
          col("na"), col("ca"), col("nb"), col("cb"),
          (expr("ca * 10000 div na") - expr("cb * 10000 div nb")).as("diff_bp"))
        val pooled = st.agg(
            sum(col("na")).as("na"), sum(col("ca")).as("ca"),
            sum(col("nb")).as("nb"), sum(col("cb")).as("cb"),
            sum((col("na") + col("nb")) *
              (expr("ca * 10000 div na") - expr("cb * 10000 div nb"))).as("wd"),
            sum(col("na") + col("nb")).as("nt"))
          .select(lit("pooled").as("stratum"), col("na"), col("ca"),
            col("nb"), col("cb"), expr("wd div nt").as("diff_bp"))
        per.unionByName(pooled)
      },
      Some("""WITH ua AS (SELECT user_id, COUNT(*) AS activity,
             |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np
             |  FROM events GROUP BY user_id),
             |tot AS (SELECT CAST(SUM(activity) AS BIGINT) AS te,
             |               CAST(SUM(np) AS BIGINT) AS tp, COUNT(*) AS nu FROM ua),
             |u AS (SELECT
             |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
             |         THEN 'A' ELSE 'B' END AS arm,
             |    CASE WHEN activity * nu * 10 < te * 9 THEN 0
             |         WHEN activity * nu * 10 > te * 11 THEN 2
             |         ELSE 1 END AS stratum,
             |    CAST(np * nu > tp AS BIGINT) AS conv
             |  FROM ua CROSS JOIN tot),
             |st AS (SELECT * FROM (SELECT stratum,
             |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
             |    CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             |    CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS cb
             |  FROM u GROUP BY 1) WHERE na > 0 AND nb > 0),
             |per AS (SELECT CAST(stratum AS VARCHAR) AS stratum, na, ca, nb, cb,
             |          ca * 10000 // na - cb * 10000 // nb AS diff_bp
             |        FROM st),
             |pooled AS (SELECT 'pooled' AS stratum,
             |    CAST(SUM(na) AS BIGINT) AS na, CAST(SUM(ca) AS BIGINT) AS ca,
             |    CAST(SUM(nb) AS BIGINT) AS nb, CAST(SUM(cb) AS BIGINT) AS cb,
             |    CAST(SUM((na + nb) * (ca * 10000 // na - cb * 10000 // nb))
             |         // SUM(na + nb) AS BIGINT) AS diff_bp
             |  FROM st)
             |SELECT stratum, na, ca, nb, cb, CAST(diff_bp AS BIGINT) AS diff_bp
             |FROM per
             |UNION ALL
             |SELECT stratum, na, ca, nb, cb, diff_bp FROM pooled""".stripMargin)
    ),

    // WALD-WOLFOWITZ RUNS test — is the daily revenue series random
    // around its own median, or does it trend/cycle? Days above and
    // below the exact interpolated median (GroupedPercentile, no value
    // buffer; equal-to-median days drop per the standard procedure)
    // form a +/- sequence; the run count folds from one lag over the
    // calendar-bounded day series, and the normal approximation
    // z = (R - mu)/sigma is the terminal double. A |z| > 1.96 verdict
    // means the series is NOT random (trend, seasonality, or regime).
    "agg_runs_test" -> Query(
      (s, d) => {
        val daily = graft.Caches.scoped(Tables.lineitem(s, d)
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
          .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")).as("v")))
        val med = graft.operators.GroupedPercentile.exact(
            daily.select(lit(1L).as("g"), col("v")), "g", "v",
            Seq(("p50", 0.50)), expr("v div 10000000"), _.cast("double"))
          .select(col("res").as("med"))
        val signs = daily.crossJoin(broadcast(med))
          .filter(col("v").cast("double") =!= col("med"))
          .select(col("day"), (col("v").cast("double") > col("med")).cast("long").as("s"))
        val w = Window.orderBy(col("day"))
        val g = signs
          .withColumn("chg",
            when(lag(col("s"), 1).over(w).isNull, 1L)
              .when(lag(col("s"), 1).over(w) =!= col("s"), 1L).otherwise(0L))
          .agg(sum(col("s")).as("n1"),
            (count(lit(1)) - sum(col("s"))).as("n2"),
            sum(col("chg")).as("runs"))
        val n1 = col("n1").cast("double")
        val n2 = col("n2").cast("double")
        val mu = lit(2.0) * n1 * n2 / (n1 + n2) + 1.0
        val vr = (lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n1 - n2)) /
          ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
        g.select(col("n1"), col("n2"), col("runs"),
            round((col("runs").cast("double") - mu) / sqrt(vr), 4).as("z"))
          .withColumn("random", (abs(col("z")) <= 1.96).cast("long"))
      },
      Some("""WITH daily AS (
             |  SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,
             |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS v
             |  FROM lineitem GROUP BY 1),
             |med AS (SELECT quantile_cont(CAST(v AS DOUBLE), 0.50) AS med FROM daily),
             |signs AS (SELECT day, CAST(CAST(v AS DOUBLE) > med AS BIGINT) AS s
             |          FROM daily CROSS JOIN med WHERE CAST(v AS DOUBLE) <> med),
             |ch AS (SELECT s, CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL THEN 1
             |                      WHEN LAG(s) OVER (ORDER BY day) <> s THEN 1
             |                      ELSE 0 END AS chg
             |       FROM signs),
             |g AS (SELECT CAST(SUM(s) AS BIGINT) AS n1,
             |        CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2,
             |        CAST(SUM(chg) AS BIGINT) AS runs
             |      FROM ch),
             |f AS (SELECT n1, n2, runs,
             |        CAST(n1 AS DOUBLE) AS d1, CAST(n2 AS DOUBLE) AS d2
             |      FROM g)
             |SELECT n1, n2, runs,
             |  ROUND((CAST(runs AS DOUBLE) - (2.0*d1*d2/(d1 + d2) + 1.0))
             |    / sqrt((2.0*d1*d2*(2.0*d1*d2 - d1 - d2))
             |           / ((d1 + d2)*(d1 + d2)*(d1 + d2 - 1.0))), 4) AS z,
             |  CAST(abs(ROUND((CAST(runs AS DOUBLE) - (2.0*d1*d2/(d1 + d2) + 1.0))
             |    / sqrt((2.0*d1*d2*(2.0*d1*d2 - d1 - d2))
             |           / ((d1 + d2)*(d1 + d2)*(d1 + d2 - 1.0))), 4)) <= 1.96
             |    AS BIGINT) AS random
             |FROM f""".stripMargin)
    ),

    // THEIL-SEN robust trend of monthly revenue — the slope estimator
    // one outlier month can't drag: the median of ALL pairwise slopes
    // over the month series. The pair join is bounded by the CALENDAR
    // (~84 months -> ~3.5k pairs at any fact size — the fact table
    // folds to months first), each slope is a ratio of exact integer
    // dollar/month differences, and the median rides GroupedPercentile
    // over coarse slope buckets. Engine-identical interpolation,
    // rounded at 4dp.
    "window_theil_sen" -> Query(
      (s, d) => {
        val monthly = graft.Caches.scoped(Tables.lineitem(s, d)
          .groupBy((year(col("l_shipdate")) * 12 +
            month(col("l_shipdate"))).cast("long").as("mi"))
          .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")).as("r")))
        // the division sits behind a when(): the fused BNLJ stage may
        // hoist projection expressions above its condition check, and
        // under ANSI an ma == mb candidate row would then throw before
        // being discarded — when() keeps the evaluation conditional
        val pairs = monthly.select(col("mi").as("ma"), col("r").as("ra"))
          .join(monthly.select(col("mi").as("mb"), col("r").as("rb")),
            col("mb") > col("ma"))
          .select(when(col("mb") > col("ma"),
            ((col("rb") - col("ra")).cast("double") / 100.0) /
              (col("mb") - col("ma")).cast("double")).as("slope"))
          .filter(col("slope").isNotNull)
        val med = graft.operators.GroupedPercentile.exact(
            pairs.select(lit(1L).as("g"), col("slope")), "g", "slope",
            Seq(("p50", 0.50)), floor(col("slope") / 1024.0), c => c)
          .select(round(col("res"), 4).as("slope_med"))
        val counts = monthly.agg(count(lit(1)).as("n_months"))
          .crossJoin(broadcast(pairs.agg(count(lit(1)).as("n_pairs"))))
        counts.crossJoin(broadcast(med))
      },
      Some("""WITH monthly AS (
             |  SELECT CAST(year(l_shipdate)*12 + month(l_shipdate) AS BIGINT) AS mi,
             |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT))
             |         AS BIGINT) AS r
             |  FROM lineitem GROUP BY 1),
             |pairs AS (SELECT CAST(b.r - a.r AS DOUBLE) / 100.0
             |            / CAST(b.mi - a.mi AS DOUBLE) AS slope
             |          FROM monthly a JOIN monthly b ON b.mi > a.mi)
             |SELECT (SELECT COUNT(*) FROM monthly) AS n_months,
             |  (SELECT COUNT(*) FROM pairs) AS n_pairs,
             |  ROUND((SELECT quantile_cont(slope, 0.50) FROM pairs), 4) AS slope_med""".stripMargin)
    ),

    // QUANTILE CALIBRATION audit — "is last month's p90 still the p90?":
    // train the per-type p90 of event values on the FIRST half of the
    // time span (GroupedPercentile, bounded memory), then measure what
    // share of SECOND-half values it actually covers. A gap from 9000bp
    // means the value distribution drifted and every SLO derived from
    // the old quantile is mis-calibrated. Split uses the exact integer
    // midpoint idiom; coverage is exact integer bp.
    "events_quantile_calibration" -> Query(
      (s, d) => {
        val ev = graft.Caches.scoped(Tables.events(s, d)
          .select(col("event_type"), col("value"), expr("(ts div 1000)").as("us")))
        val mm = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
        val sp = graft.Caches.scoped(ev.crossJoin(broadcast(mm))
          .withColumn("h1", (col("us") * 2 <= col("lo") + col("hi")).cast("long")))
        val thr = GroupedPercentile.exact(
            sp.filter(col("h1") === 1).select(col("event_type"), col("value")),
            "event_type", "value", Seq(("p90", 0.90)),
            floor(col("value")), c => c)
          .select(col("event_type"), col("res").as("thr"))
        sp.filter(col("h1") === 0)
          .join(broadcast(thr), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_test"),
            sum((col("value") <= col("thr")).cast("long")).as("n_cov"),
            round(max(col("thr")), 4).as("p90_trained"))
          .select(col("event_type"), col("n_test"), col("p90_trained"),
            expr("n_cov * 10000 div n_test").as("coverage_bp"),
            abs(expr("n_cov * 10000 div n_test") - 9000).as("calib_gap_bp"))
      },
      Some("""WITH e AS (SELECT event_type, value, epoch_us(ts) AS us FROM events),
             |mm AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM e),
             |sp AS (SELECT event_type, value,
             |         CAST(us * 2 <= lo + hi AS BIGINT) AS h1
             |       FROM e CROSS JOIN mm),
             |thr AS (SELECT event_type, quantile_cont(value, 0.90) AS thr
             |        FROM sp WHERE h1 = 1 GROUP BY 1)
             |SELECT sp.event_type, COUNT(*) AS n_test,
             |  ROUND(MAX(thr.thr), 4) AS p90_trained,
             |  CAST(SUM(CAST(sp.value <= thr.thr AS BIGINT)) * 10000 // COUNT(*)
             |    AS BIGINT) AS coverage_bp,
             |  CAST(abs(SUM(CAST(sp.value <= thr.thr AS BIGINT)) * 10000 // COUNT(*)
             |    - 9000) AS BIGINT) AS calib_gap_bp
             |FROM sp JOIN thr USING (event_type)
             |WHERE sp.h1 = 0
             |GROUP BY 1""".stripMargin)
    ),

    // FANO FACTOR + burstiness coefficient per event type — the
    // dispersion test behind "is this traffic Poisson or bursty":
    // hourly counts (calendar-bounded series), then F = var/mean and
    // B = (sd - mean)/(sd + mean) from exact integer power sums. F≈1
    // is Poisson-like; F >> 1 means clumped arrivals (bots, retries,
    // batch jobs). One fold per level, terminal doubles only.
    "events_burstiness_fano" -> Query(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .select(col("event_type"), expr("(ts div 1000) div 3600000000").as("hr"))
          .groupBy(col("event_type"), col("hr"))
          .agg(count(lit(1)).as("c"))
        val g = hourly.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"), sum(col("c")).as("s1"),
            sum(col("c") * col("c")).as("s2"))
        val mean = col("s1").cast("double") / col("n_hours")
        val vr = col("s2").cast("double") / col("n_hours") - mean * mean
        g.select(col("event_type"), col("n_hours"),
            round(mean, 4).as("mean_per_hour"),
            round(vr / mean, 4).as("fano"),
            round((sqrt(vr) - mean) / (sqrt(vr) + mean), 4).as("burstiness"))
          .withColumn("bursty", (col("fano") > 1.5).cast("long"))
      },
      Some("""WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             |             COUNT(*) AS c
             |           FROM events GROUP BY 1, 2),
             |g AS (SELECT event_type, COUNT(*) AS n_hours,
             |        CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c*c) AS BIGINT) AS s2
             |      FROM h GROUP BY 1),
             |f AS (SELECT event_type, n_hours,
             |        CAST(s1 AS DOUBLE) / n_hours AS mean,
             |        CAST(s2 AS DOUBLE) / n_hours
             |          - (CAST(s1 AS DOUBLE) / n_hours) * (CAST(s1 AS DOUBLE) / n_hours) AS vr
             |      FROM g)
             |SELECT event_type, n_hours, ROUND(mean, 4) AS mean_per_hour,
             |  ROUND(vr / mean, 4) AS fano,
             |  ROUND((sqrt(vr) - mean) / (sqrt(vr) + mean), 4) AS burstiness,
             |  CAST(ROUND(vr / mean, 4) > 1.5 AS BIGINT) AS bursty
             |FROM f""".stripMargin)
    ),

    // GMV PRICE-VOLUME-MIX bridge per brand (1995 -> 1996) — the
    // finance decomposition behind every "why did revenue move" review:
    // ΔGMV = (Δprice)·q0 + (Δqty)·p0 + (Δprice)(Δqty), algebraically
    // exact. Quantities and revenue-cents are exact integer sums from
    // one fold; average prices are the only rationals and the three
    // effects are terminal double formulas on exact operands (guarded
    // behind when() so a brand absent in either year never divides).
    "orders_gmv_mix" -> Query(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(year(col("l_shipdate")).isin(1995, 1996))
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey").as("l_partkey"), col("p_brand"))),
            Seq("l_partkey"))
        val g = li.groupBy(col("p_brand"))
          .agg(
            sum(when(year(col("l_shipdate")) === 1995,
              floor(col("l_quantity") + 0.5).cast("long")).otherwise(0L)).as("q0"),
            sum(when(year(col("l_shipdate")) === 1996,
              floor(col("l_quantity") + 0.5).cast("long")).otherwise(0L)).as("q1"),
            sum(when(year(col("l_shipdate")) === 1995,
              (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
              .otherwise(0L)).as("r0"),
            sum(when(year(col("l_shipdate")) === 1996,
              (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
              .otherwise(0L)).as("r1"))
          .filter(col("q0") > 0 && col("q1") > 0)
        val p0 = col("r0").cast("double") / 100.0 / col("q0")
        val p1 = col("r1").cast("double") / 100.0 / col("q1")
        g.select(col("p_brand"), col("q0"), col("q1"), col("r0"), col("r1"),
          round(when(col("q0") > 0 && col("q1") > 0, (p1 - p0) * col("q0")), 2)
            .as("price_eff"),
          round(when(col("q0") > 0 && col("q1") > 0,
            (col("q1") - col("q0")).cast("double") * p0), 2).as("volume_eff"),
          round(when(col("q0") > 0 && col("q1") > 0,
            (p1 - p0) * (col("q1") - col("q0"))), 2).as("cross_eff"))
      },
      Some("""WITH li AS (
             |  SELECT p.p_brand,
             |    CAST(year(l.l_shipdate) AS BIGINT) AS yr,
             |    CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS qk,
             |    CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             |  WHERE year(l.l_shipdate) IN (1995, 1996)),
             |g AS (SELECT p_brand,
             |    CAST(SUM(CASE WHEN yr = 1995 THEN qk ELSE 0 END) AS BIGINT) AS q0,
             |    CAST(SUM(CASE WHEN yr = 1996 THEN qk ELSE 0 END) AS BIGINT) AS q1,
             |    CAST(SUM(CASE WHEN yr = 1995 THEN cents ELSE 0 END) AS BIGINT) AS r0,
             |    CAST(SUM(CASE WHEN yr = 1996 THEN cents ELSE 0 END) AS BIGINT) AS r1
             |  FROM li GROUP BY 1),
             |f AS (SELECT *, CAST(r0 AS DOUBLE)/100.0/q0 AS p0,
             |        CAST(r1 AS DOUBLE)/100.0/q1 AS p1
             |      FROM g WHERE q0 > 0 AND q1 > 0)
             |SELECT p_brand, q0, q1, r0, r1,
             |  ROUND((p1 - p0) * q0, 2) AS price_eff,
             |  ROUND(CAST(q1 - q0 AS DOUBLE) * p0, 2) AS volume_eff,
             |  ROUND((p1 - p0) * (q1 - q0), 2) AS cross_eff
             |FROM f""".stripMargin)
    ),

    // ERROR-BUDGET BURN RATE (multiwindow SRE alerting) — the
    // fast+slow window pair that pages only when both agree: daily
    // error share against a 25% budget (the synthetic stream's error
    // mix makes 2.5%-style budgets meaningless — the MACHINERY is the
    // operator), burn = share/budget over the 1-day and trailing
    // 7-day windows, alert when fast > 2x AND slow > 1x. Daily counts
    // are exact integers; rolling sums are LONG windows over the
    // calendar-day series; burns are terminal doubles rounded 4dp.
    "events_error_budget_burn" -> Query(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("(ts div 1000) div 86400000000").as("day"),
            (col("event_type") === "error").cast("long").as("is_err"))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("t"), sum(col("is_err")).as("e"))
        val w7 = Window.orderBy(col("day")).rowsBetween(-6, 0)
        daily
          .withColumn("t7", sum(col("t")).over(w7))
          .withColumn("e7", sum(col("e")).over(w7))
          .select(col("day"), col("t"), col("e"),
            round(col("e").cast("double") / col("t") / 0.25, 4).as("burn_1d"),
            round(col("e7").cast("double") / col("t7") / 0.25, 4).as("burn_7d"))
          .withColumn("alert",
            (col("burn_1d") > 2.0 && col("burn_7d") > 1.0).cast("long"))
      },
      Some("""WITH daily AS (
             |  SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS t,
             |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS e
             |  FROM events GROUP BY 1),
             |r AS (SELECT day, t, e,
             |        SUM(t) OVER w AS t7, SUM(e) OVER w AS e7
             |      FROM daily
             |      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
             |SELECT CAST(day AS BIGINT) AS day, t, e,
             |  ROUND(CAST(e AS DOUBLE) / t / 0.25, 4) AS burn_1d,
             |  ROUND(CAST(e7 AS DOUBLE) / t7 / 0.25, 4) AS burn_7d,
             |  CAST(ROUND(CAST(e AS DOUBLE) / t / 0.25, 4) > 2.0
             |    AND ROUND(CAST(e7 AS DOUBLE) / t7 / 0.25, 4) > 1.0 AS BIGINT) AS alert
             |FROM r""".stripMargin)
    ),

    // SINGLE-SOURCE supplier risk — the supply-chain fragility audit
    // next to supplier_hhi's concentration index: parts whose entire
    // observed volume ships from ONE supplier, rolled up by brand.
    // One distinct-supplier fold per part + a broadcast dim join.
    "supplier_single_source" -> Query(
      (s, d) => {
        val per = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"))
        per.join(broadcast(Tables.part(s, d)
            .select(col("p_partkey").as("l_partkey"), col("p_brand"))),
            Seq("l_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_parts"),
            sum((col("n_supp") === 1).cast("long")).as("n_single"))
          .select(col("p_brand"), col("n_parts"), col("n_single"),
            expr("n_single * 10000 div n_parts").as("single_bp"))
      },
      Some("""WITH per AS (SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_supp
             |             FROM lineitem GROUP BY 1)
             |SELECT p.p_brand, COUNT(*) AS n_parts,
             |  CAST(SUM(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single,
             |  CAST(SUM(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
             |    AS BIGINT) AS single_bp
             |FROM per JOIN part p ON p.p_partkey = per.l_partkey
             |GROUP BY 1""".stripMargin)
    ),

    // TRIMMED MEAN (5%-95%) per event type — the drop-the-tails
    // companion of agg_winsorized_mean's clamp-the-tails: thresholds
    // from the same bounded-memory GroupedPercentile two-pass, kept
    // mass summed as exact DECIMAL, one terminal division. The pair
    // (trimmed vs winsorized vs raw) is the standard robust-location
    // triptych on a dirty metric stream.
    // CENT-PRECISION INVARIANT: the Spark side derives p05/p95 from
    // cent-quantized values (floor(value*100 + 0.5), interpolated as
    // vc/100) while the oracle's quantile_cont runs on raw `value` —
    // these agree BECAUSE the generator emits events.value at exactly
    // cent precision (the winsorized idiom's shared assumption, also
    // exercised by every `floor(value*100 + 0.5)` key in this file).
    // If the generator ever emits finer precision, quantize the oracle
    // too: quantile_cont over floor(value*100 + 0.5)/100.
    "agg_trimmed_mean" -> Query(
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
        val kept = col("value") >= col("p05") && col("value") <= col("p95")
        ev.join(broadcast(pct), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(kept.cast("long")).as("n_kept"),
            round(sum(when(kept, col("value").cast("decimal(18,6)"))
                .otherwise(lit(0).cast("decimal(18,6)"))).cast("double")
              / sum(kept.cast("long")), 6).as("trimmed_mean"),
            round(sum(col("value").cast("decimal(18,6)")).cast("double")
              / count(lit(1)), 6).as("raw_mean"))
      },
      Some("""WITH p AS (SELECT event_type,
             |             quantile_cont("value", 0.05) AS p05,
             |             quantile_cont("value", 0.95) AS p95
             |           FROM events GROUP BY 1),
             |w AS (SELECT e.event_type, e."value" AS v,
             |        CAST(e."value" >= p.p05 AND e."value" <= p.p95 AS BIGINT) AS kp
             |      FROM events e JOIN p USING (event_type))
             |SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(kp) AS BIGINT) AS n_kept,
             |  ROUND(CAST(SUM(CASE WHEN kp = 1 THEN CAST(v AS DECIMAL(18,6))
             |                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             |    / CAST(SUM(kp) AS BIGINT), 6) AS trimmed_mean,
             |  ROUND(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
             |    AS raw_mean
             |FROM w GROUP BY event_type""".stripMargin)
    ),

    // MANN-KENDALL trend test on monthly average order value — the
    // significance companion to window_theil_sen's slope: S sums the
    // pairwise signs over the calendar-bounded month series (AOV is an
    // exact integer cents-per-order division, so sign ties are real
    // ties), the variance carries the tied-group correction, and the
    // sign-dependent continuity correction feeds the terminal z. All
    // integers until z.
    "orders_trend_mann_kendall" -> Query(
      (s, d) => {
        val monthly = graft.Caches.scoped(Tables.orders(s, d)
          .groupBy((year(col("o_orderdate")) * 12 +
            month(col("o_orderdate"))).cast("long").as("mi"))
          .agg(expr("sum(cast(cast(o_totalprice as decimal(18,2))*100 as long)) div count(1)")
            .as("aov")))
        val sAgg = monthly.select(col("mi").as("ma"), col("aov").as("va"))
          .join(monthly.select(col("mi").as("mb"), col("aov").as("vb")),
            col("mb") > col("ma"))
          .agg(coalesce(sum(signum((col("vb") - col("va")).cast("double"))
            .cast("long")), lit(0L)).as("s_stat"))
        val ties = monthly.groupBy(col("aov")).agg(count(lit(1)).as("t"))
          .agg(coalesce(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)),
            lit(0L)).as("tcorr"))
        val nM = monthly.agg(count(lit(1)).as("n"))
        val g = nM.crossJoin(broadcast(sAgg)).crossJoin(broadcast(ties))
        val vr = (col("n").cast("double") * (col("n") - 1) * (col("n") * 2 + 5) -
          col("tcorr").cast("double")) / 18.0
        val z = when(col("s_stat") > 0, (col("s_stat") - 1).cast("double") / sqrt(vr))
          .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double") / sqrt(vr))
          .otherwise(0.0)
        g.select(col("n").as("n_months"), col("s_stat"),
            round(z, 4).as("z"))
          .withColumn("trending", (abs(col("z")) > 1.96).cast("long"))
      },
      Some("""WITH monthly AS (
             |  SELECT CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT) AS mi,
             |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT))
             |         // COUNT(*) AS BIGINT) AS aov
             |  FROM orders GROUP BY 1),
             |sA AS (SELECT COALESCE(CAST(SUM(CAST(sign(CAST(b.aov - a.aov AS DOUBLE))
             |           AS BIGINT)) AS BIGINT), 0) AS s_stat
             |       FROM monthly a JOIN monthly b ON b.mi > a.mi),
             |ties AS (SELECT COALESCE(CAST(SUM(t * (t - 1) * (2*t + 5)) AS BIGINT), 0) AS tcorr
             |         FROM (SELECT aov, COUNT(*) AS t FROM monthly GROUP BY 1)),
             |nn AS (SELECT COUNT(*) AS n FROM monthly),
             |f AS (SELECT nn.n, sA.s_stat, ties.tcorr,
             |        (CAST(nn.n AS DOUBLE) * (nn.n - 1) * (nn.n * 2 + 5)
             |         - CAST(ties.tcorr AS DOUBLE)) / 18.0 AS vr
             |      FROM nn CROSS JOIN sA CROSS JOIN ties)
             |SELECT n AS n_months, s_stat,
             |  ROUND(CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(vr)
             |             WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(vr)
             |             ELSE 0.0 END, 4) AS z,
             |  CAST(abs(ROUND(CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(vr)
             |             WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(vr)
             |             ELSE 0.0 END, 4)) > 1.96 AS BIGINT) AS trending
             |FROM f""".stripMargin)
    ),

    // INTER-ARRIVAL gap percentiles per event type (p50/p90/p99) — the
    // latency-style tail view `events_inter_arrival`'s mean/cv summary
    // can't show. Gaps are exact integer microseconds from one lag over
    // the per-type sort; the quantiles come from GroupedPercentile.exact
    // (histogram-bisect over minute-wide buckets — NO per-group value
    // buffer, the 100 TB-safe percentile machinery shared repo-wide).
    "events_gap_percentiles" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("us"), col("event_id"))
        val gaps = graft.Caches.scoped(Tables.events(s, d)
          .select(col("event_type"), col("event_id"), expr("(ts div 1000)").as("us"))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
          .filter(col("gap").isNotNull)
          .select(col("event_type"), col("gap")))
        val ps = Seq(("p50", 0.50), ("p90", 0.90), ("p99", 0.99))
        GroupedPercentile.exact(gaps, "event_type", "gap", ps,
            expr("gap div 60000000"), _.cast("double"))
          .withColumn("res", round(col("res"), 4))
          .groupBy(col("event_type"))
          .agg(max(when(col("pname") === "p50", col("res"))).as("p50_us"),
            max(when(col("pname") === "p90", col("res"))).as("p90_us"),
            max(when(col("pname") === "p99", col("res"))).as("p99_us"))
      },
      Some("""WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us FROM events),
             |g AS (SELECT event_type,
             |        us - LAG(us) OVER (PARTITION BY event_type ORDER BY us, event_id) AS gap
             |      FROM e)
             |SELECT event_type,
             |  ROUND(quantile_cont(gap, 0.50), 4) AS p50_us,
             |  ROUND(quantile_cont(gap, 0.90), 4) AS p90_us,
             |  ROUND(quantile_cont(gap, 0.99), 4) AS p99_us
             |FROM g WHERE gap IS NOT NULL
             |GROUP BY event_type""".stripMargin)
    ),
  )
}
