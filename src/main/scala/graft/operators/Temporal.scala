package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-structured operators (SURVEY §2.2 tail): as-of join, range join,
  * sessionization, tumbling windows.
  *
  * The as-of join is composed as union + ordered window (last_value
  * ignoreNulls) — one shuffle on (key, time), which is exactly the plan a
  * dedicated sort-merge as-of exec node would produce, with no custom
  * physical operator to maintain. DuckDB's native ASOF JOIN is the oracle.
  */
object Temporal {

  /** Events carry 2024 timestamps but orders live in 1995-2001; derive a
    * deterministic in-era probe date per event so nearest-past semantics
    * are actually exercised: 1995-01-01 + (event_id % 2400) days.
    */
  private def eventProbes(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"), col("user_id"),
      date_add(to_date(lit("1995-01-01")), (col("event_id") % 2400).cast("int"))
        .as("probe_date"))

  /** Orders deduped to one row per (custkey, order date) — max orderkey
    * wins — so as-of tie-breaks are deterministic in both engines.
    */
  private def dedupedOrders(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("o_date"),
        col("o_orderkey"), col("o_totalprice"))
  }

  val entries: Seq[(String, Query)] = Seq(

    // SCD Type-2 history build: fold an event CHANGELOG into validity
    // intervals — each user's events become [valid_from, valid_to)
    // rows, open-ended on the newest (the dimension-table shape every
    // warehouse merge maintains). One window over (user_id), a
    // high-cardinality key: lead() supplies the closing edge,
    // row_number() the version. Event time is epoch MICROS on both
    // sides (parquet ns truncates to µs in DuckDB); event_id breaks
    // same-timestamp ties deterministically.
    "etl_scd2_history" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))
        Tables.events(s, d)
          .withColumn("tus", expr("ts div 1000"))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), col("tus").as("valid_from_us"),
            lead(col("tus"), 1).over(w).as("valid_to_us"),
            row_number().over(w).cast("long").as("version"))
          .withColumn("is_current",
            col("valid_to_us").isNull.cast("long"))
      },
      Some("""SELECT user_id, event_id, event_type, value,
             |  epoch_us(ts) AS valid_from_us,
             |  LEAD(epoch_us(ts)) OVER w AS valid_to_us,
             |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
             |  CAST(LEAD(epoch_us(ts)) OVER w IS NULL AS BIGINT) AS is_current
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin)
    ),

    // Ordered-funnel analysis: per user, the earliest view -> the
    // earliest click AFTER that view -> the earliest purchase AFTER
    // that click (the product-analytics "did they convert, and when"
    // op). Three chained conditional-min aggregations — every join and
    // groupBy keys on user_id, so after the first exchange the plan
    // stays co-partitioned; each min is map-side combinable. No
    // windows, no per-user event arrays — state per user is three
    // scalars, which is what survives 100 TB of events. Event times
    // are epoch MICROS both sides; steps_completed is integer-exact.
    "events_funnel" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
        val t1 = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("tus")).as("t1_us"))
        val t2 = ev.filter(col("event_type") === "click")
          .join(t1, Seq("user_id")).filter(col("tus") > col("t1_us"))
          .groupBy(col("user_id")).agg(min(col("tus")).as("t2_us"))
        val t3 = ev.filter(col("event_type") === "purchase")
          .join(t2, Seq("user_id")).filter(col("tus") > col("t2_us"))
          .groupBy(col("user_id")).agg(min(col("tus")).as("t3_us"))
        ev.select(col("user_id")).distinct()
          .join(t1, Seq("user_id"), "left")
          .join(t2, Seq("user_id"), "left")
          .join(t3, Seq("user_id"), "left")
          .select(col("user_id"), col("t1_us"), col("t2_us"), col("t3_us"),
            (col("t1_us").isNotNull.cast("long") + col("t2_us").isNotNull.cast("long")
              + col("t3_us").isNotNull.cast("long")).as("steps_completed"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
             |t1 AS (SELECT user_id, MIN(tus) AS t1_us FROM ev WHERE event_type = 'view' GROUP BY user_id),
             |t2 AS (SELECT ev.user_id, MIN(tus) AS t2_us FROM ev JOIN t1 USING (user_id)
             |       WHERE event_type = 'click' AND tus > t1_us GROUP BY ev.user_id),
             |t3 AS (SELECT ev.user_id, MIN(tus) AS t3_us FROM ev JOIN t2 USING (user_id)
             |       WHERE event_type = 'purchase' AND tus > t2_us GROUP BY ev.user_id),
             |u AS (SELECT DISTINCT user_id FROM ev)
             |SELECT u.user_id, t1_us, t2_us, t3_us,
             |  CAST(t1_us IS NOT NULL AS BIGINT) + CAST(t2_us IS NOT NULL AS BIGINT)
             |    + CAST(t3_us IS NOT NULL AS BIGINT) AS steps_completed
             |FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
             |       LEFT JOIN t3 USING (user_id)""".stripMargin)
    ),

    // Cohort retention: users grouped by first-active day, counted in
    // each later day they return — the (cohort, offset) retention
    // triangle every growth dashboard is built on. The (user, day)
    // pairs are deduped FIRST (map-side combinable distinct), so the
    // cohort join carries at most one row per user-day regardless of
    // event volume; day arithmetic is integer epoch-µs division, no
    // date/timezone functions for engines to disagree on.
    "events_retention" -> Query(
      (s, d) => {
        val um = Tables.events(s, d)
          .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("di"))
          .distinct()
        val first = um.groupBy(col("user_id")).agg(min(col("di")).as("d0"))
        um.join(first, Seq("user_id"))
          .groupBy(col("d0").as("cohort_day"), (col("di") - col("d0")).as("offset"))
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH um AS (SELECT DISTINCT user_id,
             |              epoch_us(ts) // 86400000000 AS di
             |            FROM events),
             |f AS (SELECT user_id, MIN(di) AS d0 FROM um GROUP BY user_id)
             |SELECT d0 AS cohort_day, di - d0 AS offset, COUNT(*) AS n_users
             |FROM um JOIN f USING (user_id)
             |GROUP BY 1, 2""".stripMargin)
    ),

    // Key-less interval-overlap join at scale: how many OTHER users had
    // a co-active session (padded +-15 min) overlapping each of mine?
    // There is no equi key — the naive form is an O(n^2) theta join, the
    // one shape that cannot ship at 100 TB. The scale path implemented
    // here: explode each interval into fixed-width (1 h) time buckets,
    // EQUI-join on the bucket, dedup, then refine with the exact overlap
    // predicate — shuffle is O(n * duration/width), never n^2. The
    // oracle runs the naive theta join (DuckDB's IEJoin), so the bucket
    // decomposition is proven lossless. (Plan pinned: no nested-loop.)
    "join_interval_overlap" -> Query(
      (s, d) => {
        val gapUs = 1800000000L // 30 min session gap
        val padUs = 900000000L  // +-15 min co-activity pad
        val minuteUs = 60000000L // histogram granularity: candidates per boundary join = one minute's session density
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wSes = Window.partitionBy(col("user_id")).orderBy(col("s0"))
        val ses = Tables.events(s, d)
          .withColumn("tus", expr("ts div 1000"))
          .withColumn("new_sess",
            when(col("tus") - lag(col("tus"), 1).over(w) > gapUs ||
                 lag(col("tus"), 1).over(w).isNull, 1L).otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(wRun))
          .groupBy(col("user_id"), col("sess_id"))
          .agg((min(col("tus")) - padUs).as("s0"), (max(col("tus")) + padUs).as("s1"))
          // a user's padded sessions are STRICTLY disjoint (gap > 30 min
          // minus 2x15 min pad >= 1 us), which the counting identity
          // below rides on; prev_end = -1 marks a user's first session
          .withColumn("prev_end",
            coalesce(lag(col("s1"), 1).over(wSes), lit(-1L)))
          .withColumn("bk0", expr(s"s0 div $minuteUs"))
          .withColumn("bk1", expr(s"s1 div $minuteUs"))
        val sesC = graft.Caches.scoped(ses)
        // materialize the session cache BEFORE the ~10 consuming
        // subtrees below fan out: a persisted-but-unmaterialized frame
        // read by racing stages of one job recomputes once per stage
        // (the round-10 cache-race lesson; event-log measured 6+
        // redundant window computations without this action)
        sesC.count()

        // COUNTING identity instead of pair enumeration (the round-11
        // plan enumerated every overlapping session pair — 1.64B rows at
        // the 10x corpus for ~150k output rows, because instantaneous
        // concurrency is part of every interval's answer). Distinct
        // other-users overlapping [s0, s1] decomposes EXACTLY as
        //   A(s0) - 1 + starts_in(s0, s1] - C
        // where A(s0) = sessions containing the instant s0 (stab count;
        // the -1 removes self), starts_in = sessions starting inside the
        // window, and C = those starts whose user was already mid- or
        // pre-window-active (prev_end >= s0 — cancels the second-and-
        // later sessions of a user inside the window AND the windows of
        // users already counted in A, including self's own next
        // sessions). Every term is a bucket equi-join against a
        // MINUTE-bucket cumulative histogram (model-sized: one row per
        // minute of corpus time range — 43k rows / ~1 MB broadcast for
        // a 30-day corpus; granularity chosen because join cost is
        // candidate volume x ~2 us of row materialization, and a
        // minute's session density is ~60x below an hour's) plus an
        // in-bucket boundary count — candidates per target are one
        // minute's density plus the starts genuinely inside the
        // window, never the full overlap fan-out. Measured: 10x corpus
        // 204 s -> 8.8 s with identical rows; growth is ~density x
        // targets (linear per-capita), not pairs.
        val rng = sesC.agg(min(col("bk0")).as("minb"), max(col("bk1")).as("maxb"))
        val dense = rng.select(explode(sequence(col("minb"), col("maxb"))).as("bkt"))
        def cumHist(bcol: String): DataFrame = {
          val h = sesC.groupBy(col(bcol).as("bkt")).agg(count(lit(1)).as("cnt"))
          dense.join(h, Seq("bkt"), "left")
            .select(col("bkt"), coalesce(col("cnt"), lit(0L)).as("cnt"))
            .withColumn("cum_prev", coalesce(
              sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
                .orderBy(col("bkt"))
                .rowsBetween(Long.MinValue, -1)), lit(0L)))
        }
        val hs = cumHist("bk0") // session starts per minute bucket
        val he = cumHist("bk1") // session ends per minute bucket
        val tkey = Seq("user_id", "sess_id")
        val tgt = sesC.select(col("user_id"), col("sess_id"), col("s0"),
          col("s1"), col("bk0"), col("bk1"))
        val starts = sesC.select(col("bk0").as("sbkt"), col("s0").as("s0b"),
          col("prev_end").as("peb"))
        val ends = sesC.select(col("bk1").as("ebkt"), col("s1").as("s1b"))
        // in-bucket boundary counts (b1 always >= 1: the session itself)
        val b1 = tgt
          .join(starts, col("bk0") === col("sbkt") && col("s0b") <= col("s0"))
          .groupBy(tkey.map(col): _*).agg(count(lit(1)).as("nb1"))
        val b2 = tgt
          .join(starts, col("bk1") === col("sbkt") && col("s0b") <= col("s1"))
          .groupBy(tkey.map(col): _*).agg(count(lit(1)).as("nb2"))
        val b3 = tgt
          .join(ends, col("bk0") === col("ebkt") && col("s1b") < col("s0"))
          .groupBy(tkey.map(col): _*).agg(count(lit(1)).as("nb3"))
        // C rides the window's own bucket range — candidates are the
        // starts inside each target's interval, a tiny slice of the old
        // all-overlaps fan-out
        val c4 = tgt
          .withColumn("bkt", explode(sequence(col("bk0"), col("bk1"))))
          .join(starts, col("bkt") === col("sbkt") && col("s0b") > col("s0") &&
            col("s0b") <= col("s1") && col("peb") >= col("s0"))
          .groupBy(tkey.map(col): _*).agg(count(lit(1)).as("nc"))
        tgt
          .join(broadcast(hs.select(col("bkt"), col("cum_prev").as("cps0"))),
            col("bk0") === col("bkt")).drop("bkt")
          .join(broadcast(hs.select(col("bkt"), col("cum_prev").as("cps1"))),
            col("bk1") === col("bkt")).drop("bkt")
          .join(broadcast(he.select(col("bkt"), col("cum_prev").as("ces0"))),
            col("bk0") === col("bkt")).drop("bkt")
          .join(b1, tkey)
          .join(b2, tkey, "left")
          .join(b3, tkey, "left")
          .join(c4, tkey, "left")
          .select(col("user_id"), col("sess_id"),
            ((col("cps0") + col("nb1"))                                  // starts_le(s0)
              - (col("ces0") + coalesce(col("nb3"), lit(0L))) - 1L      // - ends_lt(s0) - self
              + (col("cps1") + coalesce(col("nb2"), lit(0L)))            // + starts_le(s1)
              - (col("cps0") + col("nb1"))                               // - starts_le(s0)
              - coalesce(col("nc"), lit(0L))).as("n_concurrent_users")) // - already-counted users
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
             |g AS (SELECT *, CASE WHEN tus - LAG(tus) OVER w > 1800000000
             |                       OR LAG(tus) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
             |sx AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM g),
             |ses AS (SELECT user_id, sess_id, MIN(tus) - 900000000 AS s0, MAX(tus) + 900000000 AS s1
             |        FROM sx GROUP BY user_id, sess_id),
             |ov AS (SELECT DISTINCT a.user_id, a.sess_id, b.user_id AS ou
             |       FROM ses a JOIN ses b
             |         ON a.user_id <> b.user_id AND a.s0 <= b.s1 AND b.s0 <= a.s1),
             |c AS (SELECT user_id, sess_id, COUNT(*) AS n FROM ov GROUP BY user_id, sess_id)
             |SELECT ses.user_id, CAST(ses.sess_id AS BIGINT) AS sess_id,
             |  COALESCE(n, 0) AS n_concurrent_users
             |FROM ses LEFT JOIN c USING (user_id, sess_id)""".stripMargin)
    ),

    // Hopping (sliding) windows, batch twin: 1 h windows every 30 min —
    // each event lands in exactly size/step windows via an exploded
    // window-start sequence, then one map-side-partial agg on
    // (win_start, event_type). Integer epoch-µs window arithmetic.
    "window_hopping" -> Query(
      (s, d) => {
        Tables.events(s, d)
          .withColumn("tus", expr("ts div 1000"))
          .withColumn("win_start_us", explode(sequence(
            expr("((tus - 3600000000) div 1800000000 + 1) * 1800000000"),
            expr("(tus div 1800000000) * 1800000000"),
            lit(1800000000L))))
          .groupBy(col("win_start_us"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            graft.Parity.dsum(col("value")).as("sum_value"))
      },
      Some("""SELECT win_start_us, event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM (SELECT event_type, value,
             |        unnest(generate_series(
             |          ((epoch_us(ts) - 3600000000) // 1800000000 + 1) * 1800000000,
             |          (epoch_us(ts) // 1800000000) * 1800000000,
             |          1800000000)) AS win_start_us
             |      FROM events)
             |GROUP BY win_start_us, event_type""".stripMargin)
    ),

    // First-order event-transition matrix (the Markov view of user
    // behavior): per-user lead() pairs each event with its successor,
    // then one partial agg on (from, to) and a per-source rank. The
    // window partitions on user_id (high cardinality); the transition
    // matrix itself is |event_type|^2 rows — driver-small at any scale.
    "events_transitions" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
        val wr = Window.partitionBy(col("event_type"))
          .orderBy(col("n").desc, col("next_type"))
        Tables.events(s, d)
          .withColumn("tus", expr("ts div 1000"))
          .select(col("user_id"), col("event_type"), col("tus"), col("event_id"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(wr).cast("long"))
      },
      Some("""WITH t AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
             |p AS (SELECT event_type,
             |        LEAD(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS next_type
             |      FROM t),
             |c AS (SELECT event_type, next_type, COUNT(*) AS n FROM p
             |      WHERE next_type IS NOT NULL GROUP BY 1, 2)
             |SELECT event_type, next_type, n,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, next_type) AS BIGINT) AS rn
             |FROM c""".stripMargin)
    ),

    // Nearest-in-EITHER-direction as-of join, completing the as-of
    // family: per probe, the latest past order (o_date <= probe) and the
    // earliest future order (o_date > probe) come out of ONE union +
    // two window frames over the same (key, time) sort — still a single
    // shuffle — then integer day-deltas pick the nearer side (tie ->
    // past). Oracle: two DuckDB ASOF joins (>= and strict <) + the same
    // CASE.
    "asof_join_nearest" -> Query(
      (s, d) => {
        val o = dedupedOrders(s, d).select(
          col("o_custkey").as("k"), col("o_date").as("t"),
          lit(0).as("ord"), lit(null).cast("long").as("event_id"),
          col("o_orderkey"), col("o_date").as("ot"))
        val e = eventProbes(s, d).select(
          col("user_id").as("k"), col("probe_date").as("t"),
          lit(1).as("ord"), col("event_id"),
          lit(null).cast("long").as("o_orderkey"), lit(null).cast("date").as("ot"))
        val base = Window.partitionBy(col("k"))
          .orderBy(col("t"), col("ord"), col("event_id"))
        val back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val pd = datediff(col("t"), col("pt")).cast("long")
        val nd = datediff(col("nt"), col("t")).cast("long")
        o.unionAll(e)
          .withColumn("pk", last(col("o_orderkey"), ignoreNulls = true).over(back))
          .withColumn("pt", last(col("ot"), ignoreNulls = true).over(back))
          .withColumn("nk", first(col("o_orderkey"), ignoreNulls = true).over(fwd))
          .withColumn("nt", first(col("ot"), ignoreNulls = true).over(fwd))
          .filter(col("ord") === 1)
          .select(col("event_id"), col("k").as("user_id"),
            date_format(col("t"), "yyyy-MM-dd").as("probe_date"),
            when(col("pt").isNull && col("nt").isNull, "none")
              .when(col("nt").isNull || (col("pt").isNotNull && pd <= nd), "past")
              .otherwise("future").as("direction"),
            when(col("nt").isNull || (col("pt").isNotNull && pd <= nd), col("pk"))
              .otherwise(col("nk")).as("nearest_orderkey"),
            when(col("pt").isNull && col("nt").isNull, lit(null).cast("long"))
              .when(col("nt").isNull || (col("pt").isNotNull && pd <= nd), pd)
              .otherwise(nd).as("delta_days"))
      },
      Some("""WITH o AS (
             |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_date, o_orderkey
             |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
             |                                     ORDER BY o_orderkey DESC) AS rn FROM orders)
             |  WHERE rn = 1),
             |e AS (
             |  SELECT event_id, user_id,
             |    DATE '1995-01-01' + CAST(event_id % 2400 AS INTEGER) AS probe_date
             |  FROM events),
             |p AS (SELECT e.event_id, e.user_id, e.probe_date,
             |        o.o_orderkey AS pk, o.o_date AS pt
             |      FROM e ASOF LEFT JOIN o
             |        ON e.user_id = o.o_custkey AND e.probe_date >= o.o_date),
             |n AS (SELECT e.event_id, o.o_orderkey AS nk, o.o_date AS nt
             |      FROM e ASOF LEFT JOIN o
             |        ON e.user_id = o.o_custkey AND e.probe_date < o.o_date)
             |SELECT p.event_id, p.user_id, strftime(p.probe_date, '%Y-%m-%d') AS probe_date,
             |  CASE WHEN pt IS NULL AND nt IS NULL THEN 'none'
             |       WHEN nt IS NULL OR (pt IS NOT NULL
             |             AND p.probe_date - pt <= nt - p.probe_date) THEN 'past'
             |       ELSE 'future' END AS direction,
             |  CASE WHEN nt IS NULL OR (pt IS NOT NULL
             |             AND p.probe_date - pt <= nt - p.probe_date) THEN pk
             |       ELSE nk END AS nearest_orderkey,
             |  CAST(CASE WHEN pt IS NULL AND nt IS NULL THEN NULL
             |       WHEN nt IS NULL OR (pt IS NOT NULL
             |             AND p.probe_date - pt <= nt - p.probe_date) THEN p.probe_date - pt
             |       ELSE nt - p.probe_date END AS BIGINT) AS delta_days
             |FROM p JOIN n USING (event_id)""".stripMargin)
    ),

    // Trailing-window anomaly detection on the daily event-count series:
    // a day is anomalous when its count sits more than 3 sigma from the
    // trailing 7-day mean. The entire decision is INTEGER arithmetic —
    // z^2 > 9 rewrites to (x*n - sum)^2 * (n-1) > 9*n*(n*sumsq - sum^2)
    // over exact window sums — so no float (mean, stddev, or z) ever
    // crosses the oracle boundary. (Exact in int64 while daily counts
    // stay under ~1e8; beyond that the same rewrite runs in decimal —
    // DuckDB already promotes to HUGEINT.) The heavy pass is the (type, day)
    // partial count agg; the rolling window then runs over the tiny
    // per-type daily series.
    "events_anomaly_zscore" -> Query(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("di"))
          .groupBy(col("event_type"), col("di")).agg(count(lit(1)).as("x"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
          .rowsBetween(-7, -1)
        daily
          .withColumn("n7", count(col("x")).over(w))
          .withColumn("sum7", sum(col("x")).over(w))
          .withColumn("sumsq7", sum(col("x") * col("x")).over(w))
          .filter(col("n7") >= 3)
          .select(col("event_type"), col("di").as("day"), col("x"),
            col("n7"), col("sum7"), col("sumsq7"),
            ((col("x") * col("n7") - col("sum7")) * (col("x") * col("n7") - col("sum7"))
              * (col("n7") - 1) >
              (col("n7") * col("sumsq7") - col("sum7") * col("sum7")) * col("n7") * 9)
              .cast("long").as("is_anomaly"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, epoch_us(ts) // 86400000000 AS di, COUNT(*) AS x
             |  FROM events GROUP BY 1, 2),
             |r AS (SELECT event_type, di, x,
             |        COUNT(x) OVER w AS n7, SUM(x) OVER w AS sum7,
             |        SUM(x * x) OVER w AS sumsq7
             |      FROM daily
             |      WINDOW w AS (PARTITION BY event_type ORDER BY di
             |                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
             |SELECT event_type, di AS day, x, n7,
             |  CAST(sum7 AS BIGINT) AS sum7, CAST(sumsq7 AS BIGINT) AS sumsq7,
             |  CAST((x * n7 - sum7) * (x * n7 - sum7) * (n7 - 1)
             |        > (n7 * sumsq7 - sum7 * sum7) * n7 * 9 AS BIGINT) AS is_anomaly
             |FROM r WHERE n7 >= 3""".stripMargin)
    ),

    // Nearest-past (as-of) join: each event picks the latest order of the
    // same customer with order date <= probe date. Union + window runs in
    // ONE shuffle on (key, time) — at 100 TB this beats the naive
    // range-join + argmax formulation (no candidate blowup).
    "asof_join" -> Query(
      (s, d) => {
        val o = dedupedOrders(s, d).select(
          col("o_custkey").as("k"), col("o_date").as("t"),
          lit(0).as("ord"), lit(null).cast("long").as("event_id"),
          col("o_orderkey"), col("o_totalprice"))
        val e = eventProbes(s, d).select(
          col("user_id").as("k"), col("probe_date").as("t"),
          lit(1).as("ord"), col("event_id"),
          lit(null).cast("long").as("o_orderkey"),
          lit(null).cast("double").as("o_totalprice"))
        val w = Window.partitionBy(col("k"))
          .orderBy(col("t"), col("ord"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.unionAll(e)
          .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
          .withColumn("asof_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
          .filter(col("ord") === 1)
          .select(col("event_id"), col("k").as("user_id"),
            date_format(col("t"), "yyyy-MM-dd").as("probe_date"),
            col("asof_orderkey"), col("asof_totalprice"))
      },
      Some("""WITH o AS (
             |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_date, o_orderkey, o_totalprice
             |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
             |                                     ORDER BY o_orderkey DESC) AS rn FROM orders)
             |  WHERE rn = 1),
             |e AS (
             |  SELECT event_id, user_id,
             |    DATE '1995-01-01' + CAST(event_id % 2400 AS INTEGER) AS probe_date
             |  FROM events)
             |SELECT e.event_id, e.user_id, strftime(e.probe_date, '%Y-%m-%d') AS probe_date,
             |  o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_totalprice
             |FROM e ASOF LEFT JOIN o
             |  ON e.user_id = o.o_custkey AND e.probe_date >= o.o_date""".stripMargin)
    ),

    // As-of join with a STALENESS TOLERANCE: same nearest-past
    // machinery, but a match older than 30 days is rejected (nulled)
    // — the sensor/price-feed contract where a quote that stale is as
    // good as no quote. The tolerance is applied AFTER the one-shuffle
    // union+window resolves the nearest-past candidate, so the plan is
    // identical to asof_join plus one codegen'd CASE; day arithmetic is
    // integer datediff on both sides.
    "asof_join_tolerance" -> Query(
      (s, d) => {
        val o = dedupedOrders(s, d).select(
          col("o_custkey").as("k"), col("o_date").as("t"),
          lit(0).as("ord"), lit(null).cast("long").as("event_id"),
          col("o_date").as("o_date"), col("o_orderkey"), col("o_totalprice"))
        val e = eventProbes(s, d).select(
          col("user_id").as("k"), col("probe_date").as("t"),
          lit(1).as("ord"), col("event_id"),
          lit(null).cast("date").as("o_date"),
          lit(null).cast("long").as("o_orderkey"),
          lit(null).cast("double").as("o_totalprice"))
        val w = Window.partitionBy(col("k"))
          .orderBy(col("t"), col("ord"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // cand_* must materialize BEFORE the ord filter — a window
        // expression referenced after it would recompute over the
        // events-only frame and never see an order row
        val fresh = col("cand_stale") <= 30
        o.unionAll(e)
          .withColumn("cand_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
          .withColumn("cand_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
          .withColumn("cand_stale",
            datediff(col("t"), last(col("o_date"), ignoreNulls = true).over(w)).cast("long"))
          .filter(col("ord") === 1)
          .select(col("event_id"), col("k").as("user_id"),
            date_format(col("t"), "yyyy-MM-dd").as("probe_date"),
            when(fresh, col("cand_orderkey")).as("asof_orderkey"),
            when(fresh, col("cand_totalprice")).as("asof_totalprice"),
            when(fresh, col("cand_stale")).as("staleness_days"))
      },
      Some("""WITH o AS (
             |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_date, o_orderkey, o_totalprice
             |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
             |                                     ORDER BY o_orderkey DESC) AS rn FROM orders)
             |  WHERE rn = 1),
             |e AS (
             |  SELECT event_id, user_id,
             |    DATE '1995-01-01' + CAST(event_id % 2400 AS INTEGER) AS probe_date
             |  FROM events)
             |SELECT e.event_id, e.user_id, strftime(e.probe_date, '%Y-%m-%d') AS probe_date,
             |  CASE WHEN e.probe_date - o.o_date <= 30 THEN o.o_orderkey END AS asof_orderkey,
             |  CASE WHEN e.probe_date - o.o_date <= 30 THEN o.o_totalprice END AS asof_totalprice,
             |  CASE WHEN e.probe_date - o.o_date <= 30
             |       THEN CAST(e.probe_date - o.o_date AS BIGINT) END AS staleness_days
             |FROM e ASOF LEFT JOIN o
             |  ON e.user_id = o.o_custkey AND e.probe_date >= o.o_date""".stripMargin)
    ),

    // Running DISTINCT-user curve (cumulative audience): the naive
    // cumulative COUNT(DISTINCT) needs per-row set state and dies at
    // scale; the first-occurrence trick makes it two partial aggs —
    // each user's min(day) marks where they increment the curve, and
    // the cumulative sum runs over the tiny per-day series (the only
    // window is post-aggregate, <=O(days) rows). Daily activity rides
    // along from the same day-grain agg.
    "events_running_distinct" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d).select(
          expr("(ts div 1000) div 86400000000").as("di"), col("user_id"))
        val daily = ev.groupBy(col("di"))
          .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("dau"))
        val firsts = ev.groupBy(col("user_id")).agg(min(col("di")).as("di"))
          .groupBy(col("di")).agg(count(lit(1)).as("n_new"))
        val w = Window.orderBy(col("di"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.join(firsts, Seq("di"), "left")
          .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
          .withColumn("cum_users", sum(col("n_new")).over(w))
          .select(col("di").as("day"), col("n_events"), col("dau"),
            col("n_new"), col("cum_users"))
      },
      Some("""WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS di, user_id FROM events),
             |daily AS (SELECT di, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS dau
             |          FROM ev GROUP BY di),
             |firsts AS (SELECT di, COUNT(*) AS n_new
             |           FROM (SELECT user_id, MIN(di) AS di FROM ev GROUP BY user_id)
             |           GROUP BY di)
             |SELECT daily.di AS day, n_events, dau,
             |  COALESCE(n_new, 0) AS n_new,
             |  CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY daily.di
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
             |FROM daily LEFT JOIN firsts ON daily.di = firsts.di""".stripMargin)
    ),

    // USER-PATH mining: the top-10 most-traveled 3-step event paths
    // (view>click>purchase and friends) — the Sankey/flow summary
    // product analytics reads first. Paths assemble from two lead()
    // frames over ONE per-user time sort (the events_transitions shape
    // extended a step), counts collapse in a map-side partial agg, and
    // the global top-10 is a TakeOrdered heap, never a full sort.
    // event_id breaks same-microsecond ordering ties deterministically.
    "events_paths_top" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .filter(col("t3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path"))
          .limit(10)
      },
      Some("""WITH p AS (
             |  SELECT concat_ws('>', event_type,
             |    lead(event_type, 1) OVER w, lead(event_type, 2) OVER w) AS path,
             |    lead(event_type, 2) OVER w AS t3
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT path, COUNT(*) AS n FROM p WHERE t3 IS NOT NULL
             |GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin)
    ),

    // EWMA smoothing of the daily event-count series — the trend line
    // monitoring dashboards draw. Dyadic weights (2^-k over the last 8
    // OBSERVED days of the type's series — row-offset lags, so a
    // calendar gap makes the window span non-adjacent dates; run
    // timeseries_gap_fill first for strict calendar-day lookback)
    // make every term EXACT in binary floating point
    // (count · 2^-k only shifts the exponent), and both engines fold
    // the same explicit lag chain left-to-right, so even the unrounded
    // smoothed values are bit-identical. Missing leading days shrink
    // the denominator (the standard adjusted-EWMA warm-up) rather than
    // biasing toward zero. One (event_type, day) partial agg, then the
    // lag window over the tiny per-type daily series.
    "window_ewma" -> Query(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("di"))
          .groupBy(col("event_type"), col("di")).agg(count(lit(1)).as("x"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        val terms = (0 to 7).map { k =>
          val lg = if (k == 0) col("x") else lag(col("x"), k).over(w)
          (coalesce(lg, lit(0L)).cast("double") * lit(math.pow(0.5, k)),
            when(lg.isNotNull, lit(math.pow(0.5, k))).otherwise(lit(0.0)))
        }
        val num = terms.map(_._1).reduce(_ + _)
        val den = terms.map(_._2).reduce(_ + _)
        daily.select(col("event_type"), col("di").as("day"), col("x"),
          round(num / den, 6).as("ewma"))
      },
      Some(s"""WITH daily AS (
             |  SELECT event_type, epoch_us(ts) // 86400000000 AS di, COUNT(*) AS x
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, di AS day, x,
             |  ROUND((${(0 to 7).map(k =>
                  if (k == 0) "CAST(x AS DOUBLE) * 1.0"
                  else s"CAST(COALESCE(lag(x, $k) OVER w, 0) AS DOUBLE) * ${math.pow(0.5, k)}")
                  .mkString(" + ")})
             |    / (${(0 to 7).map(k =>
                  if (k == 0) "1.0"
                  else s"CASE WHEN lag(x, $k) OVER w IS NOT NULL THEN ${math.pow(0.5, k)} ELSE 0.0 END")
                  .mkString(" + ")}), 6) AS ewma
             |FROM daily
             |WINDOW w AS (PARTITION BY event_type ORDER BY di)""".stripMargin)
    ),

    // Forward (nearest-future) as-of join: each event picks the EARLIEST
    // order of the same customer with order date >= probe date — the
    // "next action after the event" shape. Same union + one-shuffle
    // window machinery as asof_join, with the frame flipped to
    // (currentRow, unboundedFollowing) and events ordered before
    // same-date orders so an order on the probe date qualifies.
    "asof_join_forward" -> Query(
      (s, d) => {
        val o = dedupedOrders(s, d).select(
          col("o_custkey").as("k"), col("o_date").as("t"),
          lit(1).as("ord"), lit(null).cast("long").as("event_id"),
          col("o_orderkey"), col("o_totalprice"))
        val e = eventProbes(s, d).select(
          col("user_id").as("k"), col("probe_date").as("t"),
          lit(0).as("ord"), col("event_id"),
          lit(null).cast("long").as("o_orderkey"),
          lit(null).cast("double").as("o_totalprice"))
        val w = Window.partitionBy(col("k"))
          .orderBy(col("t"), col("ord"), col("event_id"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        o.unionAll(e)
          .withColumn("next_orderkey", first(col("o_orderkey"), ignoreNulls = true).over(w))
          .withColumn("next_totalprice", first(col("o_totalprice"), ignoreNulls = true).over(w))
          .filter(col("ord") === 0)
          .select(col("event_id"), col("k").as("user_id"),
            date_format(col("t"), "yyyy-MM-dd").as("probe_date"),
            col("next_orderkey"), col("next_totalprice"))
      },
      Some("""WITH o AS (
             |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_date, o_orderkey, o_totalprice
             |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
             |                                     ORDER BY o_orderkey DESC) AS rn FROM orders)
             |  WHERE rn = 1),
             |e AS (
             |  SELECT event_id, user_id,
             |    DATE '1995-01-01' + CAST(event_id % 2400 AS INTEGER) AS probe_date
             |  FROM events)
             |SELECT e.event_id, e.user_id, strftime(e.probe_date, '%Y-%m-%d') AS probe_date,
             |  o.o_orderkey AS next_orderkey, o.o_totalprice AS next_totalprice
             |FROM e ASOF LEFT JOIN o
             |  ON e.user_id = o.o_custkey AND e.probe_date <= o.o_date""".stripMargin)
    ),

    // Interval join: orders within the 30 days before each event probe.
    // Equi key (user) + range predicate -> shuffled hash/sort-merge on the
    // equi key; the range filter never cross-products beyond the key group.
    "range_join" -> Query(
      (s, d) => {
        val e = eventProbes(s, d)
        val o = Tables.orders(s, d).select(
          col("o_custkey"), to_date(col("o_orderdate")).as("o_date"),
          col("o_orderkey"))
        e.join(o,
            col("user_id") === col("o_custkey") &&
            col("o_date") >= date_sub(col("probe_date"), 30) &&
            col("o_date") <= col("probe_date"),
            "left")
          .groupBy(col("event_id"), col("user_id"))
          .agg(count(col("o_orderkey")).as("n_orders_30d"))
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id,
             |    DATE '1995-01-01' + CAST(event_id % 2400 AS INTEGER) AS probe_date
             |  FROM events)
             |SELECT e.event_id, e.user_id, COUNT(o.o_orderkey) AS n_orders_30d
             |FROM e LEFT JOIN orders o
             |  ON e.user_id = o.o_custkey
             | AND CAST(o.o_orderdate AS DATE) BETWEEN e.probe_date - 30 AND e.probe_date
             |GROUP BY e.event_id, e.user_id""".stripMargin)
    ),

    // Gaps-and-islands sessionization: 6h inactivity gap starts a new
    // session. Two windows over one shuffle on (user, time). Session
    // bounds emit epoch MICROS (DuckDB truncates parquet ns to µs).
    "sessionize" -> Query(
      (s, d) => {
        val gapUs = 21600000000L // 6h in µs
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("tus", expr("ts div 1000"))
          .withColumn("new_sess",
            when(col("tus") - lag(col("tus"), 1).over(w) > gapUs ||
                 lag(col("tus"), 1).over(w).isNull, 1L).otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(wRun))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("tus")).as("start_us"), max(col("tus")).as("end_us"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
             |g AS (SELECT *, CASE WHEN tus - LAG(tus) OVER w > 21600000000
             |                       OR LAG(tus) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
             |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM g)
             |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, COUNT(*) AS n_events,
             |  MIN(tus) AS start_us, MAX(tus) AS end_us
             |FROM s GROUP BY user_id, sess_id""".stripMargin)
    ),

    // Time-series gap filling: per-customer monthly order counts with
    // explicit zero rows for the months inside their activity span
    // that had no orders — the densify step every downstream
    // time-series model needs. The month scaffold comes from
    // sequence+explode over each customer's (min, max) month (no
    // calendar table, no cross join against the global date range),
    // then a left join back to the real counts.
    "timeseries_gap_fill" -> Query(
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_custkey"),
          trunc(to_date(col("o_orderdate")), "month").as("m"))
        val counts = o.groupBy(col("o_custkey"), col("m"))
          .agg(count(lit(1)).as("n_orders"))
        val spans = o.groupBy(col("o_custkey"))
          .agg(min(col("m")).as("m0"), max(col("m")).as("m1"))
        val scaffold = spans.select(col("o_custkey"),
          explode(sequence(col("m0"), col("m1"), expr("interval 1 month"))).as("m"))
        scaffold.join(counts, Seq("o_custkey", "m"), "left")
          .select(col("o_custkey"),
            date_format(col("m"), "yyyy-MM-dd").as("month"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      },
      Some("""WITH o AS (SELECT o_custkey,
             |             date_trunc('month', CAST(o_orderdate AS DATE)) AS m
             |           FROM orders),
             |c AS (SELECT o_custkey, m, COUNT(*) AS n_orders FROM o GROUP BY o_custkey, m),
             |sp AS (SELECT o_custkey, MIN(m) AS m0, MAX(m) AS m1 FROM o GROUP BY o_custkey),
             |mg AS (SELECT o_custkey, CAST(unnest(generate_series(CAST(m0 AS TIMESTAMP),
             |                CAST(m1 AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS m
             |       FROM sp)
             |SELECT mg.o_custkey, strftime(mg.m, '%Y-%m-%d') AS month,
             |  COALESCE(c.n_orders, 0) AS n_orders
             |FROM mg LEFT JOIN c ON c.o_custkey = mg.o_custkey AND c.m = mg.m""".stripMargin)
    ),

    // Tumbling 1h window aggregation — batch twin of
    // streaming.WindowedAgg; bucket arithmetic on raw nanos is exact in
    // both engines.
    "window_tumbling" -> Query(
      (s, d) => {
        val hourNs = 3600000000000L
        Tables.events(s, d)
          .withColumn("win_start_ns", col("ts") - (col("ts") % hourNs))
          .groupBy(col("win_start_ns"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      },
      Some("""SELECT epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS win_start_ns, event_type,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)
    ),

    // Last-touch attribution: each purchase credits the user's most
    // recent click within a 7-day lookback — the marketing-analytics
    // staple. Same union + one-shuffle window machinery as asof_join
    // (clicks sort before same-microsecond purchases, event_id breaks
    // exact ties), so the whole attribution is ONE exchange on user_id
    // with two last(ignoreNulls) frames — no self-join, no per-user
    // arrays. The lookback cut applies after the window, keeping the
    // frame unconditional (codegen-friendly) while out-of-window
    // clicks surface as unattributed purchases rather than vanishing.
    "events_attribution" -> Query(
      (s, d) => {
        val lookbackUs = 7L * 86400 * 1000000
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("tus"),
            (col("event_type") === "purchase").cast("int").as("tag"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("tag"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val inWin = col("click_tus").isNotNull &&
          col("tus") - col("click_tus") <= lookbackUs
        ev
          .withColumn("click_tus",
            last(when(col("tag") === 0, col("tus")), ignoreNulls = true).over(w))
          .withColumn("click_id",
            last(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("tus").as("purchase_us"),
            when(inWin, col("click_id")).as("click_id"),
            when(inWin, col("tus") - col("click_tus")).as("delta_us"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
             |             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS tag
             |           FROM events WHERE event_type IN ('click', 'purchase')),
             |w AS (SELECT *,
             |        last_value(CASE WHEN tag = 0 THEN tus END IGNORE NULLS) OVER win AS click_tus,
             |        last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS) OVER win AS click_id
             |      FROM e
             |      WINDOW win AS (PARTITION BY user_id ORDER BY tus, tag, event_id
             |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT event_id AS purchase_id, user_id, tus AS purchase_us,
             |  CASE WHEN click_tus IS NOT NULL AND tus - click_tus <= 604800000000
             |       THEN click_id END AS click_id,
             |  CASE WHEN click_tus IS NOT NULL AND tus - click_tus <= 604800000000
             |       THEN tus - click_tus END AS delta_us
             |FROM w WHERE tag = 1""".stripMargin)
    ),

    // Sequence match WITH NEGATION (MATCH_RECOGNIZE's "A then B then C
    // with no X between"): purchases preceded by a view -> click chain
    // with NO error between the view and the purchase. The exists-any-
    // triple semantics reduce to three chained last(ignoreNulls) frames
    // over ONE per-user sort: a running last-view, the last CLICK's
    // stored last-view (nested as-of — the inner window's value is
    // captured at the click row and itself as-of'd from the purchase),
    // and the running last-error; clean ⟺ that view postdates the
    // error. Running lasts are monotone, which makes the greedy choice
    // (latest click, its latest prior view) optimal — so one shuffle
    // and two window passes replace a 4-way self-join. Sequence order
    // is (event time µs, event_id), both sides.
    "events_clean_funnel" -> Query(
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("view", "click", "purchase", "error"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("ts div 1000").as("tus"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val withLv = ev.withColumn("lv",
          last(when(col("event_type") === "view", col("tus")), ignoreNulls = true).over(w))
        withLv
          .withColumn("lc",
            last(when(col("event_type") === "click", col("tus")), ignoreNulls = true).over(w))
          .withColumn("lc_lv",
            last(when(col("event_type") === "click", col("lv")), ignoreNulls = true).over(w))
          .withColumn("le",
            last(when(col("event_type") === "error", col("tus")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("tus").as("purchase_us"), col("lc").as("click_us"),
            col("lc_lv").as("view_us"), col("le").as("last_error_us"),
            (col("lc_lv").isNotNull &&
              (col("le").isNull || col("lc_lv") > col("le"))).cast("long").as("clean"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
             |           FROM events
             |           WHERE event_type IN ('view', 'click', 'purchase', 'error')),
             |w1 AS (SELECT *,
             |         last_value(CASE WHEN event_type = 'view' THEN tus END IGNORE NULLS)
             |           OVER win AS lv
             |       FROM e
             |       WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id
             |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |w2 AS (SELECT *,
             |         last_value(CASE WHEN event_type = 'click' THEN tus END IGNORE NULLS)
             |           OVER win AS lc,
             |         last_value(CASE WHEN event_type = 'click' THEN lv END IGNORE NULLS)
             |           OVER win AS lc_lv,
             |         last_value(CASE WHEN event_type = 'error' THEN tus END IGNORE NULLS)
             |           OVER win AS le
             |       FROM w1
             |       WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id
             |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT event_id AS purchase_id, user_id, tus AS purchase_us,
             |  lc AS click_us, lc_lv AS view_us, le AS last_error_us,
             |  CAST(lc_lv IS NOT NULL AND (le IS NULL OR lc_lv > le) AS BIGINT) AS clean
             |FROM w2 WHERE event_type = 'purchase'""".stripMargin)
    ),

    // Peak concurrency — "how many sessions were open at once, and
    // when did the peak first happen": the capacity-planning op. The
    // session build (gaps-and-islands, sessionize's machinery) stays
    // fully distributed, and so does the final sweep: the +1/-1
    // endpoint stream (2 rows per session — it SCALES with the event
    // log) range-partitions on the sweep order and cumulates per
    // partition, with only the per-partition delta totals crossing a
    // single-partition window to become broadcast offsets.
    // End-before-start ordering at the same microsecond (delta -1 <
    // +1) makes back-to-back sessions non-overlapping; (user_id)
    // breaks the remaining ties.
    "events_max_concurrency" -> Query(
      (s, d) => {
        val gapUs = 21600000000L
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sessions = Tables.events(s, d)
          .withColumn("tus", expr("ts div 1000"))
          .withColumn("new_sess",
            when(col("tus") - lag(col("tus"), 1).over(w) > gapUs ||
                 lag(col("tus"), 1).over(w).isNull, 1L).otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(wRun))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(min(col("tus")).as("start_us"), max(col("tus")).as("end_us"))
        val points = sessions
          .select(col("user_id"), col("start_us").as("tus"), lit(1L).as("delta"))
          .unionAll(sessions
            .select(col("user_id"), col("end_us").as("tus"), lit(-1L).as("delta")))
        // Distributed sweep (abc_pareto's range-sort machinery): range-
        // repartition the endpoints on the sweep order, per-partition
        // running sums stay partition-local, and only the <=32 partition
        // TOTALS cross a single-partition window to become broadcast
        // offsets — endpoints scale with the event log (2/session), so
        // none of them may ever funnel through one task.
        val sorted = graft.Caches.scoped(points
          .repartitionByRange(32, col("tus"), col("delta"), col("user_id"))
          .sortWithinPartitions(col("tus"), col("delta"), col("user_id"))
          .withColumn("pid", shiftright(monotonically_increasing_id(), 33)))
        val wloc = Window.partitionBy(col("pid"))
          .orderBy(col("tus"), col("delta"), col("user_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offs = sorted.groupBy(col("pid")).agg(sum(col("delta")).as("pn"))
          .withColumn("off",
            coalesce(sum(col("pn")).over(Window.orderBy(col("pid"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("pid"), col("off"))
        val swept = graft.Caches.scoped(sorted
          .withColumn("lconc", sum(col("delta")).over(wloc))
          .join(broadcast(offs), Seq("pid"))
          .withColumn("conc", col("off") + col("lconc")))
        val peak = swept.agg(max(col("conc")).as("peak"))
        swept.crossJoin(broadcast(peak))
          .filter(col("conc") === col("peak"))
          .groupBy(col("peak"))
          .agg(min(col("tus")).as("first_peak_us"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
             |g AS (SELECT *, CASE WHEN tus - LAG(tus) OVER w > 21600000000
             |                       OR LAG(tus) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
             |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM g),
             |sess AS (SELECT user_id, sess_id, MIN(tus) AS start_us, MAX(tus) AS end_us
             |         FROM s GROUP BY 1, 2),
             |pts AS (SELECT user_id, start_us AS tus, CAST(1 AS BIGINT) AS delta FROM sess
             |        UNION ALL
             |        SELECT user_id, end_us, CAST(-1 AS BIGINT) FROM sess),
             |sw AS (SELECT *, SUM(delta) OVER (ORDER BY tus, delta, user_id
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc FROM pts)
             |SELECT CAST(MAX(conc) AS BIGINT) AS peak,
             |  MIN(CASE WHEN conc = (SELECT MAX(conc) FROM sw) THEN tus END) AS first_peak_us
             |FROM sw""".stripMargin)
    ),

    // Session-duration SLOs per user cohort: p50/p90/p99 of session
    // length (µs) over the 6h-gap sessionization, grouped by a 4-way
    // user-id cohort. The quantiles come from GroupedPercentile.exact
    // (histogram-bisect over 1h duration buckets — bounded memory at
    // any session count, REUSING round 9's shared machinery rather
    // than a `percentile` buffer), so the whole chain is: one window
    // per user, one session agg, two bounded passes. Durations are
    // exact integer µs; only the final interpolated quantile is a
    // double, rounded 4dp on both engines.
    "events_session_quantiles" -> Query(
      (s, d) => {
        val gapUs = 21600000000L // 6h in µs
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sess = Tables.events(s, d)
          .withColumn("tus", expr("ts div 1000"))
          .withColumn("new_sess",
            when(col("tus") - lag(col("tus"), 1).over(w) > gapUs ||
                 lag(col("tus"), 1).over(w).isNull, 1L).otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(wRun))
          .groupBy(col("user_id"), col("sess_id"))
          .agg((max(col("tus")) - min(col("tus"))).as("dur_us"))
          .select(pmod(col("user_id"), lit(4)).as("cohort"), col("dur_us"))
        val durs = graft.Caches.scoped(sess)
        GroupedPercentile.exact(durs, "cohort", "dur_us",
            Seq(("p50", 0.50), ("p90", 0.90), ("p99", 0.99)),
            expr("dur_us div 3600000000"), _.cast("double"))
          .withColumn("res", round(col("res"), 4))
          .groupBy(col("cohort"))
          .agg(max(when(col("pname") === "p50", col("res"))).as("p50_us"),
            max(when(col("pname") === "p90", col("res"))).as("p90_us"),
            max(when(col("pname") === "p99", col("res"))).as("p99_us"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
             |g AS (SELECT *, CASE WHEN tus - LAG(tus) OVER w > 21600000000
             |                       OR LAG(tus) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
             |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM g),
             |sess AS (SELECT user_id % 4 AS cohort, MAX(tus) - MIN(tus) AS dur_us
             |         FROM s GROUP BY user_id, sess_id)
             |SELECT cohort,
             |  ROUND(quantile_cont(CAST(dur_us AS DOUBLE), 0.50), 4) AS p50_us,
             |  ROUND(quantile_cont(CAST(dur_us AS DOUBLE), 0.90), 4) AS p90_us,
             |  ROUND(quantile_cont(CAST(dur_us AS DOUBLE), 0.99), 4) AS p99_us
             |FROM sess GROUP BY cohort""".stripMargin)
    )
  )
}
