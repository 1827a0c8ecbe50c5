package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Extensions beyond the reference surface (SURVEY §2.8): operators a
  * production training-data pipeline reaches for next. All oracle-checked.
  */
object Extended {

  val entries: Seq[(String, Query)] = Seq(

    // Typed JSON extraction from a string column (events.props) with
    // schema'd from_json — the scan stays columnar, the parse is
    // codegen'd, and the grouped agg is map-side partial. Oracle
    // recovers the same value with a regex (no JSON extension needed).
    "events_json_extract" -> Query(
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"),
            from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
              .getField("k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k")),
      Some("""SELECT event_type,
             |  COUNT(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k,
             |  MIN(k) AS min_k, MAX(k) AS max_k
             |FROM (SELECT event_type,
             |        CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
             |      FROM events)
             |GROUP BY event_type""".stripMargin)
    ),

    // Two-stage salted aggregation — the skew-mitigation pattern for
    // hot keys at 100 TB: partial agg on (key, salt) spreads a hot key
    // over 8 reducers, final agg merges partials. Result provably equals
    // the plain GROUP BY (the oracle).
    "agg_salted_skew" -> Query(
      (s, d) =>
        Tables.events(s, d)
          .withColumn("salt", (col("event_id") % 8).cast("int"))
          .groupBy(col("user_id"), col("salt"))
          .agg(count(lit(1)).as("pn"),
            sum(col("value").cast("decimal(18,6)")).as("pv"))
          .groupBy(col("user_id"))
          .agg(sum(col("pn")).as("n_events"),
            sum(col("pv")).cast("double").as("sum_value")),
      Some("""SELECT user_id, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY user_id""".stripMargin)
    ),

    // Skew-safe JOIN: the build side is replicated across 8 salt values
    // and the (hot-keyed) probe side picks a deterministic salt, so one
    // hot key spreads over 8 reducers instead of melting one. events'
    // 5-value event_type is maximal skew; result provably equals the
    // unsalted join (the oracle).
    "join_skew_salted" -> Query(
      (s, d) => {
        val dim = Tables.events(s, d).select(col("event_type")).distinct()
          .withColumn("type_code", length(col("event_type")).cast("long"))
          .withColumn("salt", explode(sequence(lit(0), lit(7))))
        val probe = Tables.events(s, d)
          .withColumn("salt", (col("event_id") % 8).cast("int"))
        probe.join(dim, Seq("event_type", "salt"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), max(col("type_code")).as("type_code"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      },
      Some("""SELECT e.event_type, COUNT(*) AS n,
             |  CAST(MAX(length(t.event_type)) AS BIGINT) AS type_code,
             |  CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events e JOIN (SELECT DISTINCT event_type FROM events) t
             |  ON e.event_type = t.event_type
             |GROUP BY e.event_type""".stripMargin)
    ),

    // Partitioned-sink round trip: write parquet partitioned by the
    // grouping column (partition pruning for every later read), read it
    // back, prove losslessness against the straight projection.
    "etl_sink_roundtrip" -> Query(
      (s, d) => {
        val dir = graft.etl.TmpDirs.dir(s"sinkrt_${graft.etl.Bucketing.dirTag(d)}")
        graft.etl.Sinks.parquet(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars"), col("source")),
          dir, graft.etl.Sinks.Truncate, partitionBy = Seq("source"))
        s.read.parquet(dir).select(col("doc_id"), col("n_chars"), col("source"))
      },
      Some("SELECT doc_id, n_chars, source FROM documents")
    ),

    // Quality-aware exact-dedup survivor selection: one row per content
    // hash, keeping the longest doc (ties -> lowest doc_id) — the
    // "keep best copy" policy real corpus dedup uses, as a window over
    // the hash partition.
    "dedup_exact_survivor" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("h"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"), md5(col("text")).as("h"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("h"), col("doc_id").as("keep_id"), col("n_chars"))
      },
      Some("""SELECT h, doc_id AS keep_id, n_chars FROM (
             |  SELECT md5(text) AS h, doc_id, n_chars,
             |    ROW_NUMBER() OVER (PARTITION BY md5(text)
             |                       ORDER BY n_chars DESC, doc_id) AS rn
             |  FROM documents) WHERE rn = 1""".stripMargin)
    ),

    // PII-style scrubbing: number runs and email-shaped tokens replaced
    // by placeholder tags; emits the scrubbed digest + how many chars
    // were dropped. Pure regexp_replace — codegen'd, oracle-identical.
    "text_pii_scrub" -> Query(
      (s, d) => {
        val scrubbed = regexp_replace(
          regexp_replace(col("text"), lit("[A-Za-z0-9.]+@[A-Za-z0-9.]+"), lit("<EMAIL>")),
          lit("[0-9]+"), lit("<NUM>"))
        Tables.documents(s, d).select(
          col("doc_id"), md5(scrubbed).as("scrubbed_md5"),
          (length(col("text")) - length(scrubbed)).cast("long").as("chars_delta"))
      },
      Some("""SELECT doc_id,
             |  md5(regexp_replace(regexp_replace(text,
             |        '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
             |      '[0-9]+', '<NUM>', 'g')) AS scrubbed_md5,
             |  CAST(length(text) - length(regexp_replace(regexp_replace(text,
             |        '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
             |      '[0-9]+', '<NUM>', 'g')) AS BIGINT) AS chars_delta
             |FROM documents""".stripMargin)
    ),

    // Mode (most frequent value) per group with deterministic tie-break
    // — two-phase: count per (group, value), then rank. Both phases are
    // partial-aggregatable shuffles.
    "agg_mode" -> Query(
      (s, d) => {
        val counts = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("n").desc, col("l_quantity"))
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
      },
      Some("""SELECT l_returnflag, l_quantity AS mode_qty, n FROM (
             |  SELECT l_returnflag, l_quantity, COUNT(*) AS n,
             |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
             |                       ORDER BY COUNT(*) DESC, l_quantity) AS rn
             |  FROM lineitem GROUP BY l_returnflag, l_quantity)
             |WHERE rn = 1""".stripMargin)
    ),

    // RANGE window frame (value-based, not row-based): rolling 30-day
    // spend per customer. Peers at the same day fall in the frame on
    // both sides identically, so the result is deterministic without a
    // tiebreak.
    "window_range_frame" -> Query(
      (s, d) => {
        val day = datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .cast("long")
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
          .rangeBetween(-30, Window.currentRow)
        Tables.orders(s, d)
          .withColumn("day", day)
          .select(col("o_custkey"), col("o_orderkey"), col("day"),
            sum(col("o_totalprice").cast("decimal(18,6)")).over(w)
              .cast("double").as("sum_30d"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             |    PARTITION BY o_custkey
             |    ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
             |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_30d
             |FROM orders""".stripMargin)
    ),

    // Pure inequality (theta) join — planned as a broadcast nested loop
    // over the (tiny) dims; counts pairs where the nation's region key
    // exceeds the region's key.
    "join_theta_inequality" -> Query(
      (s, d) =>
        Tables.region(s, d)
          .join(Tables.nation(s, d), col("n_regionkey") > col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_pairs")),
      Some("""SELECT r_name, COUNT(*) AS n_pairs
             |FROM region JOIN nation ON n_regionkey > r_regionkey
             |GROUP BY r_name""".stripMargin)
    ),

    // Array-column scalar suite over the embedding vectors: length,
    // element access, explicit head-sum (fixed evaluation order =
    // bit-identical doubles), membership-ish predicates.
    "scalar_array_ops" -> Query(
      (s, d) => {
        def el(i: Int) = element_at(col("embedding"), i).cast("double")
        Tables.embeddings(s, d).select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          el(1).as("first"),
          el(64).as("last"),
          (el(1) + el(2) + el(3) + el(4)).as("head4_sum"),
          (el(1) > 0.0).as("first_pos"))
      },
      Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
             |  CAST(embedding[1] AS DOUBLE) AS first,
             |  CAST(embedding[64] AS DOUBLE) AS last,
             |  CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
             |    + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS head4_sum,
             |  (CAST(embedding[1] AS DOUBLE) > 0.0) AS first_pos
             |FROM embeddings""".stripMargin)
    ),

    // Deterministic per-group uniform sample via the bottom-k hash
    // sketch (graft.functions.BottomKAgg, a typed Aggregator): k
    // smallest md5 hashes of the content per source. Unlike seeded
    // reservoir sampling this is reproducible in ANY engine — the
    // oracle recomputes it with a rank window.
    "agg_bottomk_sample" -> Query(
      (s, d) => {
        val hashed = Tables.documents(s, d).select(col("source"),
          graft.functions.Hashing.md5Long60(col("text")).as("h"))
        hashed.groupBy(col("source"))
          .agg(graft.functions.BottomKAgg.bottomK(col("h"), 8).as("sk"))
          .select(col("source"), posexplode(col("sk")).as(Seq("rank", "h")))
          .select(col("source"), (col("rank") + 1).cast("long").as("rank"), col("h"))
      },
      Some("""SELECT source, CAST(rank AS BIGINT) AS rank, h FROM (
             |  SELECT source, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h,
             |    ROW_NUMBER() OVER (PARTITION BY source
             |                       ORDER BY CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)) AS rank
             |  FROM documents) WHERE rank <= 8""".stripMargin)
    ),

    // Approximate percentiles — the sketch-based scale path for
    // agg_percentiles. The sketch values are engine-specific, so (the
    // agg_approx_distinct pattern) the checked projection carries the
    // EXACT interpolated percentiles (GroupedPercentile's histogram-
    // bisect, the agg_percentiles machinery, 4dp) plus an in-plan
    // within_bound verdict: the approx value must land within 5% of
    // the exact one at both probed quantiles. The oracle recomputes
    // the exact side and asserts within_bound = 1, so a degraded
    // sketch fails the gate. (Exact columns are the yardstick;
    // production keeps only the sketch side.)
    "agg_approx_percentiles" -> Query(
      (s, d) => {
        val approx = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000)).as("a50"),
            approx_percentile(col("l_extendedprice"), lit(0.99), lit(1000)).as("a99"))
        val c = graft.Caches.scoped(Tables.lineitem(s, d).select(col("l_returnflag"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("cents")))
        val exact = graft.operators.GroupedPercentile.exact(
            c, "l_returnflag", "cents", Seq(("p50", 0.50), ("p99", 0.99)),
            expr("cents div 1000000"), _.cast("double") / lit(100.0))
          .groupBy(col("l_returnflag"))
          .agg(
            max(when(col("pname") === "p50", col("res"))).as("e50"),
            max(when(col("pname") === "p99", col("res"))).as("e99"))
        exact.join(approx, Seq("l_returnflag"))
          .select(col("l_returnflag"),
            round(col("e50"), 4).as("p50_exact"),
            round(col("e99"), 4).as("p99_exact"),
            (abs(col("a50") - col("e50")) * 100 <= col("e50") * 5 &&
              abs(col("a99") - col("e99")) * 100 <= col("e99") * 5)
              .cast("long").as("within_bound"))
      },
      Some("""SELECT l_returnflag,
             |  ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50_exact,
             |  ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_exact,
             |  CAST(1 AS BIGINT) AS within_bound
             |FROM lineitem GROUP BY 1""".stripMargin)
    ),

    // GROUPING SETS with mixed granularities (finer-grained than what
    // rollup/cube express) via the native Dataset groupingSets API —
    // no temp view, no session-state mutation.
    "grouping_sets_mixed" -> Query(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupingSets(
            Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
            col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    ),

    // Fixed-width histogram by pure arithmetic binning (engine-agnostic,
    // single map-side-combinable shuffle).
    "agg_histogram" -> Query(
      (s, d) =>
        Tables.orders(s, d)
          .withColumn("bucket",
            least(floor(col("o_totalprice") / 50000), lit(11)).cast("long"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi")),
      Some("""SELECT CAST(LEAST(FLOOR(o_totalprice / 50000), 11) AS BIGINT) AS bucket,
             |  COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
             |FROM orders GROUP BY 1""".stripMargin)
    ),

    // Rank-family windows: percent_rank and cume_dist over a unique
    // total order per group (exact rational values — identical doubles).
    // o_orderstatus has THREE distinct values, so the naive
    // `percent_rank() over (partition by o_orderstatus ...)` puts n/3
    // rows in one window task — the single-task-holds-the-data plan that
    // dies at 100x scale. Instead ranks come from a DISTRIBUTED range
    // sort (group leads the sort key, so each group's rows are contiguous
    // across/within partitions): local rank via monotonically_increasing_id,
    // global per-group rank = (lrank - first lrank of the group in this
    // partition) + cumulative count of the group's rows in earlier
    // partitions. The only windows run over the <=96-row per-partition
    // group COUNTS, never the data. With a unique tiebreak there are no
    // rank ties, so pr=(rnk-1)/(ng-1) and cd=rnk/ng reproduce
    // PERCENT_RANK/CUME_DIST exactly (identical integer operands =>
    // identical IEEE doubles vs the plain-window oracle).
    "window_percent_rank" -> Query(
      (s, d) => {
        val sorted = graft.Caches.scoped(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .repartitionByRange(32, col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
          .sortWithinPartitions(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
          .withColumn("mid", monotonically_increasing_id())
          .withColumn("pid", shiftright(col("mid"), 33))
          .withColumn("lrank", col("mid").bitwiseAND(lit((1L << 33) - 1))))
        val grpPart = sorted.groupBy(col("pid"), col("o_orderstatus"))
          .agg(count(lit(1)).as("pn"), min(col("lrank")).as("lmin"))
        val wOff = Window.partitionBy(col("o_orderstatus")).orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wTot = Window.partitionBy(col("o_orderstatus"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val offs = grpPart
          .withColumn("off", coalesce(sum(col("pn")).over(wOff), lit(0L)))
          .withColumn("ng", sum(col("pn")).over(wTot))
          .select(col("pid"), col("o_orderstatus"), col("lmin"), col("off"), col("ng"))
        sorted.join(broadcast(offs), Seq("pid", "o_orderstatus"))
          .withColumn("rnk", col("off") + (col("lrank") - col("lmin")) + lit(1L))
          .select(col("o_orderkey"), col("o_orderstatus"),
            when(col("ng") === 1, lit(0.0))
              .otherwise((col("rnk") - 1).cast("double") / (col("ng") - 1).cast("double")).as("pr"),
            (col("rnk").cast("double") / col("ng").cast("double")).as("cd"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  PERCENT_RANK() OVER w AS pr, CUME_DIST() OVER w AS cd
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)""".stripMargin)
    ),

    // first_value / last_value / nth_value navigation family over the
    // full-partition frame (explicit UNBOUNDED FOLLOWING — last_value
    // over the default frame is the classic silent bug both engines
    // share, so the frame is pinned identically on both sides).
    "window_first_last" -> Query(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  FIRST_VALUE(o_totalprice) OVER w AS first_price,
             |  LAST_VALUE(o_totalprice) OVER w AS last_price,
             |  NTH_VALUE(o_totalprice, 2) OVER w AS second_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin)
    ),

    // Correlated scalar subquery semantics ("orders above their
    // customer's average") as the decorrelated plan Spark's optimizer
    // would produce anyway: one grouped aggregate + an equi-join. The
    // compare is kept in exact decimal arithmetic (price * n > sum)
    // so no engine-specific fp division decides membership; the oracle
    // states the same predicate in its correlated form.
    "subquery_correlated" -> Query(
      (s, d) => {
        val o = Tables.orders(s, d)
        val perCust = o.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,6)")).as("sum_p"))
        o.join(perCust, Seq("o_custkey"))
          .filter(col("o_totalprice").cast("decimal(18,6)") * col("n") > col("sum_p"))
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
             |WHERE CAST(o_totalprice AS DECIMAL(18,6)) *
             |      (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
             |    > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,6)))
             |       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
    ),

    // Decile assignment via DISTRIBUTED exact ranking, then per-decile
    // stats — the "bucket your corpus by quality score" shape. The naive
    // `ntile(10) over (order by ...)` is a single-partition Window — the
    // plan that dies at 100x scale. Here the total order is realized as a
    // range repartition (a distributed sort: every partition holds a
    // contiguous key range), local ranks come free from
    // monotonically_increasing_id (partition id in the upper bits,
    // in-partition record number in the lower 33 — well-defined because
    // rows are sorted within partitions), and the global rank is local
    // rank + the cumulative offset of the (tiny, broadcast) per-partition
    // counts. The decile formula reproduces NTILE semantics exactly —
    // the first (n mod 10) buckets get ceil(n/10) rows, the rest
    // floor(n/10) — so the unchanged exact-NTILE oracle hash-matches.
    "window_ntile_decile" -> Query(
      (s, d) => {
        val sorted = graft.Caches.scoped(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"))
          .repartitionByRange(32, col("o_totalprice").desc, col("o_orderkey"))
          .sortWithinPartitions(col("o_totalprice").desc, col("o_orderkey"))
          .withColumn("mid", monotonically_increasing_id())
          .withColumn("pid", shiftright(col("mid"), 33))
          .withColumn("lrank", col("mid").bitwiseAND(lit((1L << 33) - 1))))
        val psz = sorted.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
        // cumulative offsets over <= 32 rows: the single-partition window
        // here touches partition COUNTS, never the data
        val offs = psz.withColumn("off",
            coalesce(sum(col("pn")).over(Window.orderBy(col("pid"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("pid"), col("off"))
        val nDf = psz.agg(sum(col("pn")).as("n"))
        sorted.join(broadcast(offs), Seq("pid"))
          .crossJoin(broadcast(nDf))
          .withColumn("rnk", col("off") + col("lrank") + lit(1L))
          .withColumn("decile", expr(
            """CASE WHEN rnk <= (n div 10 + 1) * (n % 10)
              |     THEN (rnk + n div 10) div (n div 10 + 1)
              |     ELSE n % 10 + (rnk - (n div 10 + 1) * (n % 10) + n div 10 - 1) div (n div 10)
              |END""".stripMargin))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("sum_price"))
      },
      Some("""SELECT decile, COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
             |FROM (SELECT o_totalprice,
             |        CAST(NTILE(10) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS decile
             |      FROM orders)
             |GROUP BY decile""".stripMargin)
    ),

    // Schema EVOLUTION round-trip: a long-lived appended table whose
    // writer gained a column mid-life. Two parquet batches land under
    // hive-style partition dirs (b=1995 without o_orderpriority, b=1996
    // with it); the merged read reconciles the schemas (mergeSchema
    // unions footers — per-FILE schema stays pruned/pushed-down) and
    // back-fills NULL for the pre-evolution rows, which the query
    // surfaces via COALESCE. Partition discovery types `b` from the
    // dir name; both engines emit it as BIGINT.
    "etl_schema_evolution" -> Query(
      (s, d) => {
        val dir = graft.etl.TmpDirs.dir(s"schevo_${graft.etl.Bucketing.dirTag(d)}")
        val o = Tables.orders(s, d)
        graft.etl.Sinks.parquet(
          o.filter(year(col("o_orderdate")) === 1995)
            .select(col("o_orderkey"), col("o_totalprice")),
          s"$dir/b=1995", graft.etl.Sinks.Truncate)
        graft.etl.Sinks.parquet(
          o.filter(year(col("o_orderdate")) === 1996)
            .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority")),
          s"$dir/b=1996", graft.etl.Sinks.Truncate)
        s.read.option("mergeSchema", "true").parquet(dir)
          .select(col("o_orderkey"), col("o_totalprice"),
            coalesce(col("o_orderpriority"), lit("(pre-schema)")).as("pri"),
            col("b").cast("long").as("b"))
      },
      Some("""SELECT o_orderkey, o_totalprice, '(pre-schema)' AS pri,
             |  CAST(1995 AS BIGINT) AS b
             |FROM orders WHERE year(o_orderdate) = 1995
             |UNION ALL
             |SELECT o_orderkey, o_totalprice, o_orderpriority AS pri,
             |  CAST(1996 AS BIGINT) AS b
             |FROM orders WHERE year(o_orderdate) = 1996""".stripMargin)
    ),

    // WEIGHTED moments — the survey-analytics / importance-sampling
    // aggregate family (mean and variance where each row carries a
    // weight, here revenue weighted by quantity). One map-side partial
    // agg: the three weighted sums go through exact DECIMAL (Parity
    // policy) so partition order cannot move an ulp, and the derived
    // doubles round to 4dp on both sides. Weighted variance =
    // Σwx²/Σw − (Σwx/Σw)² — algebraic, so the whole thing stays one
    // combine-able pass at any scale.
    "agg_weighted_stats" -> Query(
      (s, d) => {
        import graft.Parity.{dsum, dsumWide}
        val w = col("l_quantity").cast("double")
        val x = col("l_extendedprice").cast("double")
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            dsum(w).as("sw"),
            dsumWide(w * x).as("swx"),
            dsumWide(w * x * x).as("swxx"))
          .select(col("l_returnflag"), col("sw"),
            round(col("swx") / col("sw"), 4).as("wmean"),
            round(col("swxx") / col("sw")
              - (col("swx") / col("sw")) * (col("swx") / col("sw")), 4).as("wvar"),
            round(sqrt(col("swxx") / col("sw")
              - (col("swx") / col("sw")) * (col("swx") / col("sw"))), 4).as("wstddev"))
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sw,
             |    CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(26,4))) AS DOUBLE) AS swx,
             |    CAST(SUM(CAST(l_quantity*l_extendedprice*l_extendedprice AS DECIMAL(26,4))) AS DOUBLE) AS swxx
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, sw,
             |  ROUND(swx/sw, 4) AS wmean,
             |  ROUND(swxx/sw - (swx/sw)*(swx/sw), 4) AS wvar,
             |  ROUND(sqrt(swxx/sw - (swx/sw)*(swx/sw)), 4) AS wstddev
             |FROM m""".stripMargin)
    ),

    // Market-basket pair mining (a-priori support counting): part pairs
    // that co-occur in >= 2 orders. The derivation (l_orderkey
    // equi-self-join, fan-out bounded by per-order line count ~7, so
    // candidate volume is O(orders * lines²/order), never a corpus
    // cross product; distinct() guards against duplicate (order, part)
    // lines double-counting support; pa < pb makes the pair canonical)
    // lives in GraphEdges — this query IS the shared co-purchase index
    // the whole graph family amortizes, read from its materialization.
    "basket_pairs" -> Query(
      (s, d) => GraphEdges.pairs(s, d)
        .select(col("pa"), col("pb"), col("sup").as("support")),
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
             |SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS support
             |FROM li a JOIN li b
             |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin)
    ),

    // ASSOCIATION RULES on top of the basket pairs — confidence and
    // lift, the metrics that turn co-occurrence counts into "customers
    // who bought A also buy B" recommendations. Everything stays
    // integer: confidence and lift ship in scaled fixed point
    // (conf_bp = sup_ab·10000/sup_a; lift_e4 = sup_ab·n·10000/
    // (sup_a·sup_b)) so the rule table hash-checks exactly. Per-item
    // supports are one extra map-side agg on the SAME distinct
    // (order, part) scan; the basket count rides a broadcast.
    "basket_rules" -> Query(
      (s, d) => {
        val li = graft.Caches.scoped(Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")).distinct())
        // pair supports come from the shared materialized co-purchase
        // index; only the per-item supports and basket count rescan li
        val pairs = GraphEdges.pairs(s, d)
          .select(col("pa"), col("pb"), col("sup").as("sup_ab"))
        val item = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("sup"))
        val n = li.agg(countDistinct(col("l_orderkey")).as("n_baskets"))
        pairs
          .join(item.select(col("l_partkey").as("pa"), col("sup").as("sup_a")), Seq("pa"))
          .join(item.select(col("l_partkey").as("pb"), col("sup").as("sup_b")), Seq("pb"))
          .crossJoin(broadcast(n))
          .select(col("pa"), col("pb"), col("sup_ab"), col("sup_a"), col("sup_b"),
            expr("sup_ab * 10000 div sup_a").as("conf_ab_bp"),
            expr("sup_ab * 10000 div sup_b").as("conf_ba_bp"),
            expr("sup_ab * n_baskets * 10000 div (sup_a * sup_b)").as("lift_e4"))
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS sup_ab
             |          FROM li a JOIN li b
             |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |item AS (SELECT l_partkey, COUNT(*) AS sup FROM li GROUP BY 1),
             |nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM li)
             |SELECT pa, pb, sup_ab, ia.sup AS sup_a, ib.sup AS sup_b,
             |  CAST(sup_ab * 10000 // ia.sup AS BIGINT) AS conf_ab_bp,
             |  CAST(sup_ab * 10000 // ib.sup AS BIGINT) AS conf_ba_bp,
             |  CAST(sup_ab * n_baskets * 10000 // (ia.sup * ib.sup) AS BIGINT) AS lift_e4
             |FROM pairs
             |JOIN item ia ON ia.l_partkey = pa
             |JOIN item ib ON ib.l_partkey = pb
             |CROSS JOIN nb""".stripMargin)
    ),

    // Datetime scalar suite — the calendar function surface an
    // analytics engine lives on. Engine convention traps are mapped
    // explicitly: Spark weekday (Monday=0) = DuckDB isodow - 1 (Spark
    // dayofweek counts from Sunday=1, DuckDB from Sunday=0 — both
    // avoided); week = ISO week both sides; add_months clamps to
    // month-end on both. Date-valued outputs ship as formatted strings
    // so neither engine's date/timestamp pandas dtype leaks into the
    // compare.
    "scalar_datetime" -> Query(
      (s, d) =>
        Tables.orders(s, d).select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          month(col("o_orderdate")).cast("long").as("mth"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          weekday(col("o_orderdate")).cast("long").as("wd"),
          weekofyear(col("o_orderdate")).cast("long").as("wk"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("trunc_m"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("ld"),
          date_format(add_months(col("o_orderdate"), 2), "yyyy-MM-dd").as("plus2m"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long").as("dd")),
      Some("""SELECT o_orderkey,
             |  year(o_orderdate) AS y, quarter(o_orderdate) AS q,
             |  month(o_orderdate) AS mth, dayofmonth(o_orderdate) AS dom,
             |  dayofyear(o_orderdate) AS doy,
             |  isodow(o_orderdate) - 1 AS wd,
             |  weekofyear(o_orderdate) AS wk,
             |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS trunc_m,
             |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS ld,
             |  strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2m,
             |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dd
             |FROM orders""".stripMargin)
    ),

    // Conditional-aggregate suite: FILTER-style counts/sums, boolean
    // all/any, and filtered distinct counting — the per-group quality
    // dashboard shape. All conditions evaluate inside one map-side
    // partial agg (one shuffle of 3 groups' partials); the filtered sum
    // goes through DECIMAL per parity policy.
    "agg_conditional" -> Query(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            count(when(col("l_quantity") > 25, 1)).as("n_big"),
            count(when(col("l_discount") === 0.0, 1)).as("n_nodisc"),
            sum(when(col("l_quantity") > 25,
              col("l_extendedprice").cast("decimal(18,6)"))).cast("double").as("big_rev"),
            bool_and(col("l_quantity") > 0).cast("long").as("all_pos"),
            bool_or(col("l_quantity") > 49).cast("long").as("any_max"),
            countDistinct(when(col("l_quantity") > 45, col("l_partkey"))).as("hot_parts")),
      Some("""SELECT l_returnflag,
             |  COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_big,
             |  COUNT(CASE WHEN l_discount = 0.0 THEN 1 END) AS n_nodisc,
             |  CAST(SUM(CASE WHEN l_quantity > 25
             |           THEN CAST(l_extendedprice AS DECIMAL(18,6)) END) AS DOUBLE) AS big_rev,
             |  CAST(bool_and(l_quantity > 0) AS BIGINT) AS all_pos,
             |  CAST(bool_or(l_quantity > 49) AS BIGINT) AS any_max,
             |  COUNT(DISTINCT CASE WHEN l_quantity > 45 THEN l_partkey END) AS hot_parts
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    ),

    // Ordered string aggregation (LISTAGG/string_agg): per-nation
    // roster as a deterministic delimited string. collect_list order is
    // partition-nondeterministic, so the list sorts BEFORE joining —
    // the same contract as the oracle's WITHIN-GROUP ORDER BY. Payload
    // stays bounded (names per nation), the classic listagg use.
    "agg_string_concat" -> Query(
      (s, d) =>
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_members"),
            array_join(array_sort(collect_list(col("c_name"))), "|").as("roster")),
      Some("""SELECT n_name, COUNT(*) AS n_members,
             |  string_agg(c_name, '|' ORDER BY c_name) AS roster
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)
    ),

    // RFM customer scoring (recency / frequency / monetary), the
    // segmentation backbone of behavioral analytics: one partial agg
    // per user, the corpus reference day broadcast as a scalar, and
    // integer CASE thresholds — the monetary compare runs on the exact
    // DECIMAL sum so no float sits on a band boundary. Day arithmetic
    // is integer division of epoch µs.
    "events_rfm" -> Query(
      (s, d) => {
        val p = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            (expr("ts div 1000") / lit(86400000000L)).cast("long").as("day"),
            col("value"))
        val per = p.groupBy(col("user_id"))
          .agg(max(col("day")).as("last_day"), count(lit(1)).as("f"),
            sum(col("value").cast("decimal(18,6)")).as("m"))
        val ref = per.agg(max(col("last_day")).as("ref_day"))
        val rec = col("ref_day") - col("last_day")
        val rScore = when(rec <= 30, 3L).when(rec <= 90, 2L).otherwise(1L)
        val fScore = when(col("f") >= 16, 3L).when(col("f") >= 10, 2L).otherwise(1L)
        val mScore = when(col("m") >= 800, 3L).when(col("m") >= 400, 2L).otherwise(1L)
        per.crossJoin(broadcast(ref))
          .select(col("user_id"), rec.as("recency_days"), col("f"),
            col("m").cast("double").as("monetary"),
            (rScore * 100 + fScore * 10 + mScore).as("rfm"))
      },
      Some("""WITH p AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day, value
             |           FROM events WHERE event_type = 'purchase'),
             |per AS (SELECT user_id, MAX(day) AS last_day, COUNT(*) AS f,
             |          SUM(CAST(value AS DECIMAL(18,6))) AS m
             |        FROM p GROUP BY 1),
             |ref AS (SELECT MAX(last_day) AS ref_day FROM per)
             |SELECT user_id, ref_day - last_day AS recency_days, f,
             |  CAST(m AS DOUBLE) AS monetary,
             |  CAST((CASE WHEN ref_day - last_day <= 30 THEN 3
             |             WHEN ref_day - last_day <= 90 THEN 2 ELSE 1 END) * 100
             |    + (CASE WHEN f >= 16 THEN 3 WHEN f >= 10 THEN 2 ELSE 1 END) * 10
             |    + (CASE WHEN m >= 800 THEN 3 WHEN m >= 400 THEN 2 ELSE 1 END)
             |    AS BIGINT) AS rfm
             |FROM per CROSS JOIN ref""".stripMargin)
    ),

    // Sentence segmentation + per-doc sentence stats — the curation
    // signal family operates on sentences, not just tokens. Regex split
    // on terminal punctuation, trim + drop empties inside the array
    // (no explode: the whole computation is per-row array ops in the
    // scan), integer counts and an exact integer char sum behind the
    // rounded mean.
    "text_sentences" -> Query(
      (s, d) => {
        val sents = filter(
          transform(split(col("text"), "[.!?]+"), x => trim(x)), x => x =!= "")
        Tables.documents(s, d)
          .withColumn("sents", sents)
          .select(col("doc_id"),
            size(col("sents")).cast("long").as("n_sentences"),
            when(size(col("sents")) === 0, lit(null).cast("long"))
              .otherwise(array_max(transform(col("sents"), x => length(x))).cast("long"))
              .as("max_len"),
            when(size(col("sents")) === 0, lit(null).cast("double"))
              .otherwise(round(
                aggregate(col("sents"), lit(0L), (acc, x) => acc + length(x)).cast("double")
                  / size(col("sents")), 4))
              .as("mean_len"))
      },
      Some("""WITH s AS (SELECT doc_id,
             |    list_filter(list_transform(string_split_regex(text, '[.!?]+'),
             |                x -> trim(x)), x -> x <> '') AS sents
             |  FROM documents)
             |SELECT doc_id, len(sents) AS n_sentences,
             |  CASE WHEN len(sents) = 0 THEN NULL
             |       ELSE list_max(list_transform(sents, x -> CAST(length(x) AS BIGINT)))
             |  END AS max_len,
             |  CASE WHEN len(sents) = 0 THEN NULL
             |       ELSE ROUND(CAST(list_sum(list_transform(sents, x -> length(x))) AS DOUBLE)
             |                  / len(sents), 4)
             |  END AS mean_len
             |FROM s""".stripMargin)
    ),

    // HLL sketch MERGE — the property that makes approx-distinct work
    // at warehouse scale: per-group sketches are REAGGREGATABLE, so a
    // rollup over precomputed sketches (hll_union_agg) replaces a
    // second full scan of the raw data. Sketch estimates are
    // engine-specific, so (the agg_approx_distinct pattern) the
    // checked projection carries the EXACT distincts per scope —
    // including the "(all)" scope the UNION path estimates — plus an
    // in-plan within_bound verdict at 5%. The oracle recomputes the
    // exact side and asserts within_bound = 1, so a lossy merge now
    // fails the gate instead of hiding behind a rows-only check.
    "agg_hll_union" -> Query(
      (s, d) => {
        // exact twins from ONE distinct (priority, custkey) pass —
        // per-scope exacts count it grouped, and the union scope's
        // exact (per-group exacts don't re-aggregate) re-dedups the
        // same small frame on custkey alone
        val dk = graft.Caches.scoped(Tables.orders(s, d)
          .select(col("o_orderpriority"), col("o_custkey")).distinct())
        val sk = Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
        val exPer = dk.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("exact"))
        val per = sk.join(exPer, Seq("o_orderpriority"))
          .select(col("o_orderpriority").as("scope"),
            hll_sketch_estimate(col("sk")).as("est"), col("exact"))
        val allExact = dk.select(col("o_custkey")).distinct()
          .agg(count(lit(1)).as("exact"))
        val all = sk.agg(hll_union_agg(col("sk")).as("u"))
          .select(lit("(all)").as("scope"),
            hll_sketch_estimate(col("u")).as("est"))
          .crossJoin(broadcast(allExact))
        per.unionAll(all)
          .select(col("scope"), col("exact").as("exact_custkeys"),
            (abs(col("est") - col("exact")) * 100 <= col("exact") * 5)
              .cast("long").as("within_bound"))
      },
      Some("""SELECT o_orderpriority AS scope,
             |  COUNT(DISTINCT o_custkey) AS exact_custkeys,
             |  CAST(1 AS BIGINT) AS within_bound
             |FROM orders GROUP BY 1
             |UNION ALL
             |SELECT '(all)' AS scope, COUNT(DISTINCT o_custkey) AS exact_custkeys,
             |  CAST(1 AS BIGINT) AS within_bound
             |FROM orders""".stripMargin)
    ),

    // Deletion propagation (right-to-be-forgotten): a forget-list
    // anti-joins every table that carries the subject key, and the
    // audit trail reports per-table before/after/dropped counts — the
    // compliance op a production corpus must run on schedule. The
    // forget list broadcasts (it is always small relative to the
    // corpus); each table pays one scan and a broadcast anti-join, and
    // the audit is a union of per-table aggregates.
    "etl_forget_users" -> Query(
      (s, d) => {
        val forget = Tables.events(s, d)
          .select(col("user_id")).distinct()
          .filter(col("user_id") % 97 === 0)
        val ev = Tables.events(s, d)
        val evKept = ev.join(broadcast(forget), Seq("user_id"), "left_anti")
        val ord = Tables.orders(s, d)
        val ordKept = ord.join(broadcast(forget),
          ord("o_custkey") === forget("user_id"), "left_anti")
        def audit(name: String, before: org.apache.spark.sql.DataFrame,
                  after: org.apache.spark.sql.DataFrame) =
          before.agg(count(lit(1)).as("rows_before"))
            .crossJoin(after.agg(count(lit(1)).as("rows_after")))
            .select(lit(name).as("table_name"), col("rows_before"), col("rows_after"),
              (col("rows_before") - col("rows_after")).as("rows_dropped"))
        audit("events", ev, evKept).unionAll(audit("orders", ord, ordKept))
      },
      Some("""WITH forget AS (SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0)
             |SELECT 'events' AS table_name,
             |  (SELECT COUNT(*) FROM events) AS rows_before,
             |  (SELECT COUNT(*) FROM events
             |   WHERE user_id NOT IN (SELECT user_id FROM forget)) AS rows_after,
             |  (SELECT COUNT(*) FROM events) -
             |  (SELECT COUNT(*) FROM events
             |   WHERE user_id NOT IN (SELECT user_id FROM forget)) AS rows_dropped
             |UNION ALL
             |SELECT 'orders',
             |  (SELECT COUNT(*) FROM orders),
             |  (SELECT COUNT(*) FROM orders
             |   WHERE o_custkey NOT IN (SELECT user_id FROM forget)),
             |  (SELECT COUNT(*) FROM orders) -
             |  (SELECT COUNT(*) FROM orders
             |   WHERE o_custkey NOT IN (SELECT user_id FROM forget))""".stripMargin)
    ),

    // rank vs dense_rank vs row_number on a ties-heavy ordering: ranks
    // share the coarse band ordering (so ties actually exercise the
    // gap/no-gap semantics), row_number adds the key tie-break for
    // determinism. One partition sort serves all three frames.
    "window_rank_family" -> Query(
      (s, d) => {
        val band = floor(col("o_totalprice") / 10000).cast("long")
        val wTies = Window.partitionBy(col("o_orderstatus")).orderBy(col("band").desc)
        val wTotal = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("band").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("band", band)
          .select(col("o_orderkey"), col("o_orderstatus"), col("band"),
            rank().over(wTies).cast("long").as("rnk"),
            dense_rank().over(wTies).cast("long").as("drnk"),
            row_number().over(wTotal).cast("long").as("rn"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, band,
             |  CAST(RANK() OVER wt AS BIGINT) AS rnk,
             |  CAST(DENSE_RANK() OVER wt AS BIGINT) AS drnk,
             |  CAST(ROW_NUMBER() OVER wn AS BIGINT) AS rn
             |FROM (SELECT *, CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS band FROM orders)
             |WINDOW wt AS (PARTITION BY o_orderstatus ORDER BY band DESC),
             |       wn AS (PARTITION BY o_orderstatus ORDER BY band DESC, o_orderkey)""".stripMargin)
    ),

    // Runtime bloom-filter prefilter on a shuffle join — Spark's
    // sideways information passing: the optimizer builds a bloom
    // filter from the SELECTIVE build side (urgent orders) and injects
    // a might_contain prefilter into the fact scan, so most lineitem
    // rows die at the scan instead of crossing the exchange. At 100 TB
    // this is THE lever for selective fact-dim shuffle joins — the
    // shuffle shrinks by the build side's selectivity (~1/5 here)
    // before any join work. The knobs (application-side threshold 0,
    // broadcast off) are set on an isolated child session so the demo
    // can't perturb any other query's plan; results are exact — the
    // bloom only passes false positives onward to the real join
    // (plan-pinned: might_contain + SortMergeJoin).
    "join_bloom_prefilter" -> Query(
      (s, d) => {
        val s2 = s.newSession()
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val sel = Tables.orders(s2, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderdate"))
        Tables.lineitem(s2, d)
          .join(sel, col("l_orderkey") === col("o_orderkey"))
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double").as("sum_price"))
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS n_lines,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY 1""".stripMargin)
    )
  )
}
