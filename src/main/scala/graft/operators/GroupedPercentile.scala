package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles WITHOUT per-group value
  * buffers — the grouped histogram-bisect two-pass, factored out of
  * `agg_percentiles` so every percentile-hungry operator
  * (`agg_winsorized_mean`, `text_quality_calibrated`, …) shares one
  * bounded-memory implementation instead of Spark's `percentile`
  * aggregate (which holds EVERY group value in its buffer — one hot
  * group at 100 TB is billions of doubles in a single executor).
  *
  * Pass 1 folds a (group, bucket) histogram — one map-side-combinable
  * partial agg; the caller's bucket expression is the knob that bounds
  * pass-2 bucket size at scale. The cumulative locates which bucket
  * holds each requested rank (lo/hi of 1 + p*(n-1)), and pass 2
  * rank-extracts ONLY inside those buckets (row_number partitioned by
  * (group, bucket) + broadcast cumulative offset = exact global rank).
  * No group's values are ever buffered or globally sorted. The final
  * interpolation `v_lo + frac*(v_hi - v_lo)` is the identical IEEE
  * arithmetic Spark's `percentile` and DuckDB's `quantile_cont` run,
  * so results are bit-compatible with both (callers still round
  * derived stats where an engine ulp could surface).
  */
object GroupedPercentile {

  /** @param data   input; must contain `g` and `v`; `v` non-null
    * @param g      group column name
    * @param v      value column name (any ordered numeric)
    * @param ps     (label, fraction) percentile requests
    * @param bucket monotone-in-`v` coarsening of `v` (e.g.
    *               `expr("cents div 1000000")`, `floor(col("q")*64)`);
    *               evaluated in both passes so it must be deterministic
    * @param asDouble how to read `v` as the double both engines
    *               interpolate over (e.g. `_.cast("double")/100.0`
    *               for exact-cents columns, identity for doubles)
    * @return one row per (g, label): (g, pname, res) — res unrounded
    *
    * Wrap `data` in `Caches.scoped` at the call site when the two
    * passes should not rescan an expensive upstream.
    */
  def exact(data: DataFrame, g: String, v: String, ps: Seq[(String, Double)],
            bucket: Column, asDouble: Column => Column): DataFrame = {
    val hist = data.groupBy(col(g), bucket.as("bkt"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cumhi", sum(col("cnt")).over(
        Window.partitionBy(col(g)).orderBy(col("bkt"))))
      .withColumn("cumlo", col("cumhi") - col("cnt"))
    // 2 rank requests per (group, percentile): the bracketing ranks
    // klo = floor(p*(n-1))+1 and khi = klo+1 (clamped), plus the
    // interpolation fraction. n comes from the histogram, not a second
    // scan. O(groups * |ps|) rows — broadcast material.
    val reqs = hist.groupBy(col(g)).agg(sum(col("cnt")).as("n"))
      .select(col(g), col("n"),
        explode(array(ps.map { case (nm, p) =>
          struct(lit(nm).as("pname"), lit(p).as("p")) }: _*)).as("pp"))
      .withColumn("pos0", col("pp.p") * (col("n") - 1).cast("double"))
      .withColumn("klo", (floor(col("pos0")) + 1).cast("long"))
      .withColumn("khi", least(col("klo") + 1, col("n")))
      .withColumn("frac", col("pos0") - floor(col("pos0")))
    val ranks = reqs.select(col(g).as("rf"), col("pp.pname").as("pname"),
        col("frac"),
        explode(array(
          struct(lit("lo").as("which"), col("klo").as("k")),
          struct(lit("hi").as("which"), col("khi").as("k")))).as("rk"))
      .select(col("rf"), col("pname"), col("frac"),
        col("rk.which").as("which"), col("rk.k").as("k"))
    // buckets holding any requested rank — pass 2 touches only these
    val tbkts = cum.join(broadcast(ranks.select(col("rf"), col("k"))),
        col("rf") === col(g) &&
          col("k") > col("cumlo") && col("k") <= col("cumhi"))
      .select(col("rf").as("tf"), col("bkt").as("tb"), col("cumlo")).distinct()
    val inb = data.join(broadcast(tbkts),
        col(g) === col("tf") && bucket === col("tb"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("tf"), col("tb")).orderBy(col(v))))
      .select(col("tf"), (col("cumlo") + col("rn")).as("pos"), col(v))
    inb.join(broadcast(ranks),
        col("tf") === col("rf") && col("pos") === col("k"))
      .select(col("rf"), col("pname"), col("which"), col("frac"),
        asDouble(col(v)).as("v"))
      .groupBy(col("rf").as(g), col("pname"), col("frac"))
      .agg(max(when(col("which") === "lo", col("v"))).as("vlo"),
        max(when(col("which") === "hi", col("v"))).as("vhi"))
      .select(col(g), col("pname"),
        (col("vlo") + col("frac") * (col("vhi") - col("vlo"))).as("res"))
  }
}
