package graft

/** Per-round benchmark main: times every registered query at
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Timing forces FULL materialization via `queryExecution.toRdd.count()`
  * — unlike `df.count()`, Catalyst cannot prune the query's columns away,
  * so expression-heavy plans are actually executed. Failures are recorded
  * per-query in an `errors` object instead of masquerading as timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.local()

    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // JIT/classloading warmup so startup cost isn't billed to whichever
    // query happens to run first
    try SparkEntry.queries.get("q1_agg").foreach(run)
    catch { case _: Throwable => () }

    // Each query runs twice; the headline number is the MIN of the two
    // timings (the first execution of a new plan shape pays one-off
    // JIT/codegen cost — measured at 5-12x on some queries — which is a
    // property of the fresh JVM, not of the plan) but BOTH raw runs are
    // recorded under "runs" and the policy is stated in the JSON, so the
    // warm/cold split stays visible to anyone comparing against numbers
    // timed under a different policy. clearCache + Caches.releaseAll
    // between runs and queries releases the self-join indexes the dedup
    // family persists, so no run reads another run's cache and no cache
    // outlives its query.
    // optional args: name prefixes — time only the matching queries
    // (local profiling; the driver passes no args and times everything)
    val only = Option(args).filter(_.nonEmpty).map(_.toSeq)
    val timed = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .map { case (name, fn) =>
      val res =
        try {
          val t1 = run(fn); Caches.releaseAll(); spark.catalog.clearCache()
          val t2 = run(fn)
          Right((t1, t2))
        }
        catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}") }
      Caches.releaseAll()
      spark.catalog.clearCache()
      // stderr progress line per query (stdout stays the one JSON line)
      res match {
        case Right((t1, t2)) => System.err.println(f"[bench] $name%-28s $t1%8.2f $t2%8.2f")
        case Left(m)         => System.err.println(s"[bench] $name ERROR $m")
      }
      name -> res
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""

    val ok = timed.collect { case (n, Right((t1, t2))) => n -> (t1, t2) }
    val errs = timed.collect { case (n, Left(m)) => n -> m }
    val qs = ok.map { case (k, (t1, t2)) => s"${jstr(k)}:${math.min(t1, t2)}" }.mkString("{", ",", "}")
    val rs = ok.map { case (k, (t1, t2)) => s"${jstr(k)}:[$t1,$t2]" }.mkString("{", ",", "}")
    val es = errs.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = ok.map { case (_, (t1, t2)) => math.min(t1, t2) }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","policy":"min-of-2 runs, cache cleared between runs; raw pairs in runs","queries":$qs,"runs":$rs,"errors":$es,"n_ok":${ok.size},"n_err":${errs.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
