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

    // JIT/classloading warmup so startup cost isn't billed to whichever
    // query happens to run first
    try SparkEntry.queries.get("q1_agg")
      .foreach(_(spark, sfDir).queryExecution.toRdd.count())
    catch { case _: Throwable => () }

    val timed = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val res =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}") }
      name -> res
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""

    val ok = timed.collect { case (n, Right(t)) => n -> t }
    val errs = timed.collect { case (n, Left(m)) => n -> m }
    val qs = ok.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errs.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_ok":${ok.size},"n_err":${errs.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
