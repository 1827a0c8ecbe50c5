package graft

/** Dev tool: time the named queries N times each at one sf-dir — the
  * inner loop for plan/perf work on a single operator without running
  * the whole bench.
  *
  * Usage: runMain graft.TimeProbe <sfDir> <n> <query...>
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val n = args(1).toInt; val names = args.drop(2)
    val spark = Session.local()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        spark.catalog.clearCache()
        println(f"[timeprobe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
