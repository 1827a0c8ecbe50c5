package graft

/** Scratch profiling main (not part of the engine surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Session.local()
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    (1 to 4).foreach { i =>
      time(s"q1_agg run $i")(SparkEntry.queries("q1_agg")(spark, sf).queryExecution.toRdd.count())
    }
    (1 to 3).foreach { i =>
      time(s"mm_binary_meta run $i")(SparkEntry.queries("mm_binary_meta")(spark, sf).queryExecution.toRdd.count())
    }
    (1 to 2).foreach { i =>
      time(s"dedup_simhash run $i")(SparkEntry.queries("dedup_simhash")(spark, sf).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
