package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation A/B diagnostic main (round 14 — VERDICT r13 Next
  * #6): measures whether the registered salted plans (`agg_salted_skew`,
  * `join_skew_salted`) actually WIN on a corpus with genuine hot keys
  * (tools/gen_hotkey.py: one user = 30% of events, one event_type =
  * 85%), or whether the engine's own mitigations (map-side partial
  * aggregation for algebraic aggs, broadcast joins for small dims, AQE
  * skew-join splitting for shuffle joins) already neutralize the skew —
  * either answer, MEASURED, is the deliverable. Alongside wall time the
  * harness records the per-variant max single-task runtime (the
  * straggler signature wall time can hide at low parallelism) and
  * total shuffle read bytes via a task-end listener.
  *
  * Variants (the join keeps the registered query's 1-row-per-type dim;
  * the shuffle regime a too-big-to-broadcast dim forces is reproduced
  * by turning the broadcast threshold off, NOT by inflating the dim —
  * replicating dim rows per key would multiply the join output and
  * measure fan-out, not skew):
  *  - agg_plain / agg_salted: groupBy(user_id) sum/count, plain vs
  *    two-stage (user_id, salt) pre-aggregation.
  *  - join_plain_bcast: what the engine does unaided (broadcast).
  *  - join_plain_shuffle: broadcast off, AQE skew-join off — the naive
  *    shuffle join, where the 85% hot type lands on ONE reducer.
  *  - join_plain_aqeskew: broadcast off, AQE skew-join ON (the
  *    engine-native mitigation).
  *  - join_salted_shuffle: broadcast off, the salted plan.
  *
  * Output: one JSON line per run {"variant":…,"runs":[…],"min_sec":…,
  * "max_task_sec":…,"shuffle_read_mb":…}. Not a gate entry — the
  * registered queries' correctness is oracle-checked; this main is the
  * committed evidence behind their VALUE claim (SURVEY §5).
  */
object SkewBench {

  private class TaskStats extends SparkListener {
    @volatile var maxTaskMs = 0L
    @volatile var shuffleReadBytes = 0L
    @volatile var shuffleWriteBytes = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      if (t.taskMetrics != null) {
        maxTaskMs = math.max(maxTaskMs, t.taskMetrics.executorRunTime)
        shuffleReadBytes += t.taskMetrics.shuffleReadMetrics.totalBytesRead
        shuffleWriteBytes += t.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    }
    def reset(): Unit = synchronized {
      maxTaskMs = 0L; shuffleReadBytes = 0L; shuffleWriteBytes = 0L
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sfhk0.1")
    val spark = Session.local()
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)

    def events = Tables.events(spark, sfDir)

    // the registered join_skew_salted dim contract: one row per type
    def dim = events.select(col("event_type")).distinct()
      .withColumn("type_code", length(col("event_type")).cast("long"))

    val aggPlain = () => events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    val aggSalted = () => events
      .withColumn("salt", (col("event_id") % 8).cast("int"))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(18,6)")).as("pv"))
      .groupBy(col("user_id"))
      .agg(sum(col("pn")).as("n_events"),
        sum(col("pv")).cast("double").as("sum_value"))
    val joinPlain = () => events.join(dim, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("type_code")).as("type_code"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    val joinSalted = () => {
      val sdim = dim.withColumn("salt", explode(sequence(lit(0), lit(7))))
      events.withColumn("salt", (col("event_id") % 8).cast("int"))
        .join(sdim, Seq("event_type", "salt"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("type_code")).as("type_code"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    }

    def run(name: String, mk: () => DataFrame,
            broadcastOff: Boolean, aqeSkew: Boolean): Unit = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        if (broadcastOff) "-1" else "10485760")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqeSkew.toString)
      // warm the scan cache once so run 1 isn't billed the cold read
      val _ = mk().queryExecution.toRdd.count()
      // r14 ADVICE: task-end events arrive asynchronously, so stats
      // read right after a job returns can under-count (and warm-up
      // events can bleed past reset() into run 1). listenerBus.
      // waitUntilEmpty is private[spark]; a settle sleep before each
      // reset/read drains the queue for this single-JVM diagnostic.
      // Shuffle bytes and max-task are now recorded PER RUN (arrays,
      // like the times) instead of last-run/cross-run-max mixtures.
      def settle(): Unit = Thread.sleep(500)
      val runs = (1 to 3).map { _ =>
        settle(); stats.reset()
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        settle()
        (dt, stats.maxTaskMs, stats.shuffleReadBytes, stats.shuffleWriteBytes)
      }
      val times = runs.map(_._1)
      println(f"""{"variant":"$name","runs":[${times.map(t => f"$t%.3f").mkString(",")}],""" +
        f""""min_sec":${times.min}%.3f,""" +
        s""""max_task_sec_runs":[${runs.map(r => f"${r._2 / 1e3}%.3f").mkString(",")}],""" +
        s""""shuffle_read_mb_runs":[${runs.map(r => f"${r._3 / 1048576.0}%.2f").mkString(",")}],""" +
        s""""shuffle_write_mb_runs":[${runs.map(r => f"${r._4 / 1048576.0}%.2f").mkString(",")}],""" +
        s""""sf":"$sfDir"}""")
    }

    run("agg_plain", aggPlain, broadcastOff = false, aqeSkew = false)
    run("agg_salted", aggSalted, broadcastOff = false, aqeSkew = false)
    run("join_plain_bcast", joinPlain, broadcastOff = false, aqeSkew = false)
    run("join_plain_shuffle", joinPlain, broadcastOff = true, aqeSkew = false)
    run("join_plain_aqeskew", joinPlain, broadcastOff = true, aqeSkew = true)
    run("join_salted_shuffle", joinSalted, broadcastOff = true, aqeSkew = false)
    spark.stop()
  }
}
