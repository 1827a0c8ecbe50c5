package graft

import org.apache.spark.sql.execution.{FormattedMode, SimpleMode}

/** Dev tool: print a registered query's physical plan.
  *
  * Usage: PlanProbe <sfDir> <simple|formatted> <queryName...>
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = if (args(1) == "formatted") FormattedMode else SimpleMode
    val spark = Session.local()
    args.drop(2).foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(mode))
    }
    spark.stop()
  }
}
