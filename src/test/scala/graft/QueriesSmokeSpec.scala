package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract smoke: every registered query runs at sf0.001 and every
  * oracle key has a query. (Value-level correctness is the driver's
  * DuckDB gate at sf0.01 — see tools/local_verify.py.)
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      // full materialization, not count-pruned
      assert(df.queryExecution.toRdd.count() >= 0)
    }
  }
}
