package graft.dedup

import graft.functions.{Hashing, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational 60-bit SimHash: one md5 per token, bit votes as 60
  * codegen'd SUM aggregates over the exploded hashes. Identical values
  * to the scalar `Hashing.simHash60` (same integer arithmetic), ~10x
  * faster per doc — the formulation both the dedup_simhash query and
  * the curation pipeline share.
  */
object SimHash {

  /** @return one row per id: (idCol, sim). Rows with zero tokens drop
    *         out (no hashable content).
    *
    * The 60 per-bit ONES counters are packed 4-per-long in 16-bit lanes
    * (15 SUM aggregates + a count instead of 60 sums): lane sums cannot
    * carry below 65536 tokens/doc, far above any real document. Bit j is
    * set iff 2*ones_j >= n — algebraically identical to the signed-vote
    * formulation (vote = 2*ones - n >= 0), so values match the scalar
    * simHash60 and the DuckDB oracle exactly.
    */
  def relational(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val th = docs
      .select(col(idCol).as("__id"),
        explode(TextFunctions.cleanTokens(col(textCol))).as("tn"))
      .select(col("__id"), Hashing.md5Long60(col("tn")).as("h"))
    val laneAggs = (0 until 15).map { k =>
      sum((0 until 4).map { l =>
        shiftright(col("h"), 4 * k + l).bitwiseAND(lit(1L)) * lit(1L << (16 * l))
      }.reduce(_ + _)).as(s"p$k")
    }
    val agg = th.groupBy(col("__id"))
      .agg(laneAggs.head, (laneAggs.tail :+ count(lit(1)).as("n")): _*)
    val sim = (0 until 60).map { j =>
      val ones = shiftright(col(s"p${j / 4}"), 16 * (j % 4)).bitwiseAND(lit(0xFFFFL))
      when(ones * 2 >= col("n"), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("__id").as(idCol), sim.as("sim"))
  }
}
