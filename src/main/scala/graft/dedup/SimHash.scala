package graft.dedup

import graft.functions.TextFunctions
import graft.plans.TextExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 60-bit SimHash signatures, one row per document.
  *
  * Round 9 moved this from the 60-SUM relational vote fold (explode
  * every token hash, 15 packed-lane aggregates, one shuffle) onto the
  * native `TextExpressions.simHash60` Catalyst expression: ONE
  * codegen'd call per document into a tight JVM loop — no explode, no
  * shuffle, no per-token rows at all. Values are bit-identical to the
  * scalar `Hashing.simHash60` (same md5 + signed-vote integer
  * arithmetic; pinned in TextExpressionsSpec and DedupSpec), so the
  * dedup_simhash / dedup_source_matrix oracles are unchanged.
  */
object SimHash {

  /** @return one row per id: (idCol, sim). Rows with zero tokens drop
    *         out (no hashable content), as the former explode-based
    *         formulation did.
    */
  def relational(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.cleanTokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 1)
      .select(col(idCol), TextExpressions.simHash60(col("__tk")).as("sim"))
}
