package graft.plans

import graft.SparkTestSession
import graft.similarity.Ivf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-13 pair-candidate generator (Ivf.candidatePairs):
  *
  *  - the exact-duplicate collapse is OUTPUT-PRESERVING: on a planted
  *    corpus with identical-embedding groups, the collapsed generator
  *    emits exactly the naive cell-co-membership pair set;
  *  - the CellCap drop path removes exactly the pairs whose every
  *    shared cell is hot (> cap distinct quantized vectors), proven
  *    with a lowered cap against a spec-side reimplementation of the
  *    rule over the raw assignments.
  *
  * The planted corpus: 400 distinct random unit vectors + 3 groups of
  * 40 bit-identical duplicates (the boilerplate-embedding shape
  * tools/gen_clustered.py stresses at scale).
  */
class IvfCellCapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = graft.etl.TmpDirs.dir("ivfcellcap_corpus")
    val rnd = new scala.util.Random(1313)
    def unit(): Seq[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val base = (0 until 400).map(i => (i.toLong, unit(), i % 10))
    val dups = (0 until 3).flatMap { g =>
      val v = unit()
      (0 until 40).map(j => ((400 + g * 40 + j).toLong, v, 99))
    }
    import spark.implicits._
    (base ++ dups).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  /** Naive capped pair set straight from the per-vector assignments:
    * group by quantized vector for the distinct-qv cell counts, drop
    * hot cells, self-join the survivors. The independent yardstick.
    */
  private def naivePairs(cap: Long): Set[(Long, Long)] = {
    val asg = Ivf.pairAssignments(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val qv = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), Ivf.quantCol.as("qv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val gid = qv.groupBy(_._2).flatMap { case (_, ms) =>
      val g = ms.keys.min; ms.keys.map(_ -> g)
    }
    val hot = asg.map { case (v, c) => c -> gid(v) }.distinct
      .groupBy(_._1).filter(_._2.size > cap).keySet
    val byCell = asg.filterNot { case (_, c) => hot(c) }.groupBy(_._2)
    byCell.values.flatMap { ms =>
      val ids = ms.map(_._1).toSeq
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
  }

  private def got(cap: Long): Set[(Long, Long)] =
    Ivf.candidatePairs(spark, dir, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("duplicate collapse is output-preserving at the default cap") {
    val naive = naivePairs(Ivf.CellCap)
    val pairs = got(Ivf.CellCap)
    assert(naive.nonEmpty)
    // the duplicate groups' cliques must be present in full
    assert((400L to 439L).combinations(2).forall(p => pairs((p(0), p(1)))),
      "a duplicate group's own clique must survive the collapse")
    assert(pairs === naive)
  }

  test("a lowered cap drops exactly the all-hot-shared pairs") {
    val full = naivePairs(Long.MaxValue)
    val capped = naivePairs(4)
    assert(capped.size < full.size,
      "cap=4 must make some cells hot on the planted corpus")
    assert(got(4) === capped)
  }
}
