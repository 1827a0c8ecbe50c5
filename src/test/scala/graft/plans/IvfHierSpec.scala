package graft.plans

import graft.SparkTestSession
import graft.similarity.Ivf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the round-16 hierarchical (coarse→fine)
  * IVF — the properties the DuckDB hash check implies but does not
  * state, pinned so a probe-width/kf refactor fails HERE with a named
  * reason instead of as an opaque oracle mismatch.
  */
class IvfHierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every vector carries exactly hierNprobe x hierFineNprobe assignment keys") {
    val h = Ivf.hierAssignments(spark, sf)
    val want = (Ivf.hierNprobe * Ivf.hierFineNprobe).toLong
    val bad = h.groupBy(col("vec_id")).agg(count(lit(1)).as("c"))
      .filter(col("c") =!= want).count()
    assert(bad === 0L, s"$bad vectors deviate from $want keys")
    // keys are distinct (the equi-join counts each (cid,fid) once per vector)
    assert(h.distinct().count() === h.count())
  }

  test("fine codebook is bounded by hierKf with unique 64-dim entries") {
    val kf = Ivf.hierKf(spark, sf)
    val fine = Ivf.hierFineCentroids(spark, sf)
    // the one-Lloyd-update recipe drops seeds that win zero members
    // (exactly as the oracle's fc1 GROUP BY does — 12 of 16 survive at
    // this corpus), so the codebook is AT MOST kf and never trivial
    assert(fine.size <= kf && fine.size >= 2,
      s"codebook size ${fine.size} outside (2, kf=$kf]")
    assert(fine.map(_._1).distinct.size === fine.size, "fine ids must be unique")
    assert(fine.forall(_._2.size === 64), "64-dim centroids")
    // memoized: second call returns the identical model object
    assert(Ivf.hierFineCentroids(spark, sf) eq fine)
  }

  test("fine cells subdivide coarse cells: more distinct (cid,fid) keys than cid keys") {
    val h = Ivf.hierAssignments(spark, sf)
    val coarse = h.select(col("cid")).distinct().count()
    val cells = h.select(col("cid"), col("fid")).distinct().count()
    assert(cells > coarse,
      s"fine level is degenerate: $cells (cid,fid) cells vs $coarse coarse")
  }
}
