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

  test("guarded hier pairs equal the raw (cid,fid) self-join when the cap is off") {
    // the duplicate collapse + re-expansion in hierCandidatePairs is
    // OUTPUT-PRESERVING: equal qv ⇒ equal residuals ⇒ equal keys, so
    // the rep join re-expanded must reproduce the all-vector join
    val h = Ivf.hierAssignments(spark, sf)
    val raw = h.as("a")
      .join(h.as("b"),
        col("a.cid") === col("b.cid") && col("a.fid") === col("b.fid") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val guarded = Ivf.hierCandidatePairs(spark, sf, cap = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(raw.nonEmpty)
    assert(guarded === raw)
  }

  test("a duplicate spike survives collapse and a binding cap really drops buckets") {
    // planted corpus: 200 unique vectors + one 30-copy boilerplate
    // spike — the collapse must keep the spike's own clique intact,
    // and cap=1 must shrink the candidate set (every >=2-rep bucket
    // drops) without touching the spike clique (within-group pairs
    // ride the expansion, not the bucket join)
    val d = graft.etl.TmpDirs.dir("ivfhier_corpus")
    val rnd = new scala.util.Random(4242)
    def unit(): Seq[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val base = (0 until 200).map(i => (i.toLong, unit(), i % 10))
    val spikeV = unit()
    val spike = (0 until 30).map(j => ((200 + j).toLong, spikeV, 99))
    import spark.implicits._
    (base ++ spike).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val full = Ivf.hierCandidatePairs(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((200L to 229L).combinations(2).forall(p => full((p(0), p(1)))),
      "the duplicate group's own clique must survive the collapse")
    // a binding cap drops buckets (the contract bounds per-bucket join
    // work; pairs whose EVERY shared bucket is hot drop too — same
    // semantics as the flat CellCap, asserted at the default cap above)
    val capped = Ivf.hierCandidatePairs(spark, d, cap = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.size < full.size, "cap=1 must drop candidate pairs")
  }

  test("fine cells subdivide coarse cells: more distinct (cid,fid) keys than cid keys") {
    val h = Ivf.hierAssignments(spark, sf)
    val coarse = h.select(col("cid")).distinct().count()
    val cells = h.select(col("cid"), col("fid")).distinct().count()
    assert(cells > coarse,
      s"fine level is degenerate: $cells (cid,fid) cells vs $coarse coarse")
  }
}
