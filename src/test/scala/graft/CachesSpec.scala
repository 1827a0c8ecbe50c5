package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cache-ownership contract (graft.Caches): registered queries may
  * persist shared intermediates (band tables, shingle indexes, LSH hash
  * tables), and the CALLER releases them after materialization. This
  * spec proves releaseAll() actually returns the executor storage — a
  * long-lived library session composing dedup queries must not leak
  * caches one query at a time.
  */
class CachesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def cachedRddCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("releaseAll unpersists every cache a dedup query scoped") {
    spark.catalog.clearCache()
    assert(cachedRddCount === 0)
    // minhash + simhash + jaccard each scope >=1 shared index cache
    Seq("dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard").foreach { q =>
      SparkEntry.queries(q)(spark, sf).count()
    }
    assert(cachedRddCount > 0, "queries should have materialized scoped caches")
    Caches.releaseAll()
    // unpersist(blocking=false) drops blocks asynchronously — poll briefly
    val deadline = System.nanoTime() + 10_000_000_000L
    while (cachedRddCount > 0 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cachedRddCount === 0,
      s"$cachedRddCount cached RDDs survived releaseAll()")
  }

  test("releaseAll is idempotent and safe on an empty registry") {
    Caches.releaseAll()
    Caches.releaseAll()
    assert(cachedRddCount === 0)
  }
}
