package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("training merges the most frequent pair first, deterministic ties") {
    // "ab" pair count 5 (weighted), "bc" count 3 -> first merge (a,b)
    val tr = Bpe.train(Seq(("ab", 5L), ("abc", 3L)))
    assert(tr.merges.head === ("a", "b"))
    // after merging everything mergeable, both words collapse fully
    assert(tr.wordTokens("ab") === 1)
    assert(tr.wordTokens("abc") === 1)
  }

  test("unmergeable singletons stay at character count") {
    // every word unique (count 1) -> no pair reaches count 2 except
    // pairs shared ACROSS words, weighted by corpus counts
    val tr = Bpe.train(Seq(("xy", 1L), ("zq", 1L)))
    assert(tr.merges.isEmpty)
    assert(tr.wordTokens("xy") === 2)
  }

  test("applyMerge is left-to-right non-overlapping (the replace() twin)") {
    assert(Bpe.applyMerge(Array("x", "x", "x"), "x", "x").toSeq === Seq("xx", "x"))
    assert(Bpe.applyMerge(Array("x", "y", "x", "y"), "x", "y").toSeq === Seq("xy", "xy"))
    assert(Bpe.applyMerge(Array("a", "x", "y", "b"), "x", "y").toSeq === Seq("a", "xy", "b"))
  }

  test("native replay encoder reproduces the training segmentation on every corpus word") {
    // the exactness contract the oracle relies on: sequential replay
    // of the merge list == training-time segmentation, for ALL words
    val tr = Bpe.trained(spark, sf)
    assert(tr.merges.nonEmpty)
    val words = tr.wordTokens.keys.toSeq.sorted
    import spark.implicits._
    val got = words.toDF("word")
      .select(col("word"),
        graft.plans.TextExpressions.bpeSegmentCount(col("word"), tr.merges).as("nt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(got(w) === tr.wordTokens(w).toLong, s"word '$w'")
    }
  }

  test("MinFreq floor leaves the learned merges unchanged on the test corpus") {
    // the scale guard (hapax words excluded from the driver collect)
    // must be training-invisible here: sub-floor words carry weight 1,
    // so the pairs they alone support rarely reach the >=2 bar
    val floored = Bpe.train(Bpe.wordCounts(spark, sf))
    val unfloored = Bpe.train(Bpe.wordCounts(spark, sf, minFreq = 1L))
    assert(floored.merges === unfloored.merges)
  }

  test("symbols split on code points, tie-breaks use binary UTF-8 order") {
    assert(Bpe.codePointSyms("ab").toSeq === Seq("a", "b"))
    // non-BMP codepoint (surrogate pair) stays ONE symbol
    val gclef = new String(Character.toChars(0x1d11e))
    assert(Bpe.codePointSyms("a" + gclef + "b").toSeq === Seq("a", gclef, "b"))
    // UTF-8 binary order == code-point order: U+1D11E sorts AFTER
    // U+E000 (Java UTF-16 compareTo gets this backwards)
    assert(Bpe.utf8Compare(gclef, "\ue000") > 0)
    assert("\ue000".compareTo(gclef) > 0) // the trap being fixed
    // encoder twin splits identically
    val tr = Bpe.train(Seq(("a" + gclef, 2L)))
    assert(tr.merges === Seq(("a", gclef)))
  }

  test("fertility is non-degenerate: between 1 and the char count") {
    val tr = Bpe.trained(spark, sf)
    val (nt, nc) = tr.wordTokens.foldLeft((0L, 0L)) {
      case ((t, c), (w, n)) => (t + n, c + w.length)
    }
    assert(nt >= tr.wordTokens.size.toLong) // >= 1 token per word
    assert(nt < nc, "BPE must compress below character segmentation")
  }
}
