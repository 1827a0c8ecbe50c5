package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def eval1[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")

  private def evalSeq(c: org.apache.spark.sql.Column): List[String] =
    spark.range(1).select(c.as("v")).collect()(0)
      .getAs[scala.collection.Seq[String]]("v").toList

  test("HeavyHittersAgg keeps every true heavy hitter within the MG error bound") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val k = 20
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), explode(TextFunctions.cleanTokens(col("text"))).as("t"))
    val sketches = toks.groupBy(col("lang"))
      .agg(HeavyHittersAgg.heavyHitters(col("t"), k).as("hh"))
      .as[(String, Map[String, Long])].collect().toMap
    val exact = toks.groupBy(col("lang"), col("t")).count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (l, rows) => l -> rows.map(r => r._2 -> r._3).toMap }
    val totals = exact.map { case (l, m) => l -> m.values.sum }
    assert(sketches.nonEmpty && sketches.keySet == exact.keySet)
    sketches.foreach { case (lang, hh) =>
      val n = totals(lang); val bound = n / (k + 1)
      // coverage: every token with true freq > n/(k+1) must be present
      exact(lang).foreach { case (t, c) =>
        if (c > bound) assert(hh.contains(t), s"$lang/$t freq $c > $bound missing")
      }
      // counts never overcount and undercount by at most the bound
      hh.foreach { case (t, est) =>
        val truth = exact(lang).getOrElse(t, 0L)
        assert(est <= truth, s"$lang/$t overcounted: $est > $truth")
        assert(truth - est <= bound, s"$lang/$t undercount ${truth - est} > $bound")
      }
      assert(hh.size <= k)
    }
  }

  test("md5Long60 matches the DuckDB hex-prefix reduction") {
    // DuckDB: CAST('0x' || substr(md5('hello'),1,15) AS BIGINT)
    assert(eval1[Long](Hashing.md5Long60(lit("hello"))) === 419982666956583591L)
  }

  test("saltedHash60 differs across salts, stable within a salt") {
    val a = eval1[Long](Hashing.saltedHash60(0, lit("x")))
    val b = eval1[Long](Hashing.saltedHash60(1, lit("x")))
    val a2 = eval1[Long](Hashing.saltedHash60(0, lit("x")))
    assert(a !== b); assert(a === a2)
  }

  test("simHash60 is 60-bit and identical docs collide, bands partition it") {
    val toks = split(lit("spark shuffles partitions broadcast join"), " ")
    val s1 = eval1[Long](Hashing.simHash60(toks))
    val s2 = eval1[Long](Hashing.simHash60(toks))
    assert(s1 === s2)
    assert(s1 >= 0 && s1 < (1L << 60))
    val rebuilt = (0 until 4).map(b =>
      eval1[Long](shiftleft(Hashing.simHashBand(lit(s1), b), 15 * b))).sum
    assert(rebuilt === s1)
  }

  test("hamming60 counts differing bits") {
    assert(eval1[Long](Hashing.hamming60(lit(0L), lit(7L))) === 3L)
    assert(eval1[Long](Hashing.hamming60(lit(5L), lit(5L))) === 0L)
  }

  test("positionalFingerprint is order-sensitive") {
    val ab = eval1[Long](Hashing.positionalFingerprint(array(lit("a"), lit("b"))))
    val ba = eval1[Long](Hashing.positionalFingerprint(array(lit("b"), lit("a"))))
    assert(ab !== ba)
    assert(eval1[Long](Hashing.positionalFingerprint(array())) === 0L)
  }

  test("cleanTokens drops leading/trailing whitespace artifacts") {
    val t = evalSeq(TextFunctions.cleanTokens(lit("  a  b \n c  ")))
    assert(t === List("a", "b", "c"))
  }

  test("shingles builds n-grams, short docs collapse to one shingle") {
    val sh = evalSeq(TextFunctions.shingles(split(lit("a b c d"), " "), 3))
    assert(sh === List("a b c", "b c d"))
    val short = evalSeq(TextFunctions.shingles(split(lit("a b"), " "), 3))
    assert(short === List("a b"))
  }

  test("langId picks profile languages, zh via char-level counting") {
    assert(eval1[String](TextFunctions.langId(
      lit("the cat sat on the mat and it is a hat"))) === "en")
    assert(eval1[String](TextFunctions.langId(
      lit("le chat est dans la maison et le chien pour que"))) === "fr")
    // unspaced Chinese — impossible for token-level matching
    assert(eval1[String](TextFunctions.langId(
      lit("我们在这里的人都是不了的"))) === "zh")
  }

  test("qualityScore stays in [0,1] across shapes") {
    Seq("", "short", "the " * 200, "!!!???***", ("word " * 150) + "the a of and to").foreach { s =>
      val q = eval1[Double](TextFunctions.qualityScore(lit(s)))
      assert(q >= 0.0 && q <= 1.0, s"score $q for ${s.take(20)}")
    }
  }

  test("cosine: identical=1, orthogonal=0, antiparallel=-1") {
    def vec(xs: Double*) = array(xs.map(lit): _*)
    assert(math.abs(eval1[Double](
      VectorFunctions.cosine(vec(1, 2, 3), vec(1, 2, 3))) - 1.0) < 1e-12)
    assert(math.abs(eval1[Double](
      VectorFunctions.cosine(vec(1, 0), vec(0, 1)))) < 1e-12)
    assert(math.abs(eval1[Double](
      VectorFunctions.cosine(vec(1, 1), vec(-1, -1))) + 1.0) < 1e-12)
  }

  test("l2 distance and dot products") {
    def vec(xs: Double*) = array(xs.map(lit): _*)
    assert(eval1[Double](VectorFunctions.l2(vec(0, 0), vec(3, 4))) === 5.0)
    assert(eval1[Double](VectorFunctions.dot(vec(1, 2), vec(3, 4))) === 11.0)
  }

  test("hyperplaneLshBucket is deterministic and bounded by plane count") {
    def vec(xs: Double*) = array(xs.map(lit): _*)
    val b1 = eval1[Long](VectorFunctions.hyperplaneLshBucket(vec(1, 2, 3, 4), 6, 4))
    val b2 = eval1[Long](VectorFunctions.hyperplaneLshBucket(vec(1, 2, 3, 4), 6, 4))
    assert(b1 === b2)
    assert(b1 >= 0 && b1 < 64)
    // antiparallel vector flips every sign bit
    val bNeg = eval1[Long](VectorFunctions.hyperplaneLshBucket(vec(-1, -2, -3, -4), 6, 4))
    assert((b1 ^ bNeg) === 63)
  }
}
