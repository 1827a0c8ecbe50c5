package graft.plans

import graft.SparkTestSession
import graft.functions.{Hashing, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("HashBucketCountsCsv matches the HOF bucket-count formulation on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = TextFunctions.cleanTokens(col("text"))
    val hof = concat_ws(",", transform(sequence(lit(0), lit(15)),
      i => size(filter(transform(toks, t => Hashing.md5Long32(t) % 16),
        h => h === i)).cast("string")))
    val mismatches = docs.select(
        TextExpressions.hashBucketCountsCsv(toks, 16).as("native"),
        hof.as("hof"))
      .filter(!(col("native") <=> col("hof")))
      .count()
    assert(mismatches === 0L)
  }

  test("HashBucketCountsCsv: empty array and null array") {
    val r = spark.range(1).select(
      TextExpressions.hashBucketCountsCsv(
        array().cast("array<string>"), 4).as("empty"),
      TextExpressions.hashBucketCountsCsv(
        lit(null).cast("array<string>"), 4).as("na")).collect()(0)
    assert(r.getString(0) === "0,0,0,0")
    assert(r.isNullAt(1))
  }

  test("FrameByteSums matches the hex-substring fold on real doc bytes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("bin"))
      .withColumn("hx", lower(hex(col("bin"))))
      .withColumn("n_bytes", length(col("bin")))
      .filter(col("n_bytes") >= 64)
    val hofFrame = docs
      .withColumn("frame_id", explode(sequence(lit(0), expr("n_bytes div 64") - 1)))
      .select(col("doc_id"), col("frame_id"), expr(
        """aggregate(transform(sequence(0, 63),
          |  i -> cast(conv(substring(substring(hx, frame_id*128 + 1, 128), i*2 + 1, 2), 16, 10) as bigint)),
          |  cast(0 as bigint), (a, x) -> a + x)""".stripMargin).as("fsum"))
    val native = docs
      .select(col("doc_id"),
        posexplode(TextExpressions.frameByteSums(col("bin"), 64))
          .as(Seq("frame_id", "fsum")))
    assert(hofFrame.count() > 0)
    assert(native.join(hofFrame, Seq("doc_id", "frame_id"))
      .filter(!(native("fsum") <=> hofFrame("fsum"))).count() === 0L)
    assert(native.count() === hofFrame.count())
  }

  test("FrameByteSums: short input yields empty array, null propagates") {
    val r = spark.range(1).select(
      TextExpressions.frameByteSums(lit("ab").cast("binary"), 64).as("short"),
      TextExpressions.frameByteSums(lit(null).cast("binary"), 64).as("na"))
      .collect()(0)
    assert(r.getSeq[Long](0).isEmpty)
    assert(r.isNullAt(1))
  }

  test("SimHash60 matches the scalar simHash60 fold on every real doc") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = TextFunctions.cleanTokens(col("text"))
    val mismatches = docs.select(
        TextExpressions.simHash60(toks).as("native"),
        Hashing.simHash60(toks).as("scalar"))
      .filter(!(col("native") <=> col("scalar")))
      .count()
    assert(mismatches === 0L)
  }

  test("SimHash60: empty array ties every vote, null array/element propagate") {
    val r = spark.range(1).select(
      TextExpressions.simHash60(array().cast("array<string>")).as("empty"),
      TextExpressions.simHash60(lit(null).cast("array<string>")).as("na"),
      TextExpressions.simHash60(
        array(lit("tok"), lit(null).cast("string"))).as("nelem")).collect()(0)
    assert(r.getLong(0) === (1L << 60) - 1) // all votes 0 >= 0
    assert(r.isNullAt(1))
    assert(r.isNullAt(2))
  }

  test("graft_simhash60 is registered for SQL via GraftExtensions") {
    val sql = spark.sql(
      "SELECT graft_simhash60(array('alpha', 'beta')) AS s").collect()(0).getLong(0)
    val col = spark.range(1).select(
      TextExpressions.simHash60(array(lit("alpha"), lit("beta"))).as("s"))
      .collect()(0).getLong(0)
    assert(sql === col)
  }

  test("ShingleWindows + distinct matches the relational window build row-for-row") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = TextFunctions.cleanTokens(col("text"))
    val tok = docs.select(col("doc_id"), posexplode(toks).as(Seq("pos", "t")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val old = tok.select(col("doc_id"),
        concat_ws(" ", col("t"), lead(col("t"), 1).over(w), lead(col("t"), 2).over(w)).as("sh"),
        lead(col("t"), 2).over(w).as("t2"))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), col("sh"))
      .distinct()
    val nw = docs.select(col("doc_id"),
      explode(TextExpressions.shingles(toks, 3)).as("sh")).distinct()
    assert(nw.exceptAll(old).count() === 0L)
    assert(old.exceptAll(nw).count() === 0L)
  }

  test("ShingleWindows: short array, window order with duplicates, null element") {
    val r = spark.range(1).select(
      TextExpressions.shingles(array(lit("a"), lit("b")), 3).as("short"),
      TextExpressions.shingles(
        array(lit("x"), lit("y"), lit("x"), lit("y"), lit("x")), 3).as("dup"),
      TextExpressions.shingles(
        array(lit("a"), lit(null).cast("string"), lit("c")), 3).as("ne")).collect()(0)
    assert(r.getSeq[String](0) === Seq.empty)
    assert(r.getSeq[String](1) === Seq("x y x", "y x y", "x y x"))
    assert(r.isNullAt(2))
  }

  test("EditBandKeys matches the HOF min-md5 band formulation on real heads") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(substring(col("text"), 1, 60).as("head"))
    val hof = array((0 until 4).map { j =>
      array_min(transform(
        sequence(lit(1), greatest(length(col("head")) - 3, lit(1))),
        i => md5(concat(lit(s"b$j|"), col("head").substr(i, lit(4))))))
    }: _*)
    val mismatches = docs.select(
        TextExpressions.editBandKeys(col("head"), 4).as("native"), hof.as("hof"))
      .filter(!(col("native") <=> col("hof"))).count()
    assert(mismatches === 0L)
  }

  test("ShingleHashes60/32 match the md5Long60/32 of the string windows") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = TextFunctions.cleanTokens(col("text"))
    val strs = TextExpressions.shingles(toks, 3)
    val m60 = docs.select(
        TextExpressions.shingleHashes60(toks, 3).as("native"),
        transform(strs, s => Hashing.md5Long60(s)).as("hof"))
      .filter(!(col("native") <=> col("hof"))).count()
    val m32 = docs.select(
        TextExpressions.shingleHashes32(toks, 3).as("native"),
        transform(strs, s => Hashing.md5Long32(s)).as("hof"))
      .filter(!(col("native") <=> col("hof"))).count()
    assert(m60 === 0L)
    assert(m32 === 0L)
  }
}
