package graft.plans

import graft.SparkTestSession
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("DotProduct matches the HOF formulation bit-for-bit on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val mismatches = e.as("a")
      .join(e.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(
        VectorFunctions.dot(col("a.embedding"), col("b.embedding")).as("native"),
        VectorFunctions.dotHof(col("a.embedding"), col("b.embedding")).as("hof"))
      .filter(!(col("native") <=> col("hof")))
      .count()
    assert(mismatches === 0L)
  }

  test("DotProduct null semantics: length mismatch and null elements") {
    def arr(xs: Any*) = array(xs.map {
      case d: Double => lit(d); case _ => lit(null).cast("double")
    }: _*)
    val row = spark.range(1).select(
      VectorFunctions.dot(arr(1.0, 2.0), arr(3.0)).as("mismatch"),
      VectorFunctions.dot(arr(1.0, null), arr(3.0, 4.0)).as("nullelem"),
      VectorFunctions.dot(arr(1.0, 2.0), arr(3.0, 4.0)).as("ok")).collect()(0)
    assert(row.isNullAt(0))
    assert(row.isNullAt(1))
    assert(row.getDouble(2) === 11.0)
  }

  test("graft_dot is registered for SQL via GraftExtensions") {
    val v = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(v === 11.0)
  }

  test("graft_cosine is registered and normalizes correctly") {
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS same,
        |       graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS orth,
        |       graft_cosine(array(1.0D, 0.0D), array(-2.0D, 0.0D)) AS anti""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) === 1.0 && r.getDouble(1) === 0.0 && r.getDouble(2) === -1.0)
  }

  test("DotProduct evaluates in interpreted mode too (eval path)") {
    // a literal-only projection goes through ConstantFolding -> eval
    val v = spark.range(1).select(
      VectorFunctions.dot(array(lit(1.0f), lit(2.0f)), array(lit(3.0f), lit(4.0f))).as("d"))
      .collect()(0).getDouble(0)
    assert(v === 11.0)
  }

  test("PqEncode matches the HOF argmin/err formulation on real embeddings") {
    // 2 subspaces x 2 centroids x 2 dims toy codebook over the first 4
    // dims — small enough to cross-check against the explicit HOF form.
    val cents: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.1, -0.2), Seq(-0.3, 0.4)),
      Seq(Seq(0.0, 0.25), Seq(0.5, -0.5)))
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), slice(col("embedding"), 1, 4).as("embedding"))
    def subDist(m: Int, cv: Seq[Double]) =
      aggregate(
        zip_with(slice(transform(col("embedding"), x => x.cast("double")), m * 2 + 1, 2),
          typedlit(cv), (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, x) => acc + x)
    def best(m: Int) =
      sort_array(array((0 until 2).map { j =>
        struct(subDist(m, cents(m)(j)).as("dist"), lit(j.toLong).as("j"))
      }: _*)).getItem(0)
    val hofCode = col("b0.j") * 1L + col("b1.j") * 16L
    val hofErr = col("b0.dist") + col("b1.dist")
    val mismatches = e
      .withColumn("enc", PqExpressions.pqEncode(col("embedding"), cents))
      .withColumn("b0", best(0)).withColumn("b1", best(1))
      .filter(!(col("enc.code") <=> hofCode) || !(col("enc.err") <=> hofErr))
      .count()
    assert(mismatches === 0L)
  }

  test("CentroidRanks matches the HOF sort_array ranking bit-for-bit") {
    // 4 centroids over the first 4 dims, including a DUPLICATED
    // centroid (cids 7 and 3, same vector) so the (dist, cid)
    // tie-break is actually exercised: 3 must always rank before 7.
    val cents: Seq[(Long, Seq[Double])] = Seq(
      (3L, Seq(0.1, -0.2, 0.0, 0.3)),
      (5L, Seq(-0.4, 0.2, 0.1, -0.1)),
      (7L, Seq(0.1, -0.2, 0.0, 0.3)),
      (9L, Seq(0.0, 0.0, 0.0, 0.0)))
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), slice(col("embedding"), 1, 4).as("qv"))
    val hof = sort_array(transform(typedlit(cents), c =>
      struct(
        aggregate(
          zip_with(transform(col("qv"), x => x.cast("double")), c.getField("_2"),
            (x, cc) => (x - cc) * (x - cc)),
          lit(0.0), (acc, x) => acc + x).as("dist"),
        c.getField("_1").as("cid"))))
    val mismatches = e
      .withColumn("native", PqExpressions.centroidRanks(col("qv"), cents, 3))
      .withColumn("hofCids", slice(transform(hof, s => s.getField("cid")), 1, 3))
      .filter(!(col("native") <=> col("hofCids")))
      .count()
    assert(mismatches === 0L)
  }

  test("CentroidRanks null semantics: wrong length and null elements") {
    val cents: Seq[(Long, Seq[Double])] = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 1.0)))
    val row = spark.range(1).select(
      PqExpressions.centroidRanks(array(lit(1.0)), cents, 1).as("badlen"),
      PqExpressions.centroidRanks(array(lit(1.0), lit(null).cast("double")), cents, 1).as("nullelem"),
      PqExpressions.centroidRanks(array(lit(0.9), lit(1.1)), cents, 2).as("ok"))
      .collect()(0)
    assert(row.isNullAt(0))
    assert(row.isNullAt(1))
    assert(row.getSeq[Long](2) === Seq(2L, 1L)) // (1,1) nearer (0.9,1.1) than (0,0)
  }

  test("PqEncode null semantics: wrong length and null elements") {
    val cents: Seq[Seq[Seq[Double]]] =
      Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)))
    val row = spark.range(1).select(
      PqExpressions.pqEncode(array(lit(1.0), lit(2.0), lit(3.0)), cents).as("badlen"),
      PqExpressions.pqEncode(array(lit(1.0), lit(null).cast("double")), cents).as("nullelem"),
      PqExpressions.pqEncode(array(lit(0.9), lit(1.1)), cents).as("ok"))
      .collect()(0)
    assert(row.isNullAt(0))
    assert(row.isNullAt(1))
    val ok = row.getStruct(2)
    assert(ok.getLong(0) === 1L) // centroid (1,1) is nearer (0.9,1.1)
    assert(math.abs(ok.getDouble(1) - (0.01 + 0.01)) < 1e-12)
  }

  test("HyperplaneLshBucket matches the HOF sign-bit fold on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val hof = {
      val bits = (0 until 5).map { p =>
        val coefs = typedlit(graft.functions.VectorFunctions.planeCoefs(7 + p, 64))
        val proj = aggregate(
          zip_with(transform(col("embedding"), x => x.cast("double")), coefs,
            (x, c) => x * c),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }
    val mismatches = e.select(
        VectorExpressions.lshBucket(col("embedding"), 7, 5, 64).as("native"),
        hof.as("hof"))
      .filter(!(col("native") <=> col("hof"))).count()
    assert(mismatches === 0L)
  }

  test("HyperplaneLshBucket fails loudly on a dims mismatch") {
    val ex = intercept[Exception] {
      spark.range(1).select(VectorExpressions.lshBucket(
        array(lit(1.0f), lit(2.0f)), 0, 5, 64)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("SqDistToCentroid matches the per-dim decimal aggregate bit-for-bit") {
    // the exact formulation SqDistToCentroid replaced in VectorOps:
    // per dim, CAST((v[i]-m[i])^2 AS DECIMAL(18,12)), decimal SUM,
    // CAST AS DOUBLE — compared on every (vector, real-centroid) pair
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = e
      .select(col("label").as("clabel"), posexplode(col("embedding")).as(Seq("p", "x")))
      .groupBy(col("clabel"), col("p"))
      .agg((sum(col("x").cast("double").cast("decimal(18,12)")).cast("double")
        / count(lit(1))).as("m"))
      .groupBy(col("clabel"))
      .agg(transform(array_sort(collect_list(struct(col("p"), col("m")))),
        x => x("m")).as("ms"))
    val joined = e.crossJoin(broadcast(cents))
    val agg = joined
      .select(col("vec_id"), col("clabel"),
        posexplode(col("embedding")).as(Seq("p", "x")),
        col("ms"))
      .select(col("vec_id"), col("clabel"),
        ((col("x").cast("double") - element_at(col("ms"), col("p") + 1))
          * (col("x").cast("double") - element_at(col("ms"), col("p") + 1)))
          .cast("decimal(18,12)").as("term"))
      .groupBy(col("vec_id"), col("clabel"))
      .agg(sum(col("term")).cast("double").as("hof"))
    val native = joined.select(col("vec_id"), col("clabel"),
      VectorExpressions.sqDistToCentroid(col("embedding"), col("ms")).as("native"))
    val mismatches = native.join(agg, Seq("vec_id", "clabel"))
      .filter(!(col("native") <=> col("hof"))).count()
    assert(mismatches === 0L)
  }

  test("SqDistToCentroid null semantics: length mismatch and null elements") {
    def farr(xs: Any*) = array(xs.map {
      case d: Double => lit(d.toFloat); case _ => lit(null).cast("float")
    }: _*)
    val row = spark.range(1).select(
      VectorExpressions.sqDistToCentroid(
        farr(1.0, 2.0), array(lit(3.0))).as("mismatch"),
      VectorExpressions.sqDistToCentroid(
        farr(1.0, null), array(lit(3.0), lit(4.0))).as("nullelem"),
      VectorExpressions.sqDistToCentroid(
        farr(1.0, 2.0), array(lit(3.0), lit(4.0))).as("ok")).collect()(0)
    assert(row.isNullAt(0))
    assert(row.isNullAt(1))
    assert(row.getDouble(2) === 8.0)
  }
}
