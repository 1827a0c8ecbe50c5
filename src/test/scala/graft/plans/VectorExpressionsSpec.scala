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
      case null => lit(null).cast("double"); case d: Double => lit(d)
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
}
