package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns.
  *
  * Built on higher-order functions (`zip_with` / `aggregate` /
  * `transform`) which evaluate inside codegen — at 100 TB these run in
  * the scan stage with zero shuffle, unlike any UDF-based formulation.
  * Everything computes in double for cross-engine parity.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product — codegen'd native expression (graft.plans.DotProduct).
    * Bit-identical to `dotHof`, ~10x faster per pair (tight Java loop vs
    * interpreted lambda frames).
    */
  def dot(a: Column, b: Column): Column = graft.plans.VectorExpressions.dot(a, b)

  /** Reference higher-order-function formulation (kept as the
    * cross-check oracle for the native expression; see FunctionsSpec).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x
    ))

  /** Deterministic pseudo-random hyperplane coefficient for (plane, dim):
    * first 32 bits of md5("plane{p}_{d}") mapped to [-500, 500).
    * Computed ONCE driver-side and shipped as literal arrays — the
    * previous per-row md5 formulation evaluated dims×planes hashes per
    * row, which at 100 TB would dominate the whole ANN stage.
    */
  /** The literal coefficient row for plane `p` — exposed so the DuckDB
    * oracle SQL can embed the identical constants.
    */
  def planeCoefs(p: Int, dims: Int): Seq[Double] = (0 until dims).map(planeCoef(p, _))

  private def planeCoef(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane${p}_$d".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % 1000 - 500).toDouble
  }

  /** Sign-bit LSH bucket from `nPlanes` deterministic hyperplanes over a
    * `dims`-dimensional vector. Projection is a codegen'd zip_with over a
    * literal coefficient array — zero per-row hashing, zero broadcast.
    * `planeOffset` selects a disjoint plane family — each table of a
    * multi-table (banded) LSH index uses its own offset.
    */
  def hyperplaneLshBucket(v: Column, nPlanes: Int, dims: Int,
                          planeOffset: Int = 0): Column =
    // native since round 9: one codegen'd call per row instead of
    // nPlanes interpreted aggregate(zip_with(...)) lambda chains;
    // bit-identical values (pinned in VectorExpressionsSpec), loud
    // failure on a dims mismatch as before
    graft.plans.VectorExpressions.lshBucket(v, planeOffset, nPlanes, dims)

  /** DuckDB mirror of `hyperplaneLshBucket(vecExpr, nPlanes, dims, off)`:
    * the identical literal coefficient rows, the identical sequential
    * projection sum (both engines fold the products left-to-right, so the
    * sign compare sees bit-identical doubles). Shared by the ANN and the
    * embedding-dedup oracles.
    */
  def lshBucketSql(planeOffset: Int, nPlanes: Int, dims: Int,
                   vecExpr: String = "embedding"): String =
    (0 until nPlanes).map { p =>
      val coefs = planeCoefs(planeOffset + p, dims).map(c => f"$c%.1f").mkString(", ")
      s"""CASE WHEN list_sum(list_transform(generate_series(1, $dims),
         |  i -> CAST($vecExpr[i] AS DOUBLE) * ([$coefs])[i])) >= 0
         |THEN ${1L << p} ELSE 0 END""".stripMargin
    }.mkString("\n + ")
}
