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

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x
    ))

  /** Sign-bit LSH bucket from `nPlanes` deterministic pseudo-random
    * hyperplanes. Plane p's coefficient for dimension d is derived from
    * md5("p_d") mapped to [-500, 500) — data-independent, identical on
    * every executor without any broadcast of plane matrices.
    */
  def hyperplaneLshBucket(v: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        transform(asDouble(v), (x, i) => {
          val coef = Hashing.md5Long32(concat(lit(s"plane${p}_"), i.cast("string"))) % 1000 - 500
          x * coef.cast("double")
        }),
        lit(0.0), (acc, x) => acc + x
      )
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
