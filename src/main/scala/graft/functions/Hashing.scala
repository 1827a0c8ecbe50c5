package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic hashing primitives shared by dedup / fingerprint / LSH.
  *
  * Everything derives from `md5(utf8-bytes)` so an external engine (the
  * driver's DuckDB oracle) can reproduce values bit-for-bit:
  * Spark `conv(substring(md5(c),1,15),16,10)` == DuckDB
  * `CAST('0x' || substr(md5(c),1,15) AS BIGINT)`.
  *
  * All composed from codegen'd builtins — no UDFs, whole-stage codegen
  * keeps these inside the scan/project pipeline at any scale.
  */
object Hashing {

  /** 60-bit positive hash of a string column (15 hex chars of md5). */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast(LongType)

  /** 32-bit positive hash (8 hex chars of md5) — safe for sums/products. */
  def md5Long32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast(LongType)

  /** Salted 60-bit hash: one independent hash family member per salt.
    * Used as the "permutation" of MinHash (min over salted hashes is an
    * unbiased Jaccard estimator, same as affine permutations).
    */
  def saltedHash60(salt: Int, c: Column): Column =
    md5Long60(concat(lit(s"${salt}_"), c))

  /** MinHash signature entry i over an array<string> column. */
  def minHash(salt: Int, shingles: Column): Column =
    array_min(transform(shingles, s => saltedHash60(salt, s)))

  /** 60-bit SimHash over an array<string> token column.
    * bit j of the result is set iff sum over tokens of
    * (2*bit_j(md5Long60(token)) - 1) >= 0.
    * Integer-only arithmetic → exact parity with the SQL oracle.
    */
  def simHash60(tokens: Column): Column = {
    val hashes = transform(tokens, t => md5Long60(t))
    val bits = transform(sequence(lit(0), lit(59)), j => {
      val vote = aggregate(
        hashes,
        lit(0L),
        (acc, h) =>
          acc + (call_function("shiftright", h, j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L))
      )
      when(vote >= 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, b) => acc + b)
  }

  /** b-th 15-bit band of a 60-bit SimHash (b in 0..3). */
  def simHashBand(sim: Column, b: Int): Column =
    shiftright(sim, 15 * b).bitwiseAND(lit(0x7FFFL))

  /** Hamming distance between two 60-bit hashes. */
  def hamming60(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast(LongType)

  /** Order-sensitive positional document fingerprint over array<string>:
    * sum over positions i (1-based) of md5Long32("i_token"). Bounded by
    * len * 2^32 so it never overflows int64.
    */
  def positionalFingerprint(tokens: Column): Column =
    aggregate(
      transform(tokens, (t, i) => md5Long32(concat((i + 1).cast("string"), lit("_"), t))),
      lit(0L),
      (acc, h) => acc + h
    )
}
