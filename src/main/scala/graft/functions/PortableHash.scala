package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-reproducible hashing built only from codegen'd Spark SQL
  * primitives (no UDFs), so an independent engine (the DuckDB oracle) can
  * compute bit-identical values from the same arithmetic.
  *
  * Engine-builtin hashes (xxhash64, murmur3) are NOT portable across
  * engines, so every hash that is *observable in query output* (simhash
  * fingerprints, document fingerprints) or that must agree with the
  * oracle goes through these. Internal-only hashes (LSH bucketing, where
  * only the exact-verified result is observable) may use anything.
  */
object PortableHash {
  /** Modulus for the polynomial rolling hash: 1e9+7 (prime). Keeps every
    * intermediate below 2^35, far inside Long range.
    */
  val Mod = 1000000007L

  /** Polynomial rolling hash over the ASCII codes of a string column:
    * h = fold(0, c => h*31 + code(c)) mod 1e9+7.
    *
    * Stays inside whole-stage codegen (transform/aggregate are higher-order
    * functions over an in-memory array, no shuffle). Inputs are expected to
    * be ASCII (the `[A-Za-z]` tokenizer guarantees this — SURVEY.md §2.A A2).
    * The empty-string filter mirrors engines that drop the trailing empty
    * element when splitting into characters.
    */
  def asciiPolyHash(c: Column): Column =
    aggregate(
      transform(filter(split(c, ""), ch => ch =!= lit("")), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % Mod)

  /** Driver-side twin of [[asciiPolyHash]] — same fold, same modulus —
    * for the bounded literals (query panels, seed texts) a composition
    * embeds without a Spark job. Equality with the Column form is
    * pinned in PropertySpec.
    */
  def asciiPolyHashScala(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % Mod)

  /** MinHash permutation family: h_k(x) = (a_k * x + b_k) mod p with
    * p = 2^31 - 1 and deterministic (seed-free) coefficient derivation, so
    * signatures are reproducible across runs and engines. a_k is forced odd
    * and nonzero. Products stay below 2^66? No: a_k < 2^31, x < 2^30
    * (asciiPolyHash output < 1e9+7) => a*x < 2^61, inside Long range.
    */
  val MinHashP = 2147483647L // 2^31 - 1, prime

  def minHashCoeffs(k: Int): (Long, Long) = {
    val a = ((k.toLong * 2654435761L + 1013904223L) % (MinHashP - 1) + 1) | 1L
    val b = (k.toLong * 1103515245L + 12345L) % MinHashP
    (a, b)
  }

  def minHashPerm(h: Column, k: Int): Column = {
    val (a, b) = minHashCoeffs(k)
    (h * lit(a) + lit(b)) % lit(MinHashP)
  }
}
