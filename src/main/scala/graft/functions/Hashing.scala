package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * Everything downstream (minhash, simhash, LSH banding, fingerprints)
  * needs a hash that (a) is stable across runs and partitionings, and
  * (b) can be reproduced bit-for-bit in ANSI SQL by the DuckDB oracle.
  * md5 is the one hash both engines implement identically, so the core
  * primitive is: take the first 15 hex chars of md5 (60 bits — fits a
  * signed 64-bit int with headroom for modular arithmetic) and parse as
  * an integer.
  *
  * DuckDB equivalent: `('0x' || substr(md5(x), 1, 15))::BIGINT`.
  *
  * All expressions here are built-in Catalyst functions (codegen'd,
  * no UDFs) and evaluate per-row — they never force a shuffle.
  */
object Hashing {

  /** 60-bit stable hash of a string column. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Prime modulus for the minhash permutation family (2^31 − 1). */
  val MinhashPrime: Long = 2147483647L

  /** Deterministic (a, b) parameter pairs for the k minhash permutations
    * h_i(x) = (a_i·x + b_i) mod p. Constants derived from the same h60
    * primitive so the DuckDB oracle can re-generate them — but in practice
    * they are fixed literals baked into both sides.
    */
  def minhashParams(k: Int): Seq[(Long, Long)] = (1 to k).map { i =>
    // Simple LCG-style spread; values < 2^31 so a*h stays within 62 bits
    // after h is reduced mod p.
    val a = (1103515245L * i + 12345L) % MinhashPrime
    val b = (134775813L * i + 1L) % MinhashPrime
    (if (a == 0) 1L else a, b)
  }

  /** One minhash permutation applied to a 60-bit hash column:
    * (a·(h mod p) + b) mod p. Stays in 64-bit arithmetic in both engines.
    */
  def permute(h: Column, a: Long, b: Long): Column =
    (lit(a) * (h % MinhashPrime) + lit(b)) % MinhashPrime
}
