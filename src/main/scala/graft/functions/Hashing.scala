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

  /** Rotate-left within the 60-bit hash domain: the low (60−r) bits shift
    * up by r, the high r bits wrap to the bottom. Masking BEFORE the shift
    * keeps every intermediate < 2^60, so the arithmetic never touches the
    * sign bit in either engine. Pure integer ops — no md5.
    *
    * DuckDB equivalent: `((h & ((1<<(60-r))-1)) << r) | (h >> (60-r))`.
    */
  def rotl60(h: Column, r: Int): Column = {
    val rr = ((r % 60) + 60) % 60
    if (rr == 0) h
    else shiftleft(h.bitwiseAND(lit((1L << (60 - rr)) - 1)), rr)
      .bitwiseOR(shiftright(h, 60 - rr))
  }
}
