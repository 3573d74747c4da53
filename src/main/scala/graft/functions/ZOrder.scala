package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve keys as pure column math.
  *
  * `zKey(a, b)` interleaves the low `bits` bits of two non-negative
  * integral dimensions — bit i of `a` lands at position 2i, bit i of
  * `b` at 2i+1 — so points close in BOTH dimensions are close on the
  * 1-D key, which is what lets one range-sorted layout serve range
  * predicates on either dimension (see `Tables.writeZOrdered`).
  *
  * The interleave is the classic magic-number bit spread (4 shift-mask
  * steps per operand, no loop, no UDF — identical in any engine with
  * shift/and/or, so the key is DuckDB-oracle-checkable bit for bit).
  * Inputs are masked to `bits` low bits first; callers quantize real
  * dimensions onto a [0, 2^bits) grid.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions (0 → 0, 1 → 2,
    * … 15 → 30) via the standard mask sequence.
    */
  private[graft] def spread16(x: Column): Column = {
    val s0 = x.bitwiseAND(lit(0xFFFFL))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Reference bit-spread for specs. */
  private[graft] def spread16Local(x: Long): Long = {
    var s = x & 0xFFFFL
    s = (s | (s << 8)) & 0x00FF00FFL
    s = (s | (s << 4)) & 0x0F0F0F0FL
    s = (s | (s << 2)) & 0x33333333L
    s = (s | (s << 1)) & 0x55555555L
    s
  }

  /** Morton key of two non-negative integral columns over their low
    * `bits` bits (1 ≤ bits ≤ 16 → key < 2^(2·bits), fits a long with
    * room to spare).
    */
  def zKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val mask = (1L << bits) - 1
    spread16(a.cast("long").bitwiseAND(lit(mask)))
      .bitwiseOR(shiftleft(spread16(b.cast("long").bitwiseAND(lit(mask))), 1))
  }

  /** DuckDB rendering of [[zKey]] for oracle SQL: same mask chain over
    * the named integer expressions.
    */
  def zKeySql(a: String, b: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 16)
    val mask = (1L << bits) - 1
    def spread(e: String): String = {
      val s0 = s"(($e) & $mask)"
      val s1 = s"((($s0 | ($s0 << 8)) & ${0x00FF00FFL}))"
      val s2 = s"((($s1 | ($s1 << 4)) & ${0x0F0F0F0FL}))"
      val s3 = s"((($s2 | ($s2 << 2)) & ${0x33333333L}))"
      s"((($s3 | ($s3 << 1)) & ${0x55555555L}))"
    }
    s"(${spread(a)} | (${spread(b)} << 1))"
  }
}
