package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-min sketch aggregate (Cormode & Muthukrishnan 2005) over a
  * long column: `depth` rows of `width` counters; item x increments one
  * counter per row (cell h_d(x) mod width), a point query reads the MIN
  * over its depth cells. Guarantees, for ANY arrival order and
  * partitioning (counters are sums — the sketch is fully
  * order-invariant, unlike Misra-Gries): est(x) ≥ true(x) always, and
  * est(x) ≤ true(x) + εN with probability 1−δ for width = ⌈e/ε⌉,
  * depth = ⌈ln 1/δ⌉.
  *
  * Where [[HeavyHitters]] answers "what dominates?" in k counters,
  * this answers "how often does ANY given item occur?" in width·depth
  * counters — the frequency-estimate side of the one-pass toolkit
  * (token counts over a corpus, join-key frequency for skew planning).
  * O(width·depth) buffer, map-side partials, element-wise-sum merge.
  *
  * The row hash is EXACTLY [[Hashing.h60]] of the string `"d:x"` —
  * deliberately the repo's engine-portable hash, so an external engine
  * can replay the ENTIRE sketch cell-for-cell and every estimate is
  * value-level checkable (q_count_min hash-checks estimates, not just
  * guarantee booleans). md5 per (row, depth) is the demo-scale price
  * of that replayability; a production sketch at 100 TB would swap in
  * xxhash/murmur (one multiply-shift per depth) — the plan shape is
  * identical.
  */
case class CountMinSketch(
    child: Expression,
    width: Int,
    depth: Int,
    weight: Expression = Literal(1L),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(width > 0 && depth > 0, "width and depth must be positive")

  override def left: Expression = child
  override def right: Expression = weight
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](width * depth)

  /** h60("d:x") — must stay bit-identical to [[Hashing.h60]] over
    * `concat(lit(d + ":"), x.cast("string"))` (and its DuckDB
    * rendering) or sketch replay breaks.
    */
  private def cell(d: Int, x: Long): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d:$x".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % width).toInt
  }

  /** Counters are sums, so a weighted insert of (x, w) is exactly w unit
    * inserts of x — the pre-aggregated build path (build the sketch from
    * a grouped (item, count) table in |distinct| hash evals, not |rows|).
    * Null item or null weight contributes nothing. A NEGATIVE weight
    * fails loudly: decrementing counters would break the sketch's
    * one-sided est >= true-count guarantee the certification rows rely
    * on (count-min is not count-mean-min; deletions need a different
    * sketch).
    */
  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      if (w != null && w.asInstanceOf[Long] != 0L) {
        val x = v.asInstanceOf[Long]
        val inc = w.asInstanceOf[Long]
        if (inc < 0L) throw new IllegalArgumentException(
          s"graft_count_min: negative weight $inc for item $x — " +
            "count-min counters are monotone (est >= true requires w >= 0)")
        var d = 0
        while (d < depth) { buf(d * width + cell(d, x)) += inc; d += 1 }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinSketch =
    copy(child = newLeft, weight = newRight)
}

object CountMinSketch {
  /** Builder for registry use: graft_count_min(col, width, depth) or the
    * weighted form graft_count_min(col, weightCol, width, depth).
    */
  def fromExprs(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(child, Literal(w: Int, IntegerType), Literal(d: Int, IntegerType)) =>
      CountMinSketch(child, w, d).toAggregateExpression()
    case Seq(child, weight, Literal(w: Int, IntegerType), Literal(d: Int, IntegerType)) =>
      CountMinSketch(child, w, d, weight).toAggregateExpression()
    case _ => throw new IllegalArgumentException(
      "usage: graft_count_min(longCol[, longWeightCol], <literal int width>, <literal int depth>)")
  }
}
