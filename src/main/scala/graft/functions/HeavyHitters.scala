package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Misra-Gries heavy-hitters sketch aggregate over a long column:
  * `k` counters, one pass, O(k) memory — every item with true frequency
  * > n/(k+1) is guaranteed present, and each reported estimate `est`
  * satisfies `true − n/(k+1) ≤ est ≤ true` (Misra & Gries 1982; the
  * mergeable-summaries form of the merge is Agarwal et al., PODS 2012).
  *
  * This is the one-pass answer to "what dominates this column?" on a
  * table too big to group exactly: the exact `groupBy(col).count()`
  * materializes a key-cardinality-sized shuffle, while this sketch is a
  * bounded partial aggregate — map-side combine produces one O(k)
  * buffer per task and the merge tree never grows past k counters.
  * Feed string keys through [[Hashing.h60]] (join the handful of
  * surviving hashes back to recover the values — the survivors are at
  * most k rows, so the join back is a broadcast).
  *
  * Returns `array<struct<item: long, est: long>>` sorted by estimate
  * descending, item ascending — deterministic for a fixed input SET
  * (the counter state is order-dependent in general, but the decrement
  * bound above holds for every arrival order, which is what the
  * certification query asserts; see q_heavy_hitters).
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (buf.contains(x)) buf(x) += 1L
      else if (buf.size < k) buf(x) = 1L
      else {
        // decrement-all: O(k) only on a miss with a full table
        val dead = mutable.ArrayBuffer.empty[Long]
        buf.foreachEntry { (key, c) =>
          if (c == 1L) dead += key else buf(key) = c - 1L
        }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long], other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (key, c) =>
      buf(key) = buf.getOrElse(key, 0L) + c
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop ≤ 0 —
      // the mergeable-summaries rule that preserves the n/(k+1) bound
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[Long]
      buf.foreachEntry { (key, c) =>
        if (c - cut <= 0L) dead += key else buf(key) = c - cut
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val rows = buf.toArray.sortBy { case (item, est) => (-est, item) }
      .map { case (item, est) =>
        InternalRow(item, est).asInstanceOf[Any] }
    new GenericArrayData(rows)
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreachEntry { (key, c) => bb.putLong(key); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m(bb.getLong) = bb.getLong; i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}

object HeavyHitters {
  /** Builder for registry use: graft_heavy_hitters(col, k) with literal k. */
  def fromExprs(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(child, Literal(k: Int, IntegerType)) =>
      HeavyHitters(child, k).toAggregateExpression()
    case _ => throw new IllegalArgumentException(
      "usage: graft_heavy_hitters(longCol, <literal int k>)")
  }
}
