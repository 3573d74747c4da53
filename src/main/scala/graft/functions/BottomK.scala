package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** KMV (k-minimum-values) sketch aggregate: the k smallest DISTINCT
  * values of a long column per group, as a sorted array.
  *
  * This is the custom-aggregate slot (SURVEY.md §2.9): a
  * [[TypedImperativeAggregate]] with an O(k) buffer — the bounded-memory
  * alternative to `slice(sort_array(collect_set(x)), 1, k)`, whose
  * buffer is O(group size) and falls over on 100 TB groups. Fed with a
  * uniform hash (e.g. [[Hashing.h60]]), the sketch doubles as a
  * deterministic per-group sample and a distinct-count/Jaccard
  * estimator (the classic KMV construction).
  *
  * Supports partial aggregation: `merge` unions two sketches and
  * re-trims to k, so map-side combine works normally.
  */
case class BottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottom_k"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf += v.asInstanceOf[Long]
      if (buf.size > k) buf -= buf.last
    }
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach { x =>
      buf += x
      if (buf.size > k) buf -= buf.last
    }
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { s += bb.getLong; i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomK =
    copy(child = newChild)
}

object BottomK {
  /** Builder for registry use: graft_bottom_k(col, k) with literal k. */
  def fromExprs(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(child, Literal(k: Int, IntegerType)) => BottomK(child, k).toAggregateExpression()
    case _ => throw new IllegalArgumentException(
      "usage: graft_bottom_k(longCol, <literal int k>)")
  }
}
