package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Grouped top-k by score: keeps the k (score, payload) pairs with the
  * HIGHEST score per group — ties broken by the LOWEST payload — as a
  * sorted `array<struct<score double, payload string>>`.
  *
  * This is the bounded-memory alternative to the window-sort top-k shape
  * (`row_number() OVER (PARTITION BY g ORDER BY score DESC) <= k`): the
  * window shuffles and sorts EVERY row of every group; this aggregate's
  * buffer is O(k), it partial-aggregates map-side (each map task ships
  * at most k rows per group into the exchange), and no sort of the full
  * group ever happens. At 100 TB — top-k terms per document, top-k
  * neighbors per query, top-k URLs per domain — the window shape
  * shuffles the corpus; this shape shuffles ≤ k·groups rows.
  *
  * Ordering matches SQL `ORDER BY score DESC, payload ASC` with
  * `row_number() <= k` exactly (result position i = rank i+1), so a
  * window-based oracle stays valid.
  */
case class TopKScored(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(Double, UTF8String)]]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def left: Expression = score
  override def right: Expression = payload
  override def inputTypes = Seq(DoubleType, StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("payload", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  /** score DESC, payload ASC — the SQL ranking order. */
  private implicit val ord: Ordering[(Double, UTF8String)] =
    new Ordering[(Double, UTF8String)] {
      override def compare(a: (Double, UTF8String), b: (Double, UTF8String)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // DESC
        if (c != 0) c else a._2.compareTo(b._2)      // ASC tiebreak
      }
    }

  override def createAggregationBuffer(): mutable.TreeSet[(Double, UTF8String)] =
    mutable.TreeSet.empty[(Double, UTF8String)]

  override def update(buf: mutable.TreeSet[(Double, UTF8String)],
      input: InternalRow): mutable.TreeSet[(Double, UTF8String)] = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      // copy: the UTF8String may point into a reused row buffer
      buf += ((s.asInstanceOf[Double], p.asInstanceOf[UTF8String].clone()))
      if (buf.size > k) buf -= buf.last
    }
    buf
  }

  override def merge(buf: mutable.TreeSet[(Double, UTF8String)],
      other: mutable.TreeSet[(Double, UTF8String)]): mutable.TreeSet[(Double, UTF8String)] = {
    other.foreach { x =>
      buf += x
      if (buf.size > k) buf -= buf.last
    }
    buf
  }

  override def eval(buf: mutable.TreeSet[(Double, UTF8String)]): Any =
    new GenericArrayData(buf.toArray.map { case (s, p) =>
      InternalRow(s, p): Any
    })

  override def serialize(buf: mutable.TreeSet[(Double, UTF8String)]): Array[Byte] = {
    val entries = buf.toArray
    val size = 4 + entries.map(e => 8 + 4 + e._2.numBytes()).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (s, p) =>
      bb.putDouble(s)
      val bytes = p.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Double, UTF8String)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = mutable.TreeSet.empty[(Double, UTF8String)]
    var i = 0
    while (i < n) {
      val sc = bb.getDouble
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      s += ((sc, UTF8String.fromBytes(b)))
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScored =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScored =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKScored =
    copy(score = newLeft, payload = newRight)
}

object TopKScored {
  /** Builder for registry use: graft_top_k(score, payload, k) with literal k. */
  def fromExprs(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(s, p, Literal(k: Int, IntegerType)) =>
      TopKScored(s, p, k).toAggregateExpression()
    case _ => throw new IllegalArgumentException(
      "usage: graft_top_k(scoreCol, payloadCol, <literal int k>)")
  }
}
