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
  * window-based oracle stays valid. MULTISET semantics: two input rows
  * with the same (score, payload) are two results, exactly as
  * row_number() would emit them — the buffer carries an insertion tick
  * as a final tiebreak so identical pairs never collapse (a bare
  * TreeSet of (score, payload) would silently deduplicate them).
  */
case class TopKScored(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKScored.Buf]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  import TopKScored.Buf

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

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      // copy: the UTF8String may point into a reused row buffer
      buf.add(s.asInstanceOf[Double], p.asInstanceOf[UTF8String].clone(), k)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.set.foreach { case (s, p, _) => buf.add(s, p, k) }
    buf
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.set.toArray.map { case (s, p, _) =>
      InternalRow(s, p): Any
    })

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = buf.set.toArray
    val size = 4 + entries.map(e => 8 + 4 + e._2.numBytes()).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (s, p, _) =>
      bb.putDouble(s)
      val bytes = p.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf()
    var i = 0
    while (i < n) {
      val sc = bb.getDouble
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.add(sc, UTF8String.fromBytes(b), k)
      i += 1
    }
    buf
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

  /** score DESC, payload ASC, insertion tick ASC — the tick makes
    * duplicate (score, payload) pairs distinct set elements (multiset
    * semantics) without disturbing the SQL ranking order.
    */
  private val ord: Ordering[(Double, UTF8String, Long)] =
    new Ordering[(Double, UTF8String, Long)] {
      override def compare(a: (Double, UTF8String, Long),
          b: (Double, UTF8String, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // DESC
        if (c != 0) c
        else {
          val c2 = a._2.compareTo(b._2)              // ASC tiebreak
          if (c2 != 0) c2 else java.lang.Long.compare(a._3, b._3)
        }
      }
    }

  /** O(k) top-k buffer: ordered set + a monotone insertion tick. */
  final class Buf {
    val set: mutable.TreeSet[(Double, UTF8String, Long)] =
      mutable.TreeSet.empty(ord)
    private var tick: Long = 0L

    def add(s: Double, p: UTF8String, k: Int): Unit = {
      set += ((s, p, tick))
      tick += 1
      if (set.size > k) set -= set.last
    }
  }

  /** Builder for registry use: graft_top_k(score, payload, k) with literal k. */
  def fromExprs(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(s, p, Literal(k: Int, IntegerType)) =>
      TopKScored(s, p, k).toAggregateExpression()
    case _ => throw new IllegalArgumentException(
      "usage: graft_top_k(scoreCol, payloadCol, <literal int k>)")
  }
}
