package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze & Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): a d-dim
  * vector is split into `m` contiguous subvectors of d/m dims, each
  * quantized independently against its own `ksub`-entry codebook, so a
  * vector compresses to m small codes and asymmetric distance (ADC) is
  * m table lookups instead of d multiplies.
  *
  * The codebook layout shared by all three expressions: ONE foldable
  * `array<array<double>>` literal of m·ksub rows, where subspace j's
  * centroids are rows j·ksub … j·ksub+ksub−1, each of length d/m. The
  * matrix is bounded (m·ksub·d/m = ksub·d doubles — the quantizer
  * contract, never corpus-sized) and rides as a reference object, so
  * the generated code is a constant-size loop exactly like
  * [[CentroidArgmax]] — the unrolled composable form (m·ksub inlined
  * slice-dot expressions) would explode codegen size and get cloned
  * into inferred join filters.
  */
private[functions] trait PqCodebook { self: Expression =>
  def cents: Expression
  def m: Int

  @transient protected lazy val matrix: Array[Array[Double]] = {
    val rows = cents.eval(null).asInstanceOf[ArrayData]
    require(rows.numElements() > 0, "codebook must be non-empty")
    require(rows.numElements() % m == 0,
      s"codebook rows (${rows.numElements()}) must be a multiple of m=$m")
    Array.tabulate(rows.numElements()) { j => rows.getArray(j).toDoubleArray() }
  }
  @transient protected lazy val ksub: Int = matrix.length / m
  @transient protected lazy val dsub: Int = matrix.head.length

  protected def checkFoldableCodebook(base: TypeCheckResult): TypeCheckResult =
    if (!base.isSuccess) base
    else if (!cents.foldable)
      TypeCheckResult.TypeCheckFailure("PQ codebook must be a foldable literal")
    else TypeCheckResult.TypeCheckSuccess

  /** Squared L2 distance between subvector j of `v` (elements
    * j·dsub … j·dsub+dsub−1, missing elements read as 0 for short
    * vectors) and codebook row `row` — the one arithmetic both encode
    * and table construction share, folding left-to-right.
    */
  protected def subDist(v: ArrayData, j: Int, row: Int): Double = {
    val c = matrix(row)
    val off = j * dsub
    val nv = v.numElements()
    var s = 0.0
    var i = 0
    while (i < dsub) {
      val x = if (off + i < nv) v.getDouble(off + i) else 0.0
      val t = x - c(i)
      s += t * t
      i += 1
    }
    s
  }
}

/** `graft_pq_encode(vec, codebooks, m)` → `array<int>` of m codes: for
  * each subspace, the 0-based codebook entry (within that subspace)
  * with minimal squared L2 distance to the subvector, ties to the
  * lower code. The corpus-side compression map — pure projection, one
  * constant-size kernel per row.
  */
case class PqEncode(vec: Expression, cents: Expression, m: Int)
  extends Expression with ExpectsInputTypes with PqCodebook {

  require(m > 0, "m must be positive")

  override def children: Seq[Expression] = Seq(vec, cents)
  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = vec.nullable
  override def prettyName: String = "graft_pq_encode"
  override def foldable: Boolean = children.forall(_.foldable)
  override def checkInputDataTypes(): TypeCheckResult =
    checkFoldableCodebook(super.checkInputDataTypes())

  /** Shared scalar kernel (interpreted and generated paths). */
  def encode(v: ArrayData): ArrayData = {
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val d = subDist(v, j, j * ksub + c)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null else encode(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    val vecCode = vec.genCode(ctx)
    ev.copy(code =
      code"""
        |${vecCode.code}
        |boolean ${ev.isNull} = ${vecCode.isNull};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $self.encode(${vecCode.value});
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqEncode =
    copy(vec = newChildren(0), cents = newChildren(1))
}

/** `graft_pq_adc_table(vec, codebooks, m)` → `array<double>` of m·ksub
  * squared L2 distances between each subvector of `vec` and each
  * codebook entry — the per-QUERY distance table built ONCE per query
  * row; every candidate is then scored with m lookups
  * ([[PqAdcSum]]), never touching float vectors again.
  */
case class PqAdcTable(vec: Expression, cents: Expression, m: Int)
  extends Expression with ExpectsInputTypes with PqCodebook {

  require(m > 0, "m must be positive")

  override def children: Seq[Expression] = Seq(vec, cents)
  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = vec.nullable
  override def prettyName: String = "graft_pq_adc_table"
  override def foldable: Boolean = children.forall(_.foldable)
  override def checkInputDataTypes(): TypeCheckResult =
    checkFoldableCodebook(super.checkInputDataTypes())

  /** Shared scalar kernel (interpreted and generated paths). */
  def table(v: ArrayData): ArrayData = {
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        out(j * ksub + c) = subDist(v, j, j * ksub + c)
        c += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null else table(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdcTable", this, classOf[PqAdcTable].getName)
    val vecCode = vec.genCode(ctx)
    ev.copy(code =
      code"""
        |${vecCode.code}
        |boolean ${ev.isNull} = ${vecCode.isNull};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $self.table(${vecCode.value});
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqAdcTable =
    copy(vec = newChildren(0), cents = newChildren(1))
}

/** `graft_pq_adc_sum(dtab, codes, ksub)` → the ADC distance
  * `Σ_j dtab[j·ksub + codes[j]]` — the per-candidate scoring hot path
  * of a PQ scan: m array lookups and adds, no float vectors, fully
  * inside whole-stage codegen. Null if either input is null.
  */
case class PqAdcSum(dtab: Expression, codes: Expression, ksub: Int)
  extends Expression with ExpectsInputTypes {

  require(ksub > 0, "ksub must be positive")

  override def children: Seq[Expression] = Seq(dtab, codes)
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = dtab.nullable || codes.nullable
  override def prettyName: String = "graft_pq_adc_sum"
  override def foldable: Boolean = children.forall(_.foldable)

  /** Shared scalar kernel (interpreted and generated paths). */
  def adc(t: ArrayData, cs: ArrayData): Double = {
    val mm = cs.numElements()
    var s = 0.0
    var j = 0
    while (j < mm) {
      s += t.getDouble(j * ksub + cs.getInt(j))
      j += 1
    }
    s
  }

  override def eval(input: InternalRow): Any = {
    val t = dtab.eval(input)
    if (t == null) return null
    val cs = codes.eval(input)
    if (cs == null) return null
    adc(t.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdcSum", this, classOf[PqAdcSum].getName)
    val tCode = dtab.genCode(ctx)
    val cCode = codes.genCode(ctx)
    ev.copy(code =
      code"""
        |${tCode.code}
        |${cCode.code}
        |boolean ${ev.isNull} = ${tCode.isNull} || ${cCode.isNull};
        |double ${ev.value} = 0.0;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $self.adc(${tCode.value}, ${cCode.value});
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqAdcSum =
    copy(dtab = newChildren(0), codes = newChildren(1))
}
