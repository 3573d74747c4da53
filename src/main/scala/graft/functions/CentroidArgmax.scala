package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Max-cosine centroid assignment as ONE codegen'd expression:
  * `graft_centroid_argmax(vec, centroidMatrix, clusterIds)` returns the
  * cluster id whose centroid has the highest cosine with `vec`, ties to
  * the lowest id, exactly like `array_min` over `(−cos, id)` structs
  * under Spark's double ordering (NaN sorts greatest, so an all-NaN row
  * — e.g. a zero vector — resolves to the lowest id).
  *
  * Why not the composable form (`array_min(array(struct(−graft_dot(v,
  * lit_c)/…, id), …))`)? Its generated code UNROLLS per centroid — k
  * inlined d-element literals, k struct allocations per row, and a
  * generated-source size that grows with k — and Catalyst then clones
  * the whole monster into the `isnotnull(cluster)` filter it infers
  * below the join (measured ~10× the cost of this loop at k=10, d=64,
  * and it only gets worse with k). Here the centroid matrix rides as a
  * reference object (primitive `double[][]`, no boxing, no per-row
  * allocation), the generated code is a constant-size k×d loop, and a
  * duplicated evaluation in an inferred filter costs one extra loop,
  * not an unrolled re-expansion.
  *
  * Arithmetic is bit-compatible with the composable form and the SQL
  * oracle: dot products fold left-to-right over min(|v|, d) elements
  * (same as [[DotProduct]]), `cos = dot / (‖v‖ · ‖c‖)` with ‖v‖ =
  * sqrt(dot(v, v)) computed the same way, and the comparison mirrors
  * Spark's `(negcos, id)` struct ordering: strict-less updates, equal
  * keeps the earlier (lower) id, NaN loses to any non-NaN.
  *
  * `centroidMatrix` and `clusterIds` must be foldable (plan literals —
  * the IVF-quantizer contract: cluster count is bounded, never the
  * corpus); `clusterIds` must be ascending for the tie rule to mean
  * "lowest id".
  */
case class CentroidArgmax(vec: Expression, cents: Expression, ids: Expression)
  extends Expression with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(vec, cents, ids)
  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)), ArrayType(IntegerType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = vec.nullable
  override def prettyName: String = "graft_centroid_argmax"
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes() = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!cents.foldable || !ids.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "centroid matrix and cluster ids must be foldable literals")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val matrix: Array[Array[Double]] = {
    val rows = cents.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(rows.numElements()) { j =>
      rows.getArray(j).toDoubleArray()
    }
  }
  @transient private lazy val centNorms: Array[Double] =
    matrix.map(c => math.sqrt(c.foldLeft(0.0)((s, x) => s + x * x)))
  @transient private lazy val idArr: Array[Int] = {
    val a = ids.eval(null).asInstanceOf[ArrayData].toIntArray()
    require(a.length == matrix.length, "clusterIds must match centroid count")
    require(a.length > 0, "at least one centroid required")
    a
  }

  /** The shared scalar kernel — also called from the generated code, so
    * interpreted and codegen paths are the same function.
    */
  def argmax(v: ArrayData): Int = {
    val k = matrix.length
    // ‖v‖ is loop-invariant over centroids: computed ONCE per row, same
    // left-to-right fold as before so the hoist is bit-identical.
    var n = 0.0
    val nv = v.numElements()
    var i = 0
    while (i < nv) { val x = v.getDouble(i); n += x * x; i += 1 }
    val vNorm = math.sqrt(n)
    var best = 0.0
    var bestId = 0
    var first = true
    var j = 0
    while (j < k) {
      val c = matrix(j)
      val m = math.min(nv, c.length)
      var dot = 0.0
      i = 0
      while (i < m) { dot += v.getDouble(i) * c(i); i += 1 }
      val neg = -(dot / (vNorm * centNorms(j)))
      if (first || neg < best ||
        (java.lang.Double.isNaN(best) && !java.lang.Double.isNaN(neg))) {
        best = neg; bestId = idArr(j); first = false
      }
      j += 1
    }
    bestId
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null else argmax(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("centroidArgmax", this, classOf[CentroidArgmax].getName)
    val vecCode = vec.genCode(ctx)
    ev.copy(code =
      code"""
        |${vecCode.code}
        |boolean ${ev.isNull} = ${vecCode.isNull};
        |int ${ev.value} = 0;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $self.argmax(${vecCode.value});
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CentroidArgmax =
    copy(vec = newChildren(0), cents = newChildren(1), ids = newChildren(2))
}

/** All IVF cell ids sorted by squared-distance SCORE `‖c‖² − 2·v·c`
  * ascending (the self-dot v·v is constant per row and dropped — cell
  * RANKING is unchanged), ties to the lower cell id:
  * `graft_centroid_cells(vec, centroidMatrix)` returns `array<int>` of
  * ALL k cell ids (0-based row index of the matrix). The corpus-side
  * argmin assignment is `element_at(cells, 1)`; a query's probe list is
  * `slice(cells, 1, nProbe)` — one kernel serves both sides of the IVF
  * join, replacing the unrolled `array_min` / `array_sort` over
  * per-cell structs for the same codegen-size reasons as
  * [[CentroidArgmax]].
  *
  * Ordering mirrors Spark's `(score, cell)` struct sort: ascending,
  * `-0.0 == 0.0` tie (Spark compares doubles equal-first), NaN sorts
  * greatest. Scores are computed with the exact arithmetic of the
  * composable form: `lit(Σc²) − 2.0 · dot(v, c)` with the dot folding
  * left-to-right over min(|v|, d) elements.
  */
case class CentroidCellsByDist(vec: Expression, cents: Expression)
  extends Expression with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(vec, cents)
  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = vec.nullable
  override def prettyName: String = "graft_centroid_cells"
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes() = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!cents.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "centroid matrix must be a foldable literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val matrix: Array[Array[Double]] = {
    val rows = cents.eval(null).asInstanceOf[ArrayData]
    require(rows.numElements() > 0, "at least one centroid required")
    Array.tabulate(rows.numElements()) { j => rows.getArray(j).toDoubleArray() }
  }
  @transient private lazy val selfDots: Array[Double] =
    matrix.map(c => c.foldLeft(0.0)((s, x) => s + x * x))

  /** Spark SQL double ordering: equal-first (so −0.0 == 0.0), else
    * java.lang.Double.compare (NaN greatest).
    */
  private def cmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  /** Shared scalar kernel (used by both interpreted and generated paths). */
  def sortedCells(v: ArrayData): ArrayData = {
    val k = matrix.length
    val scores = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = matrix(j)
      val m = math.min(v.numElements(), c.length)
      var dot = 0.0
      var i = 0
      while (i < m) { dot += v.getDouble(i) * c(i); i += 1 }
      scores(j) = selfDots(j) - 2.0 * dot
      j += 1
    }
    val order = new Array[Int](k)
    j = 0
    while (j < k) { order(j) = j; j += 1 }
    // insertion sort on (score, cell): k is the cell count (bounded,
    // typically ≤ a few hundred), and ties keep ascending cell order
    j = 1
    while (j < k) {
      val cur = order(j)
      val sc = scores(cur)
      var p = j - 1
      while (p >= 0 && cmp(scores(order(p)), sc) > 0) {
        order(p + 1) = order(p); p -= 1
      }
      order(p + 1) = cur
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(order)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null else sortedCells(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("centroidCells", this, classOf[CentroidCellsByDist].getName)
    val vecCode = vec.genCode(ctx)
    ev.copy(code =
      code"""
        |${vecCode.code}
        |boolean ${ev.isNull} = ${vecCode.isNull};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $self.sortedCells(${vecCode.value});
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CentroidCellsByDist =
    copy(vec = newChildren(0), cents = newChildren(1))
}
