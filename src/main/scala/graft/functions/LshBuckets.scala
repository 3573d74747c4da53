package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** All multi-table sign-LSH bucket ids as ONE codegen'd expression:
  * `graft_lsh_buckets(vec, planeMatrix, nPlanes)` returns `array<long>`
  * with one bucket per table, where `planeMatrix` holds the tables'
  * hyperplanes concatenated (table t's planes are rows t·nPlanes ..
  * t·nPlanes+nPlanes−1) and bucket bit p is set iff `vec · plane_p > 0`.
  *
  * Why not the composable form (`explode(array(struct(t, Σ when(
  * graft_dot(v, typedlit(plane)) > 0, 1<<p))))` per table)? Its
  * generated code grows with tables × planes — at the recall-
  * certification config (32 tables × 4 planes × 64 dims) that is 128
  * inlined dot-product loops with 128 array literals PER SIDE of the
  * bucket join, a Janino compile measured at ~7 s cold (q_ann_lsh raw
  * [10.8, 9.9, 2.5] s at sf0.001 — reps 1-2 were compiling, not
  * computing), and the inferred `isnotnull(bucket)` join-key filters
  * clone the whole expansion below the exchanges (the minhashLshPairs
  * pattern). Here the plane bank rides as ONE reference object
  * (`double[][]`, no boxing), the generated code is a constant-size
  * call, and a cloned evaluation costs one extra T×P×d loop. Same
  * rationale as [[CentroidArgmax]].
  *
  * Bit-parity with the composable [[graft.operators.Similarity.lshBucket]]
  * form: dots fold left-to-right over min(|v|, d) elements (same as
  * [[DotProduct]]); the bit test mirrors Spark's `dot > 0` comparison
  * semantics, where NaN is GREATER than every other double — so a NaN
  * dot sets the bit, unlike Java's `NaN > 0`.
  *
  * `planes` and `nPlanes` must be foldable (plan literals — the plane
  * bank is a few KB of constants, never data).
  */
case class LshBuckets(vec: Expression, planes: Expression, nPlanes: Expression)
  extends Expression with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(vec, planes, nPlanes)
  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = vec.nullable
  override def prettyName: String = "graft_lsh_buckets"
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes() = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!planes.foldable || !nPlanes.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "plane matrix and nPlanes must be foldable literals")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val matrix: Array[Array[Double]] = {
    val rows = planes.eval(null).asInstanceOf[ArrayData]
    require(rows.numElements() > 0, "at least one hyperplane required")
    Array.tabulate(rows.numElements()) { j => rows.getArray(j).toDoubleArray() }
  }
  @transient private lazy val p: Int = {
    val n = nPlanes.eval(null).asInstanceOf[Int]
    require(n > 0 && n <= 63, s"nPlanes must be in 1..63, got $n")
    require(matrix.length % n == 0,
      s"plane count ${matrix.length} not a multiple of nPlanes $n")
    n
  }

  /** Shared scalar kernel (used by both interpreted and generated paths). */
  def buckets(v: ArrayData): ArrayData = {
    val nP = p
    val nT = matrix.length / nP
    val nv = v.numElements()
    val out = new Array[Long](nT)
    var t = 0
    while (t < nT) {
      var b = 0L
      var pi = 0
      while (pi < nP) {
        val c = matrix(t * nP + pi)
        val m = math.min(nv, c.length)
        var dot = 0.0
        var i = 0
        while (i < m) { dot += v.getDouble(i) * c(i); i += 1 }
        // Spark SQL comparison semantics: NaN > 0 is TRUE (NaN sorts
        // greatest), unlike Java — keep bit-parity with the `when` form.
        if (dot > 0 || java.lang.Double.isNaN(dot)) b |= (1L << pi)
        pi += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null else buckets(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lshBuckets", this, classOf[LshBuckets].getName)
    val vecCode = vec.genCode(ctx)
    ev.copy(code =
      code"""
        |${vecCode.code}
        |boolean ${ev.isNull} = ${vecCode.isNull};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $self.buckets(${vecCode.value});
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LshBuckets =
    copy(vec = newChildren(0), planes = newChildren(1), nPlanes = newChildren(2))
}
