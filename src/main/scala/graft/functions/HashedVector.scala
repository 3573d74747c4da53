package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Signed feature-hashing accumulator (the "hashing trick", Weinberger
  * et al. 2009, ICML): `graft_hashed_vector(tokenHashes, dim)` folds a
  * document's token-hash array into a dense `array<double>` of length
  * `dim` — bucket `h mod dim` accumulates +1 or −1 by the hash's next
  * bit (`(h / dim) mod 2`), the unbiased-estimator sign trick from the
  * paper. The input is the ALREADY-COMPUTED h60 array (codegen'd md5
  * per token upstream), so this kernel is pure integer/array work: one
  * pass over the tokens, one bounded output buffer, no hashing and no
  * allocation beyond the result.
  *
  * Why an Expression and not `aggregate`/`transform` built-ins: a dense
  * accumulator built with HOFs is O(dim) PER TOKEN (each lambda step
  * rebuilds or copies the array — interpreted, no codegen), i.e.
  * O(dim · tokens) per document; this kernel is O(dim + tokens).
  *
  * Arithmetic contract (the oracle-reproducibility invariant): h60
  * values are non-negative 60-bit longs, so `%` and `/` agree between
  * Java, Spark SQL, and DuckDB (`h % dim`, `h // dim`). Null hash
  * elements (never produced by the tokens→h60 pipeline, but legal in
  * the type) are skipped; a null array yields null.
  */
case class HashedVector(hashes: Expression, dim: Expression)
  extends Expression with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(hashes, dim)
  override def inputTypes = Seq(ArrayType(LongType), IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = hashes.nullable
  override def prettyName: String = "graft_hashed_vector"
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes() = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!dim.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "dim must be a foldable literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val d: Int = {
    val n = dim.eval(null).asInstanceOf[Int]
    require(n > 0 && n <= (1 << 20), s"dim must be in 1..2^20, got $n")
    n
  }

  /** Shared scalar kernel (used by both interpreted and generated
    * paths). floorMod, not %: the registered SQL surface accepts ANY
    * array<long>, and a negative hash under `%` would index out(-k) —
    * an opaque task-killing AIOOBE. For the non-negative h60 contract
    * floorMod ≡ %, so the oracle arithmetic is unchanged.
    */
  def vectorize(hs: ArrayData): ArrayData = {
    val out = new Array[Double](d)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        val idx = java.lang.Math.floorMod(h, d.toLong).toInt
        out(idx) += (if (java.lang.Math.floorMod(h / d, 2L) == 0L) 1.0 else -1.0)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val hs = hashes.eval(input)
    if (hs == null) null else vectorize(hs.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hashedVector", this, classOf[HashedVector].getName)
    val hsCode = hashes.genCode(ctx)
    ev.copy(code =
      code"""
        |${hsCode.code}
        |boolean ${ev.isNull} = ${hsCode.isNull};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $self.vectorize(${hsCode.value});
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HashedVector =
    copy(hashes = newChildren(0), dim = newChildren(1))
}
