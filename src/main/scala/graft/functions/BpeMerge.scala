package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge application: `graft_bpe_merge(symbols, l, r)` replaces
  * every GREEDY LEFT-TO-RIGHT non-overlapping occurrence of the
  * adjacent symbol pair (l, r) in the array with the single symbol
  * l+r — the segmentation-update step of BPE tokenizer training
  * (Sennrich, Haddow & Birch, ACL 2016). Greedy-left matters only for
  * self-overlapping pairs (l == r): in a run of k equal symbols it
  * merges ⌊k/2⌋ pairs anchored at even offsets — equivalently, a match
  * position survives iff its offset within a maximal run of
  * consecutive match positions is even, which is the island/parity
  * form the SQL oracle replays (q_bpe_train).
  *
  * Runs on the VOCABULARY table (words × their symbol arrays), so the
  * loop is vocabulary-sized per merge round, never corpus-sized — the
  * same one-pass-then-vocab-only split as [[graft.operators.TextOps.bpePairStats]].
  */
case class BpeMergePair(symbols: Expression, l: Expression, r: Expression)
  extends Expression with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(symbols, l, r)
  override def inputTypes = Seq(ArrayType(StringType), StringType, StringType)
  // containsNull mirrors the input array: merge() passes null elements
  // through unchanged (a null can never equal the foldable pair), so the
  // output is null-free exactly when the input is.
  override def dataType: DataType = symbols.dataType match {
    case ArrayType(_, cn) => ArrayType(StringType, containsNull = cn)
    case _                => ArrayType(StringType, containsNull = false)
  }
  override def nullable: Boolean = symbols.nullable
  override def prettyName: String = "graft_bpe_merge"
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes() = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!l.foldable || !r.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "merge pair (l, r) must be foldable literals")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val lStr: UTF8String =
    l.eval(null).asInstanceOf[UTF8String]
  @transient private lazy val rStr: UTF8String =
    r.eval(null).asInstanceOf[UTF8String]
  @transient private lazy val merged: UTF8String =
    UTF8String.concat(lStr, rStr)

  /** Shared scalar kernel (interpreted and generated paths). */
  def merge(syms: ArrayData): ArrayData = {
    val n = syms.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && lStr.equals(syms.getUTF8String(i)) &&
          rStr.equals(syms.getUTF8String(i + 1))) {
        out.add(merged)
        i += 2
      } else {
        out.add(syms.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def eval(input: InternalRow): Any = {
    val v = symbols.eval(input)
    if (v == null) null else merge(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeMerge", this, classOf[BpeMergePair].getName)
    val symsCode = symbols.genCode(ctx)
    ev.copy(code =
      code"""
        |${symsCode.code}
        |boolean ${ev.isNull} = ${symsCode.isNull};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $self.merge(${symsCode.value});
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BpeMergePair =
    copy(symbols = newChildren(0), l = newChildren(1), r = newChildren(2))
}
