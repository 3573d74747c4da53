package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of the most frequent word n-gram in a token array, as ONE
  * codegen'd kernel: `graft_gram_top_run(tokens, n)` returns how many
  * times the modal n-gram occurs (null when the document has fewer than
  * `n` tokens — it then has no n-grams).
  *
  * Used by `TextOps.repetitionProfile` (the Gopher-style top-bigram
  * share): the quantity is ROW-LOCAL, so the right shape is a map-only
  * pass, not the explode → groupBy(doc, gram) → re-aggregate pipeline
  * (4 shuffles + 5 jobs to recompute per-row facts corpus-wide; 3.6×
  * DuckDB at sf0.1 on pure job overhead). A higher-order-function fold
  * over `array_sort(grams)` is the composable alternative, but HOF
  * lambdas evaluate per element through the interpreter with a struct
  * allocation per step (measured 2.5× DuckDB); this kernel sorts gram
  * START INDICES and scans equal runs in one JVM call — no gram string
  * concatenation, no per-element Catalyst eval.
  *
  * Correctness vs the oracle's `GROUP BY gram` on space-joined grams:
  * tokens are whitespace-split (no token contains a space), so the
  * join-with-space map from token windows to gram strings is injective
  * — two windows are equal iff their joined grams are equal — and the
  * modal COUNT over windows equals the modal count over gram strings.
  * The index sort orders windows token-wise rather than by the joined
  * string, which can permute distinct grams but never changes equal-run
  * lengths, and only those are returned.
  *
  * `n` must be a foldable positive literal. The tokenizer path never
  * produces null token elements, but the function is registered on the
  * session for arbitrary string arrays, so null elements are handled
  * defensively rather than by NPE: a window containing a null token is
  * not an n-gram (skipped), and an array whose every window has a null
  * returns null like the too-short case. (The oracle never sees nulls
  * — its input is the tokenizer — so this is a documented choice, not
  * an oracle-pinned semantic.)
  */
case class GramTopRun(toks: Expression, n: Expression)
  extends Expression with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(toks, n)
  override def inputTypes = Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gram_top_run"
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes() = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!n.foldable || n.eval(null) == null ||
        n.eval(null).asInstanceOf[Int] < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "n must be a foldable positive integer literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val nGram: Int = n.eval(null).asInstanceOf[Int]

  /** Shared scalar kernel (interpreted and generated paths both call it).
    * Returns a boxed Integer, or null when the array yields no n-grams.
    */
  def topRun(arr: ArrayData): Integer = {
    val total = arr.numElements()
    val g = total - nGram + 1
    if (g <= 0) return null
    val ng = nGram
    val ts = new Array[UTF8String](total)
    var nulls = 0
    var i = 0
    while (i < total) {
      if (arr.isNullAt(i)) nulls += 1 else ts(i) = arr.getUTF8String(i)
      i += 1
    }
    // windows containing a null token are not n-grams; the common
    // (tokenizer) case has none, so keep the dense fast path
    val idx: Array[Integer] =
      if (nulls == 0) {
        val a = new Array[Integer](g)
        i = 0
        while (i < g) { a(i) = Integer.valueOf(i); i += 1 }
        a
      } else {
        val b = new java.util.ArrayList[Integer](g)
        i = 0
        while (i < g) {
          var ok = true
          var k = 0
          while (ok && k < ng) { if (ts(i + k) == null) ok = false; k += 1 }
          if (ok) b.add(Integer.valueOf(i))
          i += 1
        }
        if (b.isEmpty) return null
        b.toArray(new Array[Integer](b.size()))
      }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val ai = a.intValue(); val bi = b.intValue()
        var k = 0
        while (k < ng) {
          val c = ts(ai + k).compareTo(ts(bi + k))
          if (c != 0) return c
          k += 1
        }
        0
      }
    })
    var best = 1
    var run = 1
    i = 1
    while (i < idx.length) {
      val a = idx(i - 1).intValue(); val b = idx(i).intValue()
      var eq = true
      var k = 0
      while (eq && k < ng) {
        if (!ts(a + k).equals(ts(b + k))) eq = false
        k += 1
      }
      run = if (eq) run + 1 else 1
      if (run > best) best = run
      i += 1
    }
    Integer.valueOf(best)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = toks.eval(input)
    if (t == null) null else topRun(t.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("gramTopRun", this, classOf[GramTopRun].getName)
    val tokCode = toks.genCode(ctx)
    val boxed = ctx.freshName("topRun")
    ev.copy(code =
      code"""
        |${tokCode.code}
        |boolean ${ev.isNull} = ${tokCode.isNull};
        |int ${ev.value} = 0;
        |if (!${ev.isNull}) {
        |  java.lang.Integer $boxed = $self.topRun(${tokCode.value});
        |  if ($boxed == null) { ${ev.isNull} = true; }
        |  else { ${ev.value} = $boxed.intValue(); }
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramTopRun =
    copy(toks = newChildren(0), n = newChildren(1))
}
