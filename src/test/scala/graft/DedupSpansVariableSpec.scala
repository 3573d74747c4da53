package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Variable-length ExactSubstr (VERDICT r17 #7): maximal duplicated
  * runs reported and removed as ONE span each, with the
  * data-determined length the fixed-window/tier forms cannot express.
  */
class DedupSpansVariableSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("duplicateSpanRanges: a 60-token duplicated passage is ONE span with its true length") {
    val passage = toks("p", 60)
    val docs = Seq(
      (1L, toks("a", 20) + " " + passage + " " + toks("z", 20)), // first occurrence — kept
      (2L, toks("b", 20) + " " + passage + " " + toks("y", 20))  // duplicate
    ).toDF("doc_id", "text")
    val got = TextOps.duplicateSpanRanges(docs, "doc_id", col("text"), minLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // one row, not 53 8-token window artifacts: start after the 20-token
    // prefix, length exactly 60
    assert(got == Seq((2L, 20L, 60L)), s"got $got")
  }

  test("abutting duplicated passages merge into one maximal span (the suffix-array answer)") {
    val p1 = toks("p", 12)
    val p2 = toks("q", 12)
    val docs = Seq(
      (1L, toks("a", 10) + " " + p1 + " " + toks("z", 10)),
      (2L, toks("b", 10) + " " + p2 + " " + toks("y", 10)),
      (3L, toks("c", 10) + " " + p1 + " " + p2 + " " + toks("x", 10))
    ).toDF("doc_id", "text")
    val got = TextOps.duplicateSpanRanges(docs, "doc_id", col("text"), minLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 3 holds copies of BOTH passages back-to-back: positions 10-33
    // are one covered region — one 24-token span. (The straddling
    // 8-windows p1-end+p2-start are unique to doc 3, but every position
    // is inside some duplicated window, so the islands merge.)
    assert(got == Seq((3L, 10L, 24L)), s"got $got")
  }

  test("tier form removes only the boilerplate FRAGMENT of a duplicated passage; variable form removes it whole as one span") {
    // P = 30 tokens, duplicated once (docs 1 → 2). Its middle 10 tokens
    // C = P[10..19] are ALSO common boilerplate (docs 3 and 4 carry C),
    // so the 8-token spans inside C occur 4× corpus-wide while the rest
    // of P's spans occur only 2×.
    val p = (0 until 30).map(i => s"p$i")
    val c = p.slice(10, 20).mkString(" ")
    val docs = Seq(
      (1L, toks("a", 10) + " " + p.mkString(" ")),
      (2L, toks("b", 10) + " " + p.mkString(" ")),
      (3L, toks("c", 10) + " " + c + " " + toks("v", 10)),
      (4L, toks("d", 10) + " " + c + " " + toks("w", 10))
    ).toDF("doc_id", "text")

    // Evidence-scaled tiers — long spans need occ >= 2, short spans
    // occ >= 4: doc 2's 40-token body has no 50-window, and only the
    // C-interior 8-spans reach occ 4, so the tier form strips just the
    // 10-token fragment and leaves the other 20 duplicated tokens.
    val tiered = TextOps.dedupSpansMulti(docs, "doc_id", col("text"),
        tiers = Seq(50 -> 2, 8 -> 4))
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getLong(r.fieldIndex("n_removed"))).toMap
    assert(tiered(2L) == 10L,
      s"tier form should remove only the boilerplate fragment, removed ${tiered(2L)}")

    // The variable-length form sees doc 2's whole passage as one
    // maximal duplicated run: removed WHOLE, accounted as ONE span.
    val variable = TextOps.dedupSpansVariable(docs, "doc_id", col("text"), minLen = 8)
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        ((r.getLong(r.fieldIndex("n_removed")), r.getLong(r.fieldIndex("n_spans")),
          r.getString(r.fieldIndex("clean_text"))))).toMap
    assert(variable(2L) == ((30L, 1L, toks("b", 10))), s"doc 2: ${variable(2L)}")
    assert(variable(1L)._1 == 0L, "first occurrence must be kept")
    // the boilerplate copies in docs 3/4 are their own 10-token spans
    assert(variable(3L)._1 == 10L && variable(3L)._2 == 1L)
    val spans = TextOps.duplicateSpanRanges(docs, "doc_id", col("text"), minLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(spans == Seq((2L, 10L, 30L), (3L, 10L, 10L), (4L, 10L, 10L)), s"spans $spans")
  }

  test("coverage-union equivalence: dedupSpansVariable == dedupSpans at the same n on the real fixture") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val fixed = TextOps.dedupSpans(docs, "doc_id", col("text"), n = 8)
      .select("doc_id", "clean_text", "n_tokens", "n_removed")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val variable = TextOps.dedupSpansVariable(docs, "doc_id", col("text"), minLen = 8)
      .select("doc_id", "clean_text", "n_tokens", "n_removed")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(fixed == variable,
      "maximal-run removal must equal fixed-window coverage at the same n")
    assert(fixed.nonEmpty)
  }
}
