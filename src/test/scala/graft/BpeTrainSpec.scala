package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.operators.TextOps

/** BPE merge-loop training: hand-computed golden merges, greedy
  * self-overlap semantics, deterministic tie rule, early exhaustion.
  */
class BpeTrainSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def merges(df: org.apache.spark.sql.DataFrame, rounds: Int) =
    TextOps.bpeTrain(df, col("text"), rounds).orderBy("round")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("hand-computed golden merge sequence") {
    val docs = Seq("low low low", "lower").toDF("text")
    // vocab: low×3 (l,o,w,</w>), lower×1 (l,o,w,e,r,</w>)
    // r1: (l,o)=4 ties (o,w)=4 → lex picks (l,o)
    // r2: (lo,w)=4;  r3: (low,</w>)=3
    assert(merges(docs, 3).toSeq == Seq(
      (1L, "l", "o", 4L), (2L, "lo", "w", 4L), (3L, "low", "</w>", 3L)))
  }

  test("greedy merge handles self-overlapping runs left-to-right") {
    GraftFunctions.register(spark)
    def m(syms: Seq[String], l: String, r: String): Seq[String] =
      Seq(syms).toDF("s")
        .select(GraftFunctions.bpeMerge(col("s"), l, r))
        .head().getSeq[String](0)
    assert(m(Seq("a", "a", "a", "a", "</w>"), "a", "a") ==
      Seq("aa", "aa", "</w>"))
    assert(m(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a")) // odd run
    assert(m(Seq("x", "y", "x", "y"), "x", "y") == Seq("xy", "xy"))
    assert(m(Seq("x"), "x", "y") == Seq("x")) // no pair in a singleton
  }

  test("training stops when no adjacent pair remains") {
    val docs = Seq("a b").toDF("text")
    // r1: (a,</w>)=1 ties (b,</w>)=1 → lex picks a; r2: (b,</w>);
    // r3: every word is a single symbol → exhausted
    val got = merges(docs, 10)
    assert(got.toSeq == Seq((1L, "a", "</w>", 1L), (2L, "b", "</w>", 1L)))
  }

  test("bpeSegment applies a learned merge list to the vocabulary") {
    val docs = Seq("low low low", "lower").toDF("text")
    val learned = merges(docs, 3).map(m => (m._2, m._3)).toSeq
    val seg = TextOps.bpeSegment(docs, col("text"), learned)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    // merges: (l,o), (lo,w), (low,</w>)
    assert(seg("low") == ((3L, "low</w>", 1L)))
    assert(seg("lower") == ((1L, "low e r </w>", 4L)))
  }

  test("frequency weighting drives the argmax") {
    // 'zzz' (two z-z pairs per word) × 5 vs 'ab' × 1: (z,z) reaches 10,
    // every other pair ≤ 5, so frequency beats alphabetical order
    val docs = Seq("zzz zzz zzz zzz zzz ab").toDF("text")
    val first = merges(docs, 1).head
    assert((first._2, first._3, first._4) == ("z", "z", 10L))
  }
}
