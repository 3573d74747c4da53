package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Dedup-operator semantics not covered by the DuckDB oracle: the
  * stop-shingle cap path (the fixture's max shingle df never reaches the
  * default cap, so without this spec the default-on skew guard would be
  * entirely untested).
  */
class DedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // "x y z" appears in all 5 docs (df=5); every other shingle is rare.
  private lazy val docs = Seq(
    (1L, "a b c d x y z"),
    (2L, "a b c d x y z"),
    (3L, "x y z"),
    (4L, "p q r x y z"),
    (5L, "x y z")).toDF("doc_id", "text")

  private def pairs(maxShingleFreq: Option[Int]): Map[(Long, Long), Double] =
    Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.05,
        maxShingleFreq = maxShingleFreq)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("uncapped Jaccard: the hot shingle pairs every doc with every other") {
    val p = pairs(None)
    // doc3 and doc5 are the identical single-shingle doc "x y z"
    assert(p((3L, 5L)) == 1.0)
    // doc1 vs doc4 share only "x y z": 1 / (5 + 4 - 1)
    assert(math.abs(p((1L, 4L)) - 0.125) < 1e-12)
    assert(p.keySet.size == 10, s"all C(5,2) pairs expected: ${p.keySet}")
  }

  test("capped Jaccard: hot shingle dropped, sizes recomputed post-cap") {
    val p = pairs(Some(4)) // df("x y z") = 5 > 4 → dropped everywhere
    // docs 3/5 had ONLY the hot shingle → they vanish entirely
    assert(!p.keySet.exists { case (a, b) => a == 3L || b == 3L || a == 5L || b == 5L })
    // docs 1/2 still identical over their remaining 4 shingles → jaccard
    // 1.0 exactly — proves sizes were recomputed post-cap (pre-cap sizes
    // 5,5 with intersection 4 would give 4/6)
    assert(p == Map((1L, 2L) -> 1.0), s"got $p")
  }
}
