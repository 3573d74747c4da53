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

  test("prefixJaccardPairs: exact parity with the uncapped join at every threshold") {
    for (t <- Seq(0.1, 0.5, 0.9)) {
      val full = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3,
          threshold = t, maxShingleFreq = None)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val pref = Dedup.prefixJaccardPairs(docs, "text", "doc_id", n = 3,
          threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(pref == full, s"threshold $t: prefix pruning changed the result")
    }
  }

  test("prefixJaccardPairs: hot shingles never generate candidates but still count in Jaccard") {
    // at t=0.9 each doc's prefix is its single RAREST shingle; the hot
    // "x y z" (df=5) is never anyone's rarest except for docs 3/5 whose
    // ONLY shingle it is — so the identical pair (3,5) must survive with
    // jaccard exactly 1.0 (the hot shingle still counts in verification)
    val p = Dedup.prefixJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(p((3L, 5L)) == 1.0)
    assert(p((1L, 2L)) == 1.0) // identical 7-token docs
  }

  test("pageRank: matches a plain-Scala power iteration on a star + chain + isolate") {
    import spark.implicits._
    val verts = (1L to 7L).toDF("id")
    // star hub 1 ← {2,3,4}, chain 5-6, isolated 7 (degree-ASYMMETRIC:
    // a regular graph keeps PageRank uniform and would test nothing)
    val pairList = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L))
    val pairsDf = pairList.toDF("id_a", "id_b")
    val got = Dedup.pageRank(verts, pairsDf, "id", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: same recurrence, same literal arithmetic
    val n = 7
    val edges = pairList.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    var r = (1L to 7L).map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 4) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = (1L to 7L).map(v =>
        v -> ((1.0 - 0.85) / n + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    (1L to 7L).foreach { v =>
      val want = BigDecimal(r(v)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(v) - want) < 1e-12, s"vertex $v: got ${got(v)} want $want")
    }
    // structure: the hub outranks its spokes outrank the isolate; chain
    // members (degree-regular component) sit at exactly 1/n
    assert(got(1L) > got(2L) && got(2L) > got(7L))
    assert(got(2L) == got(3L) && got(3L) == got(4L) && got(5L) == got(6L))
  }

  test("triangleCounts: K4 minus an edge; chains are triangle-free; hub wedges don't fake triangles") {
    // Graph: {1,2,3,4} complete minus edge (1,4)  → triangles {1,2,3},
    // {2,3,4}; plus a chain 5-6-7 (no triangle); plus a star hub 8 with
    // spokes 9,10,11 (wedges but no closing edges).
    val pairList = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L), (8L, 9L), (8L, 10L), (8L, 11L))
    val got = Dedup.triangleCounts(
        pairList.toDF("id_a", "id_b"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // vertex 2 and 3 are in both triangles; 1 and 4 in one each
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangleCounts: counts each triangle once regardless of orientation ties") {
    // Single triangle with all degrees equal — the (deg, id) tie-break
    // path must still orient acyclically and count exactly once.
    val got = Dedup.triangleCounts(
        Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("sortedNeighborhoodPairs: exactly the within-window ordered pairs, matching a local sort") {
    val df = Seq((10L, "delta"), (20L, "alpha"), (30L, "bravo"),
      (40L, "echo"), (50L, "charlie")).toDF("id", "k")
    val got = Dedup.sortedNeighborhoodPairs(df, "id", col("k"), window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // sort order: alpha(20) bravo(30) charlie(50) delta(10) echo(40)
    val order = Seq(20L, 30L, 50L, 10L, 40L)
    val want = (for {
      i <- order.indices; j <- order.indices
      if j > i && j - i <= 2
    } yield (order(i), order(j), (j - i).toLong)).toSet
    assert(got == want)
  }

  test("editDistancePairs: finds substitution/insert/delete at distance 1, rejects distance 2") {
    val df = Seq(
      (1L, "smith"), (2L, "smyth"), // substitution
      (3L, "smiths"),               // insertion vs 1
      (4L, "mith"),                 // deletion vs 1
      (5L, "smythe"),               // dist 1 of 2 (insert), dist 2 of 1
      (6L, "jones"))                // unrelated
      .toDF("id", "name")
    val got = Dedup.editDistancePairs(df, "id", col("name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // smiths↔mith, smyth↔smiths, smith↔smythe are all distance 2 —
    // candidates the deletion pigeonhole may admit but verify rejects
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L),
      (2L, 5L, 1L)))
  }

  test("kCoreBounded: peeling cascades — removing leaves exposes new sub-k vertices") {
    // chain 1-2-3-4-5 hanging off a triangle {5,6,7}: 2-core is exactly
    // the triangle, but only after the chain peels end-inward (1 falls,
    // then 2, then 3, then 4) — needs the full 4 rounds.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (5L, 7L)).toDF("id_a", "id_b")
    val got = Dedup.kCoreBounded(pairs, "id", k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // deg is the round-4 degree, restricted to round-3 survivors
    // {4,5,6,7} — so 5 still counts its edge to the about-to-fall 4
    assert(got == Map(5L -> 3L, 6L -> 2L, 7L -> 2L))
    // bounded early stop: after ONE round only vertex 1 (deg 1) is gone
    // and 2 survives with its stale-restricted degree — supersets the
    // true core, erring on the keep side
    val r1 = Dedup.kCoreBounded(pairs, "id", k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(r1 == Set(2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("linkPredictionAdamicAdar: non-edges only, rarity weighting beats raw common-neighbor count") {
    // hub 1 (deg 5) connects {2,3,4,5,6}; 2-3 also share neighbor 6
    // (deg 3). Non-edge (2,3): shared {1, 6} → 1/ln5 + 1/ln3. Non-edge
    // (4,5): shared {1} → 1/ln5 only. (2,3) must outrank (4,5) on the
    // RARE shared neighbor, not on the common hub.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 6L), (3L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.linkPredictionAdamicAdar(pairs, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val byPair = got.map(t => (t._1, t._2) -> t).toMap
    // existing edges never appear
    assert(!byPair.contains((1L, 2L)) && !byPair.contains((2L, 6L)))
    val s23 = byPair((2L, 3L)); val s45 = byPair((4L, 5L))
    assert(s23._3 == 2 && s45._3 == 1)
    val want23 = math.rint((1.0 / math.log(5) + 1.0 / math.log(3)) * 1e6) / 1e6
    assert(s23._4 == want23, s"got ${s23._4} want $want23")
    assert(s23._4 > s45._4)
    // ranked first overall
    assert(got.head._1 == 2L && got.head._2 == 3L)
  }

  test("editDistancePairs: exact duplicates pair at distance 0") {
    val df = Seq((1L, "acme"), (2L, "acme"), (3L, "acmme")).toDF("id", "name")
    val got = Dedup.editDistancePairs(df, "id", col("name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }
}
