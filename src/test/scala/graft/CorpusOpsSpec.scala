package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, TextOps}

/** Round-7 corpus-curation operators: fixed-size chunking, CCNet-style
  * segment dedup, DSIR importance scores, unigram surprisal, SemDeDup
  * semantic dedup. Reference semantics checked on hand-built fixtures;
  * engine parity is pinned by the DuckDB oracles (q_chunk_docs,
  * q_segment_dedup, q_dsir_scores, q_unigram_surprisal,
  * q_semantic_dedup, q_dedup_fuzzy).
  */
class CorpusOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("hashedVectors: kernel matches a plain-Scala reference; norm option unit-length") {
    // plain-Scala reference of the h60 → bucket/sign → accumulate chain
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val dim = 32
    def ref(text: String): Array[Double] = {
      val out = new Array[Double](dim)
      text.trim.split("\\s+").foreach { t =>
        val h = h60(t)
        out((h % dim).toInt) += (if ((h / dim) % 2 == 0) 1.0 else -1.0)
      }
      out
    }
    val docs = Seq((1L, "spark rows and columns and rows"),
      (2L, "  padded   whitespace  text "), (3L, "solo"))
    val got = TextOps.hashedVectors(docs.toDF("doc_id", "text"), "text", "doc_id", dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    docs.foreach { case (id, text) =>
      assert(got(id).toSeq == ref(text).toSeq, s"doc $id mismatch")
    }
    val normed = TextOps.hashedVectors(docs.toDF("doc_id", "text"),
        "text", "doc_id", dim, normalize = true)
      .collect().map(r => r.getSeq[Double](1).toArray)
    normed.foreach { v =>
      val l2 = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(l2 - 1.0) < 1e-12, s"norm=$l2")
    }
  }

  test("graft_hashed_vector from SQL: negative hashes bucket via floorMod, never crash") {
    graft.functions.GraftFunctions.register(spark)
    // the registered surface accepts ANY array<long>; -1 under plain %
    // would index out(-1) and kill the task
    val r = spark.sql(
      "SELECT graft_hashed_vector(array(-1L, -100L, 5L), 64) AS v").head.getSeq[Double](0)
    assert(r.length == 64)
    assert(r.map(math.abs).sum == 3.0) // distinct buckets: 63, 28, 5
    assert(r(63) == 1.0)  // -1: floorMod(-1,64)=63; -1/64=0 -> +1
    assert(r(28) == -1.0) // -100: floorMod(-100,64)=28; -100/64=-1 -> -1
    assert(r(5) == 1.0)
  }

  test("hashedVectors bridge: cosine top-1 over hashed vectors recovers the near-dup twin") {
    // 30 distinct base texts + a near-identical twin of each (one token
    // changed out of ~20): the hashed-vector space must put each twin
    // first in its partner's neighbor list — the text→vector→ANN
    // pipeline with no learned embeddings anywhere.
    val vocab = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val rng = new scala.util.Random(7)
    val rows = (0 until 30).flatMap { i =>
      val toks = Array.fill(20)(vocab(rng.nextInt(vocab.length))).toVector
      val twin = toks.updated(rng.nextInt(20), s"novel$i")
      Seq((i * 2L, toks.mkString(" ")), (i * 2L + 1, twin.mkString(" ")))
    }
    val vecs = TextOps.hashedVectors(rows.toDF("doc_id", "text"),
      "text", "doc_id", dim = 128, normalize = true)
    val top1 = Similarity.bruteTopK(vecs, vecs, "doc_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, _) =>
      val twin = if (id % 2 == 0) id + 1 else id - 1
      assert(top1(id) == twin, s"doc $id nearest=${top1(id)} expected twin $twin")
    }
  }

  test("chunkTokens: full coverage, stride spacing, bounded size, short docs -> one chunk") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text), (2L, "a b c"), (3L, "solo")).toDF("id", "text")
    val chunks = TextOps.chunkTokens(df, "id", col("text"), chunkSize = 32, overlap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // starts 1, 25, 49, 73 (stride 24; last start <= 100-8=92) → 4 chunks
    assert(d1.length == 4)
    assert(d1.init.forall(_._4 == 32L), "all but the last chunk are full-size")
    assert(d1.last._4 == 28L) // tokens 73..100
    // every token appears in at least one chunk
    val covered = d1.flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 100).map(i => s"w$i").toSet)
    // consecutive chunks share exactly `overlap` tokens
    d1.sliding(2).foreach { case Array(a, b) =>
      val at = a._3.split(" ").toSeq; val bt = b._3.split(" ").toSeq
      assert(at.takeRight(8) == bt.take(8))
    }
    // short docs: a single chunk holding the whole doc
    assert(chunks.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "a b c", 3L)))
    assert(chunks.filter(_._1 == 3L).toSeq == Seq((3L, 0L, "solo", 1L)))
  }

  test("dedupSegments: global first occurrence survives, docs reassemble in order") {
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "a b"),
      (4L, "x y c d z")).toDF("id", "text")
    val got = TextOps.dedupSegments(df, "id", col("text"), segTokens = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("a b c d", 2L, 2L)))  // first occurrences of both
    assert(got(2L) == (("x y", 2L, 1L)))      // "a b" seen in doc 1
    assert(got(3L) == (("", 1L, 0L)))         // fully duplicated doc
    assert(got(4L) == (("z", 3L, 1L)))        // "x y" from 2, "c d" from 1
  }

  test("dsirScores: target-vocabulary docs score above raw-vocabulary docs") {
    // target (is_t) docs speak "tgt*"; background docs speak "raw*"
    val docs = (1L to 20L).map(i => (i, s"tgt${i % 3} tgt${i % 5} tgt1", true)) ++
      (21L to 60L).map(i => (i, s"raw${i % 7} raw${i % 11} raw2", false))
    val df = docs.toDF("id", "text", "is_t")
    val scores = TextOps.dsirScores(df, "id", col("text"), col("is_t"),
      buckets = 4096, alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(scores.forall(_._2 == 3L))
    val (tgt, raw) = scores.partition(_._1 <= 20L)
    assert(tgt.map(_._3).min > raw.map(_._3).max,
      "every target-domain doc must outscore every raw-domain doc")
  }

  test("unigramSurprisal: rare vocabulary means higher surprisal") {
    val common = (1L to 50L).map(i => (i, "the the the"))
    val rare = Seq((99L, "zyzzyva qwertyuiop"))
    val df = (common ++ rare).toDF("id", "text")
    val got = TextOps.unigramSurprisal(df, "id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(99L) > got(1L) * 2,
      "hapax-vocabulary doc must carry far higher mean surprisal")
    // all-common docs share one score
    assert(common.map(c => got(c._1)).distinct.size == 1)
  }

  test("dedupSpans: later re-occurrences removed at arbitrary offsets, first occurrences untouched") {
    val docs = Seq(
      (1L, "a b c d"),              // spans abc@0, bcd@1 — both first
      (2L, "z a b c z2"),           // abc@1 duplicates doc1@0 → tokens 1-3 removed
      (3L, "a b c"),                // whole doc duplicates doc1@0 → emptied
      (4L, "fresh words here now"), // wholly novel → untouched
      (5L, "x y"))                  // < n tokens → no spans → untouched
    val got = TextOps.dedupSpans(docs.toDF("id", "text"), "id", col("text"), n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("a b c d", 4L, 0L)))
    assert(got(2L) == (("z z2", 5L, 3L)))
    assert(got(3L) == (("", 3L, 3L)))
    assert(got(4L) == (("fresh words here now", 4L, 0L)))
    assert(got(5L) == (("x y", 2L, 0L)))
  }

  test("dedupSpansMulti: single tier (n, 2) is exactly dedupSpans(n)") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "z a b c z2"), (3L, "a b c"),
      (4L, "fresh words here now"), (5L, "x y")).toDF("id", "text")
    val single = TextOps.dedupSpans(docs, "id", col("text"), n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val multi = TextOps.dedupSpansMulti(docs, "id", col("text"), Seq(3 -> 2))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(multi.toSeq == single.toSeq)
  }

  test("dedupSpansMulti: evidence-scaled tiers catch what every single configuration misses") {
    // Tiers (3, >=4) + (6, >=2).
    //  - "p q r" is 3-token boilerplate occurring 4x -> short tier fires.
    //  - docs 10/11 share a 5-token verbatim passage occurring only
    //    TWICE: the long tier (n=6) misses it (too short), and the
    //    short tier's occ>=4 evidence bar misses it too — duplicated
    //    sub-threshold passages are the price of the evidence bar.
    //  - docs 20/21 share a 7-token verbatim passage occurring twice:
    //    caught by the n=6 tier (long match IS the evidence) though the
    //    short tier's occ>=4 bar ignores it — the "long duplicated
    //    passage" a single (3, >=4) config would miss.
    val docs = Seq(
      (1L, "p q r one"), (2L, "p q r two"), (3L, "p q r three"), (4L, "p q r four"),
      (10L, "aa bb cc dd ee intro"), (11L, "outro aa bb cc dd ee"),
      (20L, "k1 k2 k3 k4 k5 k6 k7 tailx"), (21L, "heady k1 k2 k3 k4 k5 k6 k7"))
      .toDF("id", "text")
    val got = TextOps.dedupSpansMulti(docs, "id", col("text"),
        tiers = Seq(3 -> 4, 6 -> 2))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    // boilerplate tier: first occurrence (doc 1) kept, later ones stripped
    assert(got(1L) == (("p q r one", 0L)))
    assert(got(2L) == (("two", 3L)) && got(3L) == (("three", 3L)) && got(4L) == (("four", 3L)))
    // twice-occurring 5-token passage: below both tiers -> untouched
    assert(got(10L)._2 == 0L && got(11L)._2 == 0L)
    // twice-occurring 7-token passage: long tier catches the re-occurrence
    assert(got(20L) == (("k1 k2 k3 k4 k5 k6 k7 tailx", 0L)),
      "first occurrence must survive")
    assert(got(21L) == (("heady", 7L)),
      s"long duplicated passage must be stripped by the n=6 tier, got ${got(21L)}")
    // cross-check the two single-tier configs each miss one of the cases
    val shortOnly = TextOps.dedupSpansMulti(docs, "id", col("text"), Seq(3 -> 4))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(shortOnly(21L) == 0L, "single short tier misses the long passage")
    val longOnly = TextOps.dedupSpansMulti(docs, "id", col("text"), Seq(6 -> 2))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(longOnly(2L) == 0L, "single long tier misses 3-token boilerplate")
  }

  test("bigramSurprisal: word order separates docs the unigram model cannot; <2-token docs absent") {
    val common = (1L to 50L).map(i => (i, "the cat sat"))
    val scrambled = Seq((98L, "sat the cat")) // same unigram multiset
    val solo = Seq((99L, "x"))
    val df = (common ++ scrambled ++ solo).toDF("id", "text")
    val bg = TextOps.bigramSurprisal(df, "id", col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // single-token doc has no bigrams → absent
    assert(!bg.contains(99L))
    assert(bg(1L)._1 == 2L && bg(98L)._1 == 2L)
    // the scrambled doc's rare "sat the" transition must raise its score
    assert(bg(98L)._2 > bg(1L)._2 * 2,
      s"scrambled=${bg(98L)._2} common=${bg(1L)._2}")
    // ...while the unigram model, blind to order, scores them identically
    val ug = TextOps.unigramSurprisal(df.filter(col("id").isin(1L, 98L)),
        "id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ug(1L) == ug(98L))
  }

  test("bm25TopK: matches a plain-Scala reference; zero-hit docs excluded; k respected") {
    val docs = Seq(
      (1L, "spark spark spark filter"),
      (2L, "spark filter join join join join join join"),
      (3L, "join join join join"),
      (4L, "query spark"),
      (5L, "the cat sat on the mat"))
    val terms = Seq("spark", "query")
    val got = TextOps.bm25TopK(docs.toDF("id", "text"), "id", col("text"),
        terms, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // plain-Scala reference of the exact Okapi/Lucene chain, same
    // literal constants and operation order as the Column expression
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val n = docs.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def score(id: Long): Double = terms.map { term =>
      val tf = toks(id).count(_ == term).toDouble
      val dfT = toks.values.count(_.contains(term))
      val idf = math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
      idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + 0.75 * toks(id).size / avgdl))
    }.sum
    val expected = docs.map(_._1)
      .map(id => (id, toks(id).size.toLong,
        BigDecimal(score(id)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .filter(_._3 > 0)
      .sortBy { case (id, _, s) => (-s, id) }.take(3)
    assert(got == expected)
    // length normalization: doc 1 (tf=3, short) must outrank doc 2's
    // single diluted hit; docs 3/5 (no query terms) must be absent
    val rank = got.map(_._1)
    assert(rank.indexOf(1L) < rank.indexOf(2L))
    assert(!rank.contains(3L) && !rank.contains(5L))
  }

  test("semanticDedup: intra-cluster near-dups drop to the lowest id, cross-cluster twins survive") {
    val e1 = Array(1.0, 0.0, 0.0, 0.0)
    val e2 = Array(0.0, 1.0, 0.0, 0.0)
    val vecs = Seq(
      (1L, Array(1.0, 0.01, 0.0, 0.0)),  // cluster 0
      (2L, Array(1.0, 0.02, 0.0, 0.0)),  // near-dup of 1 → dropped
      (3L, Array(0.7, 0.6, 0.0, 0.0)),   // cluster 0, but cos(1,3) < τ → kept
      (4L, Array(0.0, 1.0, 0.05, 0.0)),  // cluster 1: same direction as 1's
      (5L, Array(0.0, 1.0, 0.06, 0.0))). // near-dup of 4 → dropped
      toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(vecs, "vec_id", "embedding",
        Seq(0 -> e1, 1 -> e2), threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kept.keySet == Set(1L, 3L, 4L))
    assert(kept(1L) == 0 && kept(3L) == 0 && kept(4L) == 1)
  }

  test("quantizeInt8: codes bounded, extreme component hits ±127, zero vector safe, dequant error ≤ inv_scale/2") {
    val vecs = Seq(
      (1L, Array(0.5, -1.0, 0.25, 0.1)),
      (2L, Array(3.0, 0.0, -1.5, 2.9)),
      (3L, Array(0.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Int](1).toArray, r.getDouble(2))).sortBy(_._1)
    got.foreach { case (_, q, _) => assert(q.forall(x => x >= -127 && x <= 127)) }
    assert(got(0)._2(1) == -127)  // -1.0 is the max-abs component
    assert(got(1)._2(0) == 127)
    assert(got(2)._2.forall(_ == 0) && got(2)._3 == 0.0)
    // dequantization error bound: |v_i − q_i·inv_scale| ≤ inv_scale/2
    val orig = Map(1L -> Array(0.5, -1.0, 0.25, 0.1), 2L -> Array(3.0, 0.0, -1.5, 2.9))
    got.filter(_._1 != 3L).foreach { case (id, q, inv) =>
      q.indices.foreach { i =>
        assert(math.abs(orig(id)(i) - q(i) * inv) <= inv / 2 + 1e-12)
      }
    }
  }

  test("quantizedTopK: k rows per query, cosine within quantization error of the float ranking") {
    val rng = new scala.util.Random(7L)
    val vecs = (0L until 80L).map(i => (i, Array.fill(32)(rng.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id") < 5)
    val quant = Similarity.quantizedTopK(vecs, qs, "vec_id", "embedding", 3)
      .collect().map(r => ((r.getLong(0), r.getInt(2)), (r.getLong(1), r.getDouble(3))))
    val exact = Similarity.bruteTopK(vecs, qs, "vec_id", "embedding", 3)
      .collect().map(r => ((r.getLong(0), r.getInt(2)), (r.getLong(1), r.getDouble(3)))).toMap
    assert(quant.length == 5 * 3)
    quant.foreach { case (key, (_, qcos)) =>
      // int8 on 32 dims: quantized cosine tracks float cosine closely
      assert(math.abs(qcos - exact(key)._2) < 0.02,
        s"quantized cosine drifted at $key: $qcos vs ${exact(key)._2}")
    }
  }

  test("contaminatedDocsBloom: identical to the exact operator, even with a deliberately tiny bloom") {
    import graft.operators.Dedup
    val mk = (id: Long, t: String) => (id, t)
    val corpus = Seq(
      mk(1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      mk(2L, "one two three four five six seven eight nine ten"),
      mk(3L, "red orange yellow green blue indigo violet pink brown black")).toDF("doc_id", "text")
    val eval_ = Seq(
      mk(100L, "xx alpha beta gamma delta epsilon zeta eta theta iota kappa yy"),
      mk(101L, "completely disjoint benchmark prompt with no overlap at all whatsoever")).toDF("doc_id", "text")
    val exact = Dedup.contaminatedDocs(corpus, eval_, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(exact == Set(1L))
    // well-sized bloom
    val bloom = Dedup.contaminatedDocsBloom(corpus, eval_, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(bloom == exact)
    // 1 bit/gram, 1 probe: bloom false-positive rate is enormous, but
    // the exact verify keeps the OUTPUT identical — no-false-negative +
    // verify is the correctness contract
    val tiny = Dedup.contaminatedDocsBloom(corpus, eval_, "text", "doc_id",
      bitsPerGram = 1, probes = 1)
      .collect().map(_.getLong(0)).toSet
    assert(tiny == exact)
  }

  test("contaminationPredicate: null/empty text is 'not contaminated', matching the batch operator") {
    import graft.operators.{Dedup, TextOps}
    import graft.functions.Hashing
    val eval_ = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // contaminated
      (2L, null.asInstanceOf[String]), // null text → null gram array
      (3L, ""), // empty gram array
      (4L, "totally clean words that overlap nothing in the benchmark here")
    ).toDF("doc_id", "text")
    // batch truth: explode drops null/empty-gram rows → only doc 1 flagged
    val batch = Dedup.contaminatedDocs(corpus, eval_, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(batch == Set(1L))
    val pred = Dedup.contaminationPredicate(eval_, "text")
    val ghs = TextOps.shingleHashesFromTokenHashes(
      transform(TextOps.tokens(col("text")), tk => Hashing.h60(tk)), 8)
    val flagged = corpus.filter(pred(ghs)).collect().map(_.getLong(0)).toSet
    assert(flagged == batch, "predicate must flag exactly the batch set")
    // the ingest-filter direction: !pred must KEEP null-text docs, not
    // silently drop them through a NULL verdict
    val kept = corpus.filter(!pred(ghs)).collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L), "null-text docs must survive !pred")
  }

  test("leakageSafeSplit: whole clusters move together, test set nested under frac growth") {
    import graft.operators.Dedup
    val df = (1L to 40L).map(i => (i, s"doc $i")).toDF("id", "text")
    // 10 clusters of 4 consecutive ids each, labeled by their min id
    val clusters = (1L to 40L).map(i => (i, (i - 1) / 4 * 4 + 1)).toDF("id", "cluster_id")
    def testIds(f: Double): Set[Long] =
      Dedup.leakageSafeSplit(df, clusters, "id", f)
        .filter(col("split") === "test").collect().map(_.getAs[Long]("id")).toSet
    val byCluster = Dedup.leakageSafeSplit(df, clusters, "id", 0.3)
      .collect().map(r => r.getAs[Long]("cluster_id") -> r.getAs[String]("split"))
    byCluster.groupBy(_._1).foreach { case (cl, rows) =>
      assert(rows.map(_._2).distinct.length == 1,
        s"cluster $cl straddles the split")
    }
    assert(testIds(0.0).isEmpty && testIds(1.0).size == 40)
    val t25 = testIds(0.25); val t60 = testIds(0.6)
    assert(t25.subsetOf(t60), "raising testFrac must only move clusters into test")
    assert(t25.size % 4 == 0, "test set must be whole clusters")
  }

  test("hardNegatives: never a same-cluster neighbor, ranked by cosine, exactly k") {
    val e1 = Array(1.0, 0.0, 0.0, 0.0)
    val e2 = Array(0.0, 1.0, 0.0, 0.0)
    // cluster 0: ids 1-3 (x-dominant); cluster 1: ids 4-6 (y-dominant)
    val vecs = Seq(
      (1L, Array(1.0, 0.10, 0.0, 0.0)),
      (2L, Array(1.0, 0.20, 0.0, 0.0)),
      (3L, Array(1.0, 0.30, 0.0, 0.0)),
      (4L, Array(0.30, 1.0, 0.0, 0.0)),
      (5L, Array(0.20, 1.0, 0.0, 0.0)),
      (6L, Array(0.10, 1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val got = Similarity.hardNegatives(vecs, vecs.filter(col("vec_id") === 1L),
        "vec_id", "embedding", 2, Seq(0 -> e1, 1 -> e2))
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getInt(4)))
    // query 1 is cluster 0: negatives must all be cluster 1, best-cosine
    // first — id 4 (x=0.3) over 5 (x=0.2)
    assert(got.length == 2)
    assert(got.forall(_._3 == 1), "same-cluster vector leaked into negatives")
    assert(got.map(_._1).toSeq == Seq(4L, 5L))
    assert(got.map(_._2).toSeq == Seq(1, 2))
  }

  test("property: chunkTokens covers every token exactly, for random sizes and documents") {
    val rng = new scala.util.Random(20260813L)
    for (_ <- 1 to 10) {
      val nTok = 1 + rng.nextInt(200)
      val chunk = 2 + rng.nextInt(40)
      val overlap = rng.nextInt(chunk)
      val toks = (1 to nTok).map(i => s"t$i")
      val df = Seq((1L, toks.mkString(" "))).toDF("id", "text")
      val chunks = TextOps.chunkTokens(df, "id", col("text"), chunk, overlap)
        .collect().map(r => (r.getLong(1), r.getString(2).split(" ").toSeq))
        .sortBy(_._1)
      val stride = chunk - overlap
      // reference: starts at 1, 1+stride, ... while start <= max(1, n-overlap)
      val starts = Iterator.iterate(1)(_ + stride)
        .takeWhile(_ <= math.max(1, nTok - overlap)).toSeq
      assert(chunks.length == starts.length, s"n=$nTok c=$chunk o=$overlap")
      chunks.zip(starts).foreach { case ((_, got), st) =>
        assert(got == toks.slice(st - 1, st - 1 + chunk),
          s"n=$nTok c=$chunk o=$overlap start=$st")
      }
      assert(chunks.flatMap(_._2).toSet == toks.toSet, "token lost")
    }
  }

  test("property: dedupSegments keeps each distinct segment exactly once, corpus-wide") {
    val rng = new scala.util.Random(42L)
    val vocab = Seq("aa", "bb", "cc") // tiny vocab → many duplicate segments
    val docs = (1L to 30L).map { i =>
      (i, (1 to 2 + rng.nextInt(10)).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val segLen = 2
    val out = TextOps.dedupSegments(docs.toDF("id", "text"), "id", col("text"), segLen)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // reference: first-occurrence-wins over (id, seg_idx) order
    val refSegs = docs.flatMap { case (id, text) =>
      text.split(" ").grouped(segLen).zipWithIndex.map { case (seg, idx) =>
        (id, idx, seg.mkString(" "))
      }
    }.sortBy(t => (t._1, t._2))
    val seen = scala.collection.mutable.Set[String]()
    val refKept = refSegs.filter(t => seen.add(t._3)).groupBy(_._1)
    out.foreach { case (id, clean, nSeg, nKept) =>
      val want = refKept.getOrElse(id, Seq.empty).sortBy(_._2).map(_._3).mkString(" ")
      assert(clean == want, s"doc $id")
      assert(nKept == refKept.getOrElse(id, Seq.empty).size)
      assert(nSeg == refSegs.count(_._1 == id))
    }
    // global: every distinct segment survives exactly once
    val keptSegs = out.flatMap(_._2.split(" ").grouped(segLen).map(_.mkString(" ")))
      .filter(_.nonEmpty)
    assert(keptSegs.distinct.length == keptSegs.length,
      "a segment survived twice")
    assert(keptSegs.toSet == refSegs.map(_._3).toSet, "a segment vanished")
  }

  test("property: quantize/dequantize round trip within half a step, random vectors") {
    val rng = new scala.util.Random(99L)
    val vecs = (1L to 50L).map(i => (i, Array.fill(16)(rng.nextDouble() * 20 - 10)))
    val got = Similarity.quantizeInt8(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1).toArray, r.getDouble(2))))
      .toMap
    vecs.foreach { case (id, v) =>
      val (q, inv) = got(id)
      v.indices.foreach { i =>
        assert(math.abs(v(i) - q(i) * inv) <= inv / 2 + 1e-9,
          s"vec $id dim $i: ${v(i)} vs ${q(i) * inv}")
      }
    }
  }

  test("exactIncremental: dedups within batch and against the index, index grows by kept docs only") {
    import graft.operators.Dedup
    val b1 = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa")).toDF("id", "text")
    val (k1, idx1) = Dedup.exactIncremental(b1, Dedup.emptyIndex(spark), "text", "id")
    assert(k1.collect().map(_.getLong(0)).toSet == Set(1L, 2L)) // 3 is a dup of 1
    assert(idx1.count() == 2)
    val b2 = Seq((10L, "bbb"), (11L, "ccc"), (12L, "ccc"), (13L, "ddd"))
      .toDF("id", "text")
    val (k2, idx2) = Dedup.exactIncremental(b2, idx1, "text", "id")
    // bbb seen in batch 1; ccc dedups within batch 2 to id 11
    assert(k2.collect().map(_.getLong(0)).toSet == Set(11L, 13L))
    assert(idx2.count() == 4)
    // a third batch of nothing new keeps nothing and grows nothing
    val (k3, idx3) = Dedup.exactIncremental(
      Seq((20L, "aaa"), (21L, "ddd")).toDF("id", "text"), idx2, "text", "id")
    assert(k3.count() == 0 && idx3.count() == 4)
  }

  test("labelCentroids: rounded per-label means in label order") {
    val df = Seq(
      (1L, Array(1.0f, 3.0f), 1),
      (2L, Array(3.0f, 5.0f), 1),
      (3L, Array(10.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val cents = Similarity.labelCentroids(df, "embedding", "label")
    assert(cents.map(_._1) == Seq(0, 1))
    assert(cents(0)._2.toSeq == Seq(10.0, 0.0))
    assert(cents(1)._2.toSeq == Seq(2.0, 4.0))
  }

  test("graft_gram_top_run: null array elements are skipped, not NPE'd") {
    // the session SQL function accepts arbitrary string arrays
    // (containsNull = true), so null tokens must degrade gracefully:
    // a window containing a null is not an n-gram
    val rows = spark.sql(
      """SELECT
        |  graft_gram_top_run(array('a','b','a','b'), 2)            AS dense,
        |  graft_gram_top_run(array('a','b',NULL,'a','b','a','b'), 2) AS holed,
        |  graft_gram_top_run(array(NULL, 'a'), 2)                  AS all_holed,
        |  graft_gram_top_run(array('a'), 2)                        AS too_short,
        |  graft_gram_top_run(CAST(NULL AS array<string>), 2)       AS null_arr
        |""".stripMargin).head()
    assert(rows.getInt(0) == 2)     // windows: 'a b','b a','a b' -> modal 'a b' x2
    assert(rows.getInt(1) == 3)     // valid windows skip the two null-touching starts: 'a b' x3, 'b a' x1
    assert(rows.isNullAt(2), "every window holds a null -> no n-grams -> null")
    assert(rows.isNullAt(3))
    assert(rows.isNullAt(4))
    // codegen and interpreted paths agree on the null-holed array
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val arr = new GenericArrayData(Array[Any](
      UTF8String.fromString("a"), UTF8String.fromString("b"), null,
      UTF8String.fromString("a"), UTF8String.fromString("b"),
      UTF8String.fromString("a"), UTF8String.fromString("b")))
    val expr = graft.functions.GramTopRun(
      Literal.create(arr, ArrayType(StringType, containsNull = true)), Literal(2))
    assert(expr.eval(null) == rows.getInt(1))
  }

  test("bpePairStats: frequency-weighted adjacent pairs, in-word repeats count per occurrence") {
    val df = Seq((1L, "aaa bb aaa"), (2L, "ab x")).toDF("doc_id", "text")
    // vocab: aaa f=2 -> pairs aa,aa (2 per occurrence) => aa cnt 4;
    // bb f=1 => bb 1; ab f=1 => ab 1; x is 1-char => no pairs
    val got = TextOps.bpePairStats(df, col("text"), 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("aa", 4L), ("ab", 1L), ("bb", 1L)))
    // top-K truncation keeps the deterministic (cnt desc, pair asc) head
    val top1 = TextOps.bpePairStats(df, col("text"), 1).collect()
    assert(top1.length == 1 && top1.head.getString(0) == "aa")
  }
}
