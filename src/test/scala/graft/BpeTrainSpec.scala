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

  test("graft_bpe_merge passes null elements through; containsNull mirrors input") {
    GraftFunctions.register(spark)
    // A null can never equal the foldable pair, so it survives unchanged
    // and breaks adjacency (the pair straddling it must NOT merge).
    val df = Seq(Seq[String]("a", null, "a", "a", "a")).toDF("s")
      .select(GraftFunctions.bpeMerge(col("s"), "a", "a").as("m"))
    val schema = df.schema("m").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    assert(schema.containsNull) // input Seq[String] with null → containsNull=true mirrored
    assert(df.head().getSeq[String](0) == Seq("a", null, "aa", "a"))
    // null-free input stays declared null-free through the merge
    val clean = Seq(Seq("x", "y")).toDF("s")
      .select(GraftFunctions.bpeMerge(col("s"), "x", "y").as("m"))
    assert(clean.head().getSeq[String](0) == Seq("xy"))
    // null ARRAY (not element) → null out
    val nullArr = Seq(Option.empty[Seq[String]]).toDF("s")
      .select(GraftFunctions.bpeMerge(col("s"), "x", "y").as("m"))
    assert(nullArr.head().isNullAt(0))
  }

  test("degenerate corpus: training exhausts early, returned merges stay applicable") {
    // vocab {a×2, b×2, c×1}, all single chars: merges are exactly
    // (a,</w>), (b,</w>), (c,</w>) then exhaustion — rounds 4+ yield
    // nothing. The 4-round oracle replay of this corpus must degrade
    // its round-4 merge to a no-op (the bpeRoundSql LEFT JOIN path);
    // tools/check_bpe_degenerate.py replays it in DuckDB end-to-end.
    val docs = Seq("a b", "a b", "c").toDF("text")
    val got = merges(docs, 4)
    assert(got.toSeq == Seq((1L, "a", "</w>", 2L), (2L, "b", "</w>", 2L),
      (3L, "c", "</w>", 1L)))
    // applying the SHORT merge list segments every word to one token
    val seg = TextOps.bpeSegment(docs, col("text"),
        got.map(m => (m._2, m._3)).toSeq)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(seg == Map("a" -> "a</w>", "b" -> "b</w>", "c" -> "c</w>"))
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

  private def mergesLocal(df: org.apache.spark.sql.DataFrame, rounds: Int) =
    TextOps.bpeTrainLocal(df, col("text"), rounds).orderBy("round")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("bpeTrainLocal matches the distributed trainer merge-for-merge") {
    // golden fixture incl. ties, self-overlapping runs, early exhaustion
    for (texts <- Seq(
        Seq("low low low", "lower"),
        Seq("a b"),
        Seq("zzz zzz zzz zzz zzz ab"),
        Seq("aaaa aaa aa", "abab baba", "the cat sat on the mat"))) {
      val docs = texts.toDF("text")
      assert(mergesLocal(docs, 6).toSeq == merges(docs, 6).toSeq,
        s"divergence on fixture $texts")
    }
  }

  test("bpeTrainLocal parity with distributed on real documents") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    assert(mergesLocal(docs, 12).toSeq == merges(docs, 12).toSeq)
  }

  test("bpeTrainLocal trains 1000+ merges in one corpus pass (no per-round jobs)") {
    // the shipped documents table has only 31 distinct words (vocab
    // exhausts after ~106 merges), so the scale test needs a corpus
    // with a real vocabulary: 20k deterministic pseudo-words, Zipf-ish
    // because low ranks repeat — enough pair mass for thousands of
    // merge rounds, which is the regime the driver-local loop exists for
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyz"
    val vocabWords = (0 until 20000).map { _ =>
      val len = 5 + rnd.nextInt(8)
      (0 until len).map(_ => alphabet(rnd.nextInt(26))).mkString
    }
    val docs = vocabWords.grouped(100).map(_.mkString(" ")).toSeq.toDF("text")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      val got = TextOps.bpeTrainLocal(docs, col("text"), rounds = 1500)
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let queued listener events drain
      // either the vocab exhausted early or we trained the full budget
      assert(got.length >= 1000,
        s"expected >= 1000 merges, got ${got.length}")
      // merge table is well-formed: rounds contiguous from 1, counts > 0
      assert(got.map(_.getLong(0)).toSeq == (1L to got.length).toSeq)
      assert(got.forall(_.getLong(3) > 0))
      // the whole training run is jobs-bounded: ONE corpus pass (a scan +
      // aggregate + collect, each ≤ a few jobs under AQE) — NOT one job
      // per merge round. 20 is a generous ceiling; the r12 distributed
      // trainer would need >= 1500.
      assert(jobs.get() <= 20,
        s"driver-local trainer ran ${jobs.get()} Spark jobs for 1500 rounds")
      info(f"trained ${got.length} merges in $secs%.2f s with ${jobs.get()} Spark jobs")
      assert(secs < 120.0, f"training took $secs%.1f s — not 'seconds'")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("frequency weighting drives the argmax") {
    // 'zzz' (two z-z pairs per word) × 5 vs 'ab' × 1: (z,z) reaches 10,
    // every other pair ≤ 5, so frequency beats alphabetical order
    val docs = Seq("zzz zzz zzz zzz zzz ab").toDF("text")
    val first = merges(docs, 1).head
    assert((first._2, first._3, first._4) == ("z", "z", 10L))
  }
}
