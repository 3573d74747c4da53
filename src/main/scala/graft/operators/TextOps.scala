package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Lineage.LineageOps

import graft.functions.Hashing

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, language ID, quality scoring, token counting,
  * fingerprinting.
  *
  * Design rule: every operator is a per-row Catalyst expression tree
  * (split/transform/filter/aggregate higher-order functions) — no UDFs, no
  * explode unless an operator genuinely needs cross-row grouping. At
  * 100 TB that means text featurization is a map-only stage that pipelines
  * with the scan, and stays inside whole-stage codegen.
  */
object TextOps {

  /** Whitespace tokenization. `trim` first so leading/trailing whitespace
    * doesn't create empty tokens (matches DuckDB
    * `regexp_split_to_array(trim(x), '\s+')`).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Feature-hashing vectorizer (the "hashing trick"): every document →
    * a dense `dim`-length signed bag-of-words vector, entirely
    * in-engine — the bridge from a raw text corpus to the embedding
    * operators (cosine top-k, k-means, semantic dedup) when no learned
    * embeddings exist. tokens → codegen'd md5 h60 per token → one
    * O(dim + tokens) [[graft.functions.HashedVector]] kernel per row.
    * Map-only, no shuffle, no vocabulary state — the property that
    * makes it the 100 TB featurizer: there is nothing to fit, broadcast,
    * or synchronize.
    *
    * `normalize = true` L2-normalizes (for cosine consumers); the raw
    * form is signed integer counts in double slots — exact, and
    * value-checkable by an external engine (q_hashed_embedding).
    */
  def hashedVectors(df: DataFrame, textCol: String, idCol: String,
      dim: Int = 256, normalize: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val dotF = graft.functions.GraftFunctions.dotFast _
    val vecs = df
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__hts", transform(col("__toks"), t => Hashing.h60(t)))
      .withColumn("embedding",
        graft.functions.GraftFunctions.hashedVector(col("__hts"), dim))
    val out =
      if (!normalize) vecs
      else vecs
        // materialize the norm FIRST: a `transform` lambda re-evaluates
        // non-attribute subtrees per element (the HOF pitfall)
        .withColumn("__l2", sqrt(dotF(col("embedding"), col("embedding"))))
        .withColumn("embedding",
          when(col("__l2") > 0.0,
            transform(col("embedding"), x => x / col("__l2")))
            .otherwise(col("embedding")))
    out.select(col(idCol), col("embedding"))
  }

  /** Word n-gram shingles over an ALREADY-MATERIALIZED token-array
    * column; empty array when the document has fewer than n tokens.
    * (`sequence` would generate a DESCENDING range if size-n+1 < 1 —
    * hence the guard.)
    *
    * `toks` must be a plain column reference (e.g. from
    * `withColumn("toks", tokens(text))`), not an inline expression: the
    * lambda body re-evaluates its subtree per element, so an embedded
    * regex `split` would run O(tokens²) per document — measured 10×+ on
    * the shingling-heavy dedup operators.
    */
  def wordShinglesFromTokens(toks: Column, n: Int): Column = {
    // n shifted slices zipped, lambda only concats struct fields: the
    // slices evaluate ONCE per row. The naive form (slice(toks, i, n)
    // inside the lambda) re-slices per element — measured 5× slower on
    // the dedup operators at sf0.1.
    val zs = arrays_zip((1 to n).map(i =>
      slice(toks, lit(i), size(toks) - lit(n - 1))): _*)
    when(size(toks) >= n,
      transform(zs, s => concat_ws(" ", (0 until n).map(i => s.getField(i.toString)): _*))
    ).otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingles straight from text — convenience form for
    * one-shot use; hot paths should materialize [[tokens]] first and call
    * [[wordShinglesFromTokens]] (see its scaladoc).
    */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(text), n)

  /** 60-bit n-gram shingle HASHES from an ALREADY-MATERIALIZED array of
    * per-token h60 values: shingle i hashes to
    * `XOR_j rotl60(h(tok_{i+j}), 21·j mod 60)` — position-sensitive (the
    * rotation distinguishes "a b" from "b a"), pure integer ops.
    *
    * This replaces hash-of-concatenated-shingle-string: md5 runs ONCE per
    * token instead of once per shingle over an n×-longer concat string —
    * measured 3×+ cheaper on the Jaccard pair path, where shingle hashing
    * dominated. Same contract as any content hash: both engines (Spark and
    * the DuckDB oracle) compute the identical function, so collisions (p ≈
    * 2^-60 per pair) are consistent across sides.
    *
    * Like [[wordShinglesFromTokens]], `tokenHashes` must be a plain column
    * reference — the zip's slices evaluate once per row that way.
    */
  def shingleHashesFromTokenHashes(tokenHashes: Column, n: Int): Column = {
    val zs = arrays_zip((1 to n).map(i =>
      slice(tokenHashes, lit(i), size(tokenHashes) - lit(n - 1))): _*)
    when(size(tokenHashes) >= n,
      transform(zs, s => (0 until n).map(i =>
        Hashing.rotl60(s.getField(i.toString), (i * 21) % 60))
        .reduce(_ bitwiseXOR _))
    ).otherwise(array().cast("array<long>"))
  }

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: alternating word/punctuation pieces, the classic
    * `\w+|[^\w\s]` pre-tokenizer regex (a cheap proxy for byte-pair
    * vocab size used to budget training corpora).
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\w]+|[^\\w\\s]"), lit(0)))

  /** Adjacent-symbol pair statistics — the inner counting step of BPE
    * tokenizer training (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units": each merge round
    * picks the most frequent adjacent pair). One round, character
    * symbols, expressed in the shape that scales:
    *
    *  1. ONE corpus-sized pass: explode to words, hash-aggregate to the
    *     (word, frequency) vocabulary — the classic trick that makes
    *     distributed BPE tractable, because every later round works on
    *     the VOCABULARY (≤ millions of rows) weighted by frequency, not
    *     on the corpus (billions of documents).
    *  2. Vocabulary-sized work: each distinct word emits its adjacent
    *     character pairs (repeats within a word count once per
    *     occurrence, e.g. "aaa" → "aa"×2), weighted by the word's
    *     corpus frequency; pair-keyed sum; deterministic top-K
    *     (count desc, pair asc) via TakeOrdered — no global sort.
    *
    * Iterated merges would re-run step 2 on a re-segmented vocabulary;
    * step 1 never re-runs — which is why the split matters at 100 TB.
    *
    * NOTE: unlike [[bpeTrain]]'s round-1 counting, this standalone
    * statistic is MARKER-FREE — words are NOT suffixed with the `</w>`
    * end-of-word symbol, so final-position pairs (c, "</w>") never
    * appear and last-character pair counts can differ from bpeTrain's
    * round 1. The two are deliberately different views: bpePairStats
    * is the corpus-exploration statistic (raw character bigrams);
    * bpeTrain counts over the marker-carrying segmentation a tokenizer
    * actually trains on.
    */
  def bpePairStats(df: DataFrame, textCol: Column, topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val vocab = df.select(explode(tokens(textCol)).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
    // sequence(1, len-1) would flip DESCENDING for 1-char words
    // (Spark infers step -1 when start > stop) — guard to empty instead
    val pairs = vocab
      .withColumn("__ps",
        when(length(col("__w")) >= 2,
          transform(sequence(lit(1), length(col("__w")) - 1),
            i => col("__w").substr(i, lit(2))))
          .otherwise(array()))
      .select(explode(col("__ps")).as("pair"), col("__f"))
    pairs.groupBy(col("pair")).agg(sum(col("__f")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(topK)
  }

  /** BPE tokenizer TRAINING (the merge loop of Sennrich, Haddow &
    * Birch, ACL 2016 — [[bpePairStats]] is its single-round counting
    * step): `rounds` iterations of count-adjacent-pairs → pick the
    * most frequent (ties: lexicographic (l, r), so every engine and
    * run picks identically) → apply the greedy merge to every word.
    * Words carry the classic `</w>` end-of-word marker so final-
    * position merges stay distinct from word-internal ones. Returns
    * the learned merge table (round, left, right, pair_count) —
    * exactly what a BPE tokenizer ships as its merges file. Stops
    * early when no adjacent pair remains.
    *
    * Scale shape: ONE corpus pass builds the (word, freq) vocabulary;
    * every round after that is vocabulary-sized — a pair explode +
    * hash aggregate + 1-row TakeOrdered collect (the argmax; O(1)
    * driver data per round) + a map-only
    * [[graft.functions.BpeMergePair]] projection. The vocabulary is
    * localCheckpoint'ed each round (the iterative-loop lineage
    * discipline of connectedComponents) so the plan never deepens.
    * 100 TB: the corpus pass dominates, rounds amortize over a
    * vocabulary that is ~10⁶ rows regardless of corpus size.
    */
  def bpeTrain(df: DataFrame, textCol: Column, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    var vocab = df.select(explode(tokens(textCol)).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(col("__f"),
        concat(
          transform(sequence(lit(1), length(col("__w"))),
            i => col("__w").substr(i, lit(1))),
          array(lit("</w>"))).as("__syms"))
      .graftCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val top = vocab
        .select(col("__f"), explode(
          zip_with(slice(col("__syms"), lit(1), size(col("__syms")) - 1),
            slice(col("__syms"), lit(2), size(col("__syms")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("__p"))
        .groupBy(col("__p")).agg(sum(col("__f")).as("__c"))
        .orderBy(col("__c").desc, col("__p.l"), col("__p.r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top.head
        val p = row.getStruct(0)
        val l = p.getString(0)
        val r = p.getString(1)
        val c = row.getLong(1)
        merges += ((round, l, r, c))
        vocab = vocab.withColumn("__syms",
            graft.functions.GraftFunctions.bpeMerge(col("__syms"), l, r))
          .graftCheckpoint()
        round += 1
      }
    }
    merges.toSeq.toDF("round", "left", "right", "pair_count")
      .select(col("round").cast("long").as("round"), col("left"),
        col("right"), col("pair_count"))
  }

  /** Unsigned UTF-8 byte comparison — the collation Spark's UTF8String
    * (and DuckDB's default) sorts strings by. The driver-local merge
    * loop must break count ties with EXACTLY the same order as the
    * distributed `orderBy(c desc, l, r)`, or the two trainers diverge
    * on the first tie.
    */
  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Greedy left-to-right non-overlapping merge of (l, r) in a symbol
    * array — the driver-local twin of [[graft.functions.BpeMergePair]]'s
    * kernel (same semantics, asserted equal by BpeTrainSpec parity).
    */
  private def mergeWordLocal(syms: Array[String], l: String,
      r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    val merged = l + r
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += merged; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** BPE tokenizer training with the merge loop run DRIVER-LOCAL — the
    * production-scale form of [[bpeTrain]]. Identical semantics (same
    * corpus pass, same (count desc, (l, r) utf8-asc) argmax, same
    * greedy merge kernel — BpeTrainSpec asserts merge-list equality
    * against the distributed form), but the per-round work is a heap
    * pop + word-local count updates instead of a Spark job, so 30k–50k
    * merges cost zero scheduler round-trips after the single corpus
    * pass. This is Sennrich's own trainer shape: the merge loop is a
    * function of the (word, freq) VOCABULARY, which after the one
    * corpus-sized aggregate fits on the driver (~10⁶ rows regardless
    * of corpus size — the same bound [[bpeTrain]]'s scaladoc states),
    * so distributing it buys nothing and costs a scheduler round-trip
    * per merge (the r12 verdict's "scale-killer class: driver-side
    * iteration count").
    *
    * Algorithm: incremental pair-count maintenance with a
    * lazy-invalidation max-heap (the standard fast-BPE structure, e.g.
    * the HuggingFace tokenizers trainer): counts live in a hash map;
    * every count CHANGE pushes a fresh heap entry; a popped entry is
    * valid only if it matches the map. Each merge touches only the
    * words that contain the chosen pair (an inverted pair→words index,
    * verified on use because it can hold stale entries), recounting
    * just those words' adjacent pairs — O(affected words × word length)
    * per round, O(log #pairs) per count change.
    *
    * Returns the same (round, left, right, pair_count) merge table as
    * [[bpeTrain]]. Keep the distributed form for the q_bpe_train
    * oracle replay; use this one to actually train a tokenizer.
    */
  def bpeTrainLocal(df: DataFrame, textCol: Column, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._

    // ONE corpus-sized pass (identical to bpeTrain's), then collect the
    // vocabulary — the only driver-sized object in the operator.
    val vocabRows = df.select(explode(tokens(textCol)).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .collect()

    val nWords = vocabRows.length
    val words = new Array[Array[String]](nWords)
    val freqs = new Array[Long](nWords)
    var wi = 0
    while (wi < nWords) {
      val w = vocabRows(wi).getString(0)
      // code-point symbols + </w>, matching substr-by-character + marker
      val cps = w.codePoints().toArray
      val syms = new Array[String](cps.length + 1)
      var ci = 0
      while (ci < cps.length) {
        syms(ci) = new String(Character.toChars(cps(ci))); ci += 1
      }
      syms(cps.length) = "</w>"
      words(wi) = syms
      freqs(wi) = vocabRows(wi).getLong(1)
      wi += 1
    }

    val pairCounts =
      scala.collection.mutable.HashMap.empty[(String, String), Long]
    val pairWords = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.HashSet[Int]]
    def addPair(p: (String, String), f: Long, idx: Int): Unit = {
      pairCounts.update(p, pairCounts.getOrElse(p, 0L) + f)
      pairWords.getOrElseUpdate(
        p, scala.collection.mutable.HashSet.empty[Int]) += idx
    }

    wi = 0
    while (wi < nWords) {
      val s = words(wi)
      var i = 0
      while (i + 1 < s.length) { addPair((s(i), s(i + 1)), freqs(wi), wi); i += 1 }
      wi += 1
    }

    // Max-heap with lazy invalidation: count desc, then (l, r) utf8 asc.
    case class Entry(c: Long, l: String, r: String)
    val heap = new java.util.PriorityQueue[Entry](
      math.max(16, pairCounts.size),
      new java.util.Comparator[Entry] {
        def compare(a: Entry, b: Entry): Int = {
          if (a.c != b.c) java.lang.Long.compare(b.c, a.c)
          else {
            val cl = utf8Cmp(a.l, b.l)
            if (cl != 0) cl else utf8Cmp(a.r, b.r)
          }
        }
      })
    pairCounts.foreach { case (p, c) => heap.add(Entry(c, p._1, p._2)) }

    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      // Pop until a live entry (count matches the map) or the heap dries up.
      var top: Entry = null
      while (top == null && !heap.isEmpty) {
        val e = heap.poll()
        if (pairCounts.get((e.l, e.r)).contains(e.c)) top = e
      }
      if (top == null) exhausted = true
      else {
        val (l, r) = (top.l, top.r)
        merges += ((round, l, r, top.c))
        val changed =
          new scala.collection.mutable.HashSet[(String, String)]()
        pairWords.remove((l, r)).foreach { holders =>
          holders.foreach { idx =>
            val old = words(idx)
            // stale-index guard: the word may no longer contain (l, r)
            var has = false
            var i = 0
            while (!has && i + 1 < old.length) {
              has = old(i) == l && old(i + 1) == r; i += 1
            }
            if (has) {
              val f = freqs(idx)
              i = 0
              while (i + 1 < old.length) {
                val p = (old(i), old(i + 1))
                pairCounts.update(p, pairCounts.getOrElse(p, 0L) - f)
                changed += p
                i += 1
              }
              val nw = mergeWordLocal(old, l, r)
              words(idx) = nw
              i = 0
              while (i + 1 < nw.length) {
                val p = (nw(i), nw(i + 1))
                addPair(p, f, idx)
                changed += p
                i += 1
              }
            }
          }
        }
        pairCounts.remove((l, r))
        changed -= ((l, r))
        changed.foreach { p =>
          pairCounts.get(p) match {
            case Some(c) if c > 0L => heap.add(Entry(c, p._1, p._2))
            case _ => pairCounts.remove(p); pairWords.remove(p)
          }
        }
        round += 1
      }
    }
    merges.toSeq.toDF("round", "left", "right", "pair_count")
      .select(col("round").cast("long").as("round"), col("left"),
        col("right"), col("pair_count"))
  }

  /** Convenience: [[bpeTrainLocal]] collected to the (left, right) merge
    * list [[bpeSegment]] consumes — train-then-encode without a second
    * corpus pass through the merge table.
    */
  def bpeTrainLocalMerges(df: DataFrame, textCol: Column,
      rounds: Int): Seq[(String, String)] =
    bpeTrainLocal(df, textCol, rounds).orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** BPE tokenizer APPLICATION: segment the corpus VOCABULARY under an
    * already-learned merge list (the inference side of [[bpeTrain]] —
    * at encode time a tokenizer applies merges in learned order, and
    * because segmentation is a pure function of the WORD, it runs once
    * per distinct word, never per token: one corpus pass to the
    * (word, freq) vocabulary, then `merges.length` map-only
    * [[graft.functions.BpeMergePair]] projections over the
    * vocabulary-sized table. Joining the result back to a token stream
    * is a broadcast of the vocabulary's segmentation — the standard
    * encode shape at any corpus size.)
    *
    * Returns (word, freq, segmentation, n_subwords), segmentation as
    * the space-joined subword list.
    */
  def bpeSegment(df: DataFrame, textCol: Column,
      merges: Seq[(String, String)]): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val vocab = df.select(explode(tokens(textCol)).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
    var seg = vocab.withColumn("__syms",
      concat(
        transform(sequence(lit(1), length(col("__w"))),
          i => col("__w").substr(i, lit(1))),
        array(lit("</w>"))))
    merges.foreach { case (l, r) =>
      seg = seg.withColumn("__syms",
        graft.functions.GraftFunctions.bpeMerge(col("__syms"), l, r))
    }
    seg.select(col("__w").as("word"), col("__f").as("freq"),
      array_join(col("__syms"), " ").as("segmentation"),
      size(col("__syms")).cast("long").as("n_subwords"))
  }

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny — language ID at corpus scale is a
    * counting problem, not a model problem.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "de" -> Seq("der", "die", "und", "das", "ein", "ist"),
    "zh" -> Seq("的", "了", "是", "在", "我"))

  /** Count of tokens that appear in `markers`. */
  def markerHits(toks: Column, markers: Seq[String]): Column = {
    val markerArr = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(markerArr, t)))
  }

  /** Language-ID: argmax over per-language marker-hit counts, ties broken
    * by language order (first wins); "und" when no marker hits at all.
    * Pure expression; one map-only pass.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = langMarkers.map { case (l, ms) => (l, markerHits(toks, ms)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scored.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
    pick
  }

  /** Quality-score feature block (length / punctuation / stopword /
    * alpha-token ratios + mean word length). Returns (name, column) pairs.
    * The composite `quality_score` follows the usual heuristic-filter
    * recipe (Gopher-style rules): each component clipped to [0,1] and
    * averaged.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nChars = length(text)
    val nToks = size(toks)
    val nPunct = length(regexp_replace(text, "[^.!?,;:]", ""))
    val stopArr = array(langMarkers.flatMap(_._2).map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t)))
    val nAlpha = size(filter(toks, t => t.rlike("^[A-Za-z]+$")))
    val meanWordLen = (nChars - (nToks - 1)).cast("double") / nToks
    val stopRatio = nStop.cast("double") / nToks
    val alphaRatio = nAlpha.cast("double") / nToks
    val punctRatio = nPunct.cast("double") / nChars
    val lenScore = least(nToks.cast("double") / 50.0, lit(1.0))
    val quality = (lenScore + least(stopRatio * 5.0, lit(1.0)) + alphaRatio +
      (lit(1.0) - least(punctRatio * 10.0, lit(1.0)))) / 4.0
    Seq(
      "n_tokens" -> nToks,
      "mean_word_len" -> meanWordLen,
      "punct_ratio" -> punctRatio,
      "stopword_ratio" -> stopRatio,
      "alpha_ratio" -> alphaRatio,
      "quality_score" -> quality)
  }

  /** Content fingerprint: 60-bit hash of the sorted distinct normalized
    * token multiset — invariant to word order and repetition, the standard
    * "bag fingerprint" for clustering near-identical documents.
    * Normalization: lowercase, strip non-alphanumerics.
    */
  /** Winnowing fingerprints (the MOSS scheme, Schleimer/Wilkerson/Aiken
    * SIGMOD'03): hash every character `k`-gram of the lower-cased
    * trimmed text, slide a window of `w` consecutive k-gram hashes, and
    * keep each window's MINIMUM hash. The distinct kept hashes are the
    * document's fingerprint set — any shared substring of length
    * >= k + w − 1 between two documents is guaranteed to share at least
    * one fingerprint, which is what makes this the standard local-match
    * detector for plagiarism / near-dup passages. Documents shorter than
    * k + w − 1 normalized chars yield no rows.
    *
    * Returns (`idCol`, `fingerprint`) rows. Shape: explode character
    * positions → codegen'd substr+hash per position → per-document
    * window min over `w` consecutive positions → distinct. Everything
    * stays in whole-stage codegen — a per-row higher-order-function
    * formulation is interpreted and re-evaluates the O(chars)
    * normalization per ELEMENT (measured: minutes vs seconds at sf0.01;
    * same lesson as Dedup.withSimhash). Cost of this shape: the window
    * shuffles one (id, pos, hash) row per character; for map-only
    * operation at extreme scale, localCheckpoint a compact normalized
    * projection first and fold in-row over the materialized gram array.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: Column,
      k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val nGrams = length(col("__wnorm")) - lit(k - 1)
    val grams = df
      .withColumn("__wnorm", lower(trim(textCol)))
      .select(col(idCol), col("__wnorm"), nGrams.as("__ng"))
      .filter(col("__ng") >= w) // at least one full window of k-grams
      .select(col(idCol), col("__wnorm"), col("__ng"),
        explode(sequence(lit(1), col("__ng"), lit(1))).as("__i"))
      .select(col(idCol), col("__ng"), col("__i"),
        Hashing.h60(col("__wnorm").substr(col("__i"), lit(k))).as("__gh"))
    val winMin = min(col("__gh")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(idCol)
        .orderBy(col("__i")).rowsBetween(0, w - 1))
    grams.withColumn("__fp", winMin)
      .filter(col("__i") <= col("__ng") - lit(w - 1)) // only full windows
      .select(col(idCol), col("__fp").as("fingerprint"))
      .distinct()
  }

  /** Map-only winnowing: identical fingerprint sets to
    * [[winnowFingerprints]], computed entirely in-row — the 100 TB shape.
    * The normalized text and its gram-hash ARRAY are materialized as
    * columns (plain attribute references, so the per-element lambdas read
    * bound slots instead of re-running the O(chars) normalization); the
    * sliding window-min folds over the array with `array_min(slice(...))`
    * per position (O(w) integer ops each); per-document distinct is
    * `array_distinct` in-row. The only Generate is the final explode of
    * the (small) fingerprint set — OUTPUT-sized, not corpus-bytes-sized,
    * and it is map-side: no Exchange anywhere in the plan, where the
    * explode+window shape shuffles one (id, pos, hash) row per character
    * of the corpus. PlanSpec pins the no-Exchange property; PropertySpec
    * pins parity with the explode shape.
    *
    * MEMORY CONSTRAINT: the gram-hash array and the per-position
    * window-min array are each O(doc chars) Longs held IN the row — a
    * multi-MB document becomes a tens-of-MB in-flight row. Intended for
    * corpora with bounded document length (≲1 MB/doc, the common
    * pre-chunked LLM-corpus shape); for long-tail corpora (books, raw
    * crawls) either chunk documents first or use [[winnowFingerprints]],
    * whose explode shape streams one gram per row at any length.
    */
  def winnowFingerprintsMapOnly(df: DataFrame, idCol: String, textCol: Column,
      k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val grams = df
      .withColumn("__wnorm", lower(trim(textCol)))
      .withColumn("__ng", length(col("__wnorm")) - lit(k - 1))
      .filter(col("__ng") >= w) // at least one full window of k-grams
      .withColumn("__gh", transform(sequence(lit(1), col("__ng")),
        i => Hashing.h60(col("__wnorm").substr(i, lit(k)))))
    grams.select(col(idCol),
      explode(array_distinct(transform(
        sequence(lit(1), col("__ng") - lit(w - 1)),
        i => array_min(slice(col("__gh"), i, lit(w)))))).as("fingerprint"))
  }

  /** Per-document repetition profile (the Gopher-style repetition
    * filters adapted to whitespace tokens): duplicate-token fraction
    * (1 − distinct/total) and the fraction of word `n`-grams taken by
    * the single most frequent one. High values flag boilerplate /
    * degenerate generations for corpus filtering.
    *
    * Returns (`idCol`, n_tokens, n_distinct_tokens, dup_token_frac,
    * top_gram_frac). Documents with fewer than `n` tokens have no
    * n-grams and get a null top_gram_frac; zero-token documents are
    * dropped (parity with the original exploded form, where a doc with
    * no tokens contributed no rows).
    *
    * Shape: every output is a ROW-LOCAL quantity, so this is ONE
    * map-only pass that pipelines with the scan — no explode, no
    * shuffle, no join (the r8 form spent 2 explode→two-level-aggregate
    * pipelines + a join ≈ 4 shuffles/5 jobs recomputing per-row facts
    * corpus-wide, and its 1.57 s at sf0.1 was 3.6× DuckDB on pure job
    * overhead). The most-frequent-gram count is the longest equal-run
    * of the row's SORTED gram array — an O(g log g) in-row sort + one
    * fold, the winnowing-style shape that benches below DuckDB.
    */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: Column,
      n: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val toksC = tokens(textCol)
    // the modal-gram count is one codegen'd kernel over the token array
    // (sort gram start-indices + equal-run scan in a single JVM call —
    // see GramTopRun for why not explode/groupBy or a HOF fold)
    val topn = graft.functions.GraftFunctions.gramTopRun(toksC, n)
    val ng = greatest(size(toksC) - lit(n - 1), lit(0))
    df.select(col(idCol),
        size(toksC).cast("long").as("n_tokens"),
        size(array_distinct(toksC)).cast("long").as("n_distinct_tokens"),
        ng.as("__ng"), topn.as("__topn"))
      .where(col("n_tokens") > 0)
      .select(col(idCol), col("n_tokens"), col("n_distinct_tokens"),
        round(lit(1.0) - col("n_distinct_tokens").cast("double") / col("n_tokens"), 6)
          .as("dup_token_frac"),
        round(col("__topn").cast("double") / col("__ng"), 6).as("top_gram_frac"))
  }

  /** PII scrubbing: replace email addresses and NNN-NNN-NNNN phone
    * numbers with typed placeholders, and count each. The patterns are
    * deliberately lookaround-free so the same regex is valid in Java
    * (Spark) and RE2-class engines (DuckDB, Go) — portability is part
    * of the operator's contract, since redaction must be reproducible
    * across the pipeline stack. Pure map-side expressions that pipeline
    * with the scan.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\d{3}-\\d{3}-\\d{4}"

  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  def piiCounts(text: Column): (Column, Column) =
    (size(regexp_extract_all(text, lit(EmailPattern), lit(0))),
      size(regexp_extract_all(text, lit(PhonePattern), lit(0))))

  def bagFingerprint(text: Column): Column = {
    val norm = lower(regexp_replace(text, "[^A-Za-z0-9 ]", " "))
    val toks = filter(split(trim(norm), "\\s+"), t => t =!= "")
    Hashing.h60(concat_ws(" ", array_sort(array_distinct(toks))))
  }

  /** Rolling (polynomial) hash over the whole document's characters —
    * h = Σ c_i·B^(n−1−i) mod P, computed as a left fold h = h·B + c_i.
    * Expressed with the `aggregate` higher-order function over the
    * document's characters; per-row, no shuffle. (Not ANSI-SQL
    * expressible — covered by unit tests rather than the DuckDB oracle.)
    */
  def rollingHash(text: Column, base: Long = 257L, mod: Long = 1000000007L): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => (acc * base + c) % mod)

  /** Sequence packing (concat-and-chunk, the standard LM-pretraining
    * layout): documents are laid end-to-end in `orderCol` order within
    * each shard; each doc gets the id of the `budget`-token sequence its
    * FIRST token lands in and its offset inside that sequence. Documents
    * may straddle a sequence boundary — that is the concat-and-chunk
    * contract (the trainer splits at the boundary), not a bug.
    *
    * Scale shape: ONE window (cumulative sum) partitioned by `shardCol`
    * — pack parallelism = shard count, so shard by something with
    * thousands of values at corpus scale. No collect, no global sort.
    */
  def packSequences(df: DataFrame, orderCol: Column, tokenCol: Column,
      budget: Long, shardCol: Column): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val start = coalesce(sum(tokenCol).over(w), lit(0L))
    // `div` (not `/`): Column `/` is double division, which loses
    // precision on cumulative token counts past 2^53 — real at the
    // corpus scale this operator is advertised for.
    df.withColumn("__start", start)
      .withColumn("seq_in_shard", expr(s"__start div ${budget}L"))
      .withColumn("seq_offset", pmod(col("__start"), lit(budget)))
      .drop("__start")
  }

  /** Token-budget sampling ("take N tokens of code, M of web"): within
    * each stratum, documents are ranked in a DETERMINISTIC pseudo-random
    * order (h60 of the id — reproducible across runs and engines) and
    * kept while the stratum's running token total stays within its
    * budget (first doc to exceed the budget is dropped, truncation
    * semantics). Unlisted strata get budget 0. One window + one filter;
    * same nested-growth property as hashSample: raising a budget only
    * ADDS documents.
    */
  def tokenBudgetSample(df: DataFrame, idCol: Column, tokenCol: Column,
      stratumCol: Column, budgets: Map[String, Long]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(Hashing.h60(idCol.cast("string")), idCol)
    val budget = budgets.foldLeft(lit(0L)) {
      case (acc, (k, v)) => when(stratumCol === k, lit(v)).otherwise(acc)
    }
    // `budget > 0` keeps budget-0 strata truly empty: without it a
    // zero-token document (cum = 0 <= 0) in an unlisted stratum would
    // survive, contradicting the contract above.
    df.withColumn("__cum", sum(tokenCol).over(w))
      .filter(col("__cum") <= budget && budget > lit(0L))
      .drop("__cum")
  }

  /** Fixed-size token chunking with overlap — the RAG / context-window
    * document splitter, and the long-document guard for the in-row
    * fingerprint operators (see [[winnowFingerprintsMapOnly]]'s memory
    * constraint). Chunks start every `chunkSize − overlap` tokens and
    * cover `chunkSize` tokens each (the last may be shorter); every
    * token lands in ≥1 chunk and the trailing chunk is never fully
    * contained in its predecessor. Output: one row per (id, chunk_idx)
    * with the chunk text and its token count.
    *
    * Scale shape: map-only — tokenize, generate chunk starts with
    * `sequence`, explode. The explode fan-out is O(doc_tokens/stride)
    * rows per doc; no shuffle anywhere.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: Column,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    df.withColumn("__toks", tokens(textCol))
      .select(col(idCol),
        col("__toks"),
        posexplode(sequence(lit(1),
          greatest(lit(1), size(col("__toks")) - overlap), lit(stride)))
          .as(Seq("chunk_idx", "__start")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), col("__start"), lit(chunkSize)))
          .as("chunk_text"),
        size(slice(col("__toks"), col("__start"), lit(chunkSize))).cast("long")
          .as("n_tokens"))
  }

  /** Corpus-wide segment-level exact dedup — the paragraph/line dedup
    * stage of the CCNet pipeline, applied to fixed-`segTokens` token
    * segments (pass a paragraph splitter's output instead when documents
    * have structural delimiters). Every segment is content-hashed; only
    * the globally FIRST occurrence (minimum (doc, position)) of each
    * distinct segment survives, and documents are reassembled from
    * their surviving segments in order. Boilerplate shared by thousands
    * of pages collapses to one copy.
    *
    * Output: (id, clean_text, n_segments, n_kept) — one row per input
    * document (clean_text is empty when every segment was seen earlier).
    *
    * Scale shape: ONE tokenize pass — first-occurrence selection is a
    * row_number window over the 8-byte content hash (one hash-keyed
    * shuffle; per-hash groups are duplicate-count-sized, so the
    * per-partition sort is trivial), then one doc-keyed shuffle to
    * reassemble. The earlier aggregate+probe-join formulation ran the
    * tokenize+hash pipeline once per consumer (no cross-consumer CSE)
    * and cost a third shuffle.
    */
  def dedupSegments(df: DataFrame, idCol: String, textCol: Column,
      segTokens: Int): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    val segs = df.withColumn("__toks", tokens(textCol))
      .select(col(idCol),
        posexplode(sequence(lit(1), greatest(lit(1),
          size(col("__toks"))), lit(segTokens))).as(Seq("seg_idx", "__start")),
        col("__toks"))
      .select(col(idCol), col("seg_idx"),
        concat_ws(" ", slice(col("__toks"), col("__start"), lit(segTokens)))
          .as("__seg"))
      .withColumn("__h", Hashing.h60(col("__seg")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col(idCol), col("seg_idx"))
    segs
      .withColumn("__kept", row_number().over(w) === 1)
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__kept"),
            struct(col("seg_idx"), col("__seg"))))),
          s => s.getField("__seg"))).as("clean_text"),
        count(lit(1)).as("n_segments"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** Exact-substring span dedup (the fixed-window form of Lee et al.
    * 2021, arXiv:2107.06499 "Deduplicating Training Data Makes
    * Language Models Better"): remove every RE-occurrence of any
    * `n`-token span that appeared earlier in the corpus, at ARBITRARY
    * offsets — the overlapping-window complement of [[dedupSegments]]'
    * fixed boundaries (a duplicated phrase straddling a segment
    * boundary is invisible there; here any duplicated run of ≥ n
    * tokens contains a duplicated n-span at every offset and is
    * caught). The published recipe builds a suffix array over the
    * concatenated corpus — a shared-memory structure with no
    * distributed construction; the sliding-window form keeps the
    * ≥ n-token-run semantics while staying hash-shuffle-shaped.
    *
    * Rule: a span occurrence (doc, pos) of hash h is a DUPLICATE
    * unless it is the corpus-wide first occurrence of h (minimum
    * (doc, pos) lexicographically). A token is removed iff ≥ 1
    * duplicate span covers it; first occurrences keep their text, so
    * wholly-novel documents pass through untouched.
    *
    * Output: (id, clean_text, n_tokens, n_removed) — one row per
    * input document.
    *
    * Scale shape: md5 once per TOKEN, span hashes in-row (rotl-xor
    * zip — [[shingleHashesFromTokenHashes]]); first-occurrence
    * selection is a row_number window over the 8-byte span hash
    * (per-hash groups are duplicate-count-sized); covered positions
    * fan out n× from DUPLICATE occurrences only, so that explode is
    * proportional to dup volume, not corpus size; the rebuild is one
    * doc-keyed aggregate. The token array is checkpointed once and
    * feeds both the span stream and the rebuild (no cross-consumer
    * CSE in Spark — the tokenize would otherwise run per consumer).
    */
  def dedupSpans(df: DataFrame, idCol: String, textCol: Column,
      n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    // the single-tier case of [[dedupSpansMulti]]: minOcc = 2 is
    // implied by the rank > 1 first-occurrence rule, so one (n, 2)
    // tier IS this operator (equivalence pinned in CorpusOpsSpec)
    dedupSpansMulti(df, idCol, textCol, Seq(n -> 2))
  }

  /** Variable-length exact-substring span dedup (VERDICT r16 #7): the
    * multi-scale composition of [[dedupSpans]] that narrows the gap to
    * the Lee et al. 2021 suffix-array original. Each tier is an
    * (n, minOccurrences) pair: a span occurrence at window length `n`
    * is removable only when its hash occurs at least `minOccurrences`
    * times corpus-wide — the EVIDENCE threshold scales inversely with
    * match length (a 100-token verbatim match duplicated twice is
    * plagiarism; a 25-token match needs to recur like boilerplate
    * before it's trusted as a duplicate, because short exact matches
    * arise by chance). No single (n, minOcc) configuration expresses
    * this: min-n alone over-fires on coincidental short repeats,
    * max-n alone misses sub-window duplicated passages entirely
    * (DedupSpansMultiSpec pins both directions). Coverage is the
    * UNION over tiers; the corpus-wide first occurrence of each span
    * hash is kept per tier, so one copy of every duplicated passage
    * always survives.
    *
    * Output: (id, clean_text, n_tokens, n_removed) — one row per doc,
    * same contract as [[dedupSpans]]; `dedupSpansMulti(df, id, text,
    * Seq(n -> 2))` ≡ `dedupSpans(df, id, text, n)`.
    *
    * Scale shape: the token array is tokenized + hashed ONCE
    * (checkpointed) and every tier's span hashes derive in-row from
    * the same token-hash array (rotl-xor zip — zero extra corpus
    * passes); each tier adds one window pass over ITS span-hash
    * shuffle (per-hash groups are duplicate-count-sized) and the
    * occurrence count rides the same window partition as the
    * first-occurrence rank — no second aggregate. Coverage explode
    * stays proportional to duplicate volume per tier; the rebuild is
    * one doc-keyed aggregate shared by all tiers.
    */
  def dedupSpansMulti(df: DataFrame, idCol: String, textCol: Column,
      tiers: Seq[(Int, Int)]): DataFrame = {
    require(tiers.nonEmpty, "at least one (n, minOccurrences) tier")
    require(tiers.forall { case (n, m) => n > 0 && m >= 2 },
      "n must be positive and minOccurrences >= 2 (1 would remove first occurrences)")
    val toksD = df.withColumn("__toks", tokens(textCol))
      .select(col(idCol), col("__toks"))
      .graftCheckpoint()
    val hts = toksD
      .withColumn("__hts", transform(col("__toks"), t => Hashing.h60(t)))
    val covered = tiers.map { case (n, minOcc) =>
      spanCoveredPositions(hts, idCol, n, minOcc)
    }.reduce(_ unionByName _)
      .distinct()
      .withColumn("__cov", lit(true))
    toksD.select(col(idCol), posexplode(col("__toks")).as(Seq("__ti", "__tok")))
      .join(covered, Seq(idCol, "__ti"), "left")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__cov").isNull,
            struct(col("__ti"), col("__tok"))))),
          s => s.getField("__tok"))).as("clean_text"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("__cov").isNotNull, 1L).otherwise(0L)).as("n_removed"))
  }

  /** Covered token positions of the (n, minOcc) exact-substring rule —
    * the shared core of [[dedupSpansMulti]] and the variable-length
    * form: (id, __ti) rows for every token inside a non-first-occurrence
    * n-span whose hash occurs ≥ minOcc times corpus-wide.
    */
  private def spanCoveredPositions(hts: DataFrame, idCol: String,
      n: Int, minOcc: Int): DataFrame = {
    val spans = hts.select(col(idCol),
      posexplode(shingleHashesFromTokenHashes(col("__hts"), n))
        .as(Seq("__pos", "__h")))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col(idCol), col("__pos"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))
    spans
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__occ", count(lit(1)).over(wAll))
      .filter(col("__rn") > 1 && col("__occ") >= minOcc)
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + lit(n - 1))).as("__ti"))
  }

  /** VARIABLE-LENGTH exact-substring duplicate spans (VERDICT r17 #7 —
    * the suffix-array-faithful form of Lee et al. 2021's ExactSubstr):
    * one row per MAXIMAL duplicated token run of length ≥ `minLen`,
    * with its true data-determined length — a 60-token verbatim
    * passage is ONE (start, len=60) span here, where the fixed-window
    * forms see only its n-token window artifacts and the tier form
    * quantizes removal to whatever tier fires.
    *
    * Equivalence that makes this exact without a suffix array: a
    * duplicated run of length L ≥ minLen contains a duplicated
    * minLen-window at EVERY offset (L − minLen + 1 of them), and every
    * covered position lies inside such a window — so the union of
    * duplicated fixed-minLen windows equals the union of maximal
    * duplicated runs, and merging adjacent covered positions
    * (the islands window below) recovers each maximal run as one
    * interval. What the window form alone cannot do is REPORT that
    * interval; what the tier form cannot do is remove a run whose
    * length falls between its tiers (DedupSpansVariableSpec pins the
    * fragment case). Runs separated by zero uncovered tokens merge —
    * two abutting duplicated passages read as one span, the same
    * answer a suffix array's maximal-match merge gives.
    *
    * Output: (id, span_start, span_len), span_start 0-based in token
    * positions, ordered (id, span_start).
    *
    * Scale shape: the one span-hash shuffle of [[dedupSpans]] plus one
    * doc-keyed window over COVERED positions only (duplicate-volume-
    * sized, not corpus-sized): islands via the classic
    * position − row_number() run key, then a (doc, run) aggregate.
    * No driver state, no per-span jobs.
    */
  def duplicateSpanRanges(df: DataFrame, idCol: String, textCol: Column,
      minLen: Int, minOcc: Int = 2): DataFrame = {
    require(minLen > 0, "minLen must be positive")
    require(minOcc >= 2, "minOcc >= 2 (1 would flag first occurrences)")
    val hts = df.withColumn("__toks", tokens(textCol))
      .select(col(idCol),
        transform(col("__toks"), t => Hashing.h60(t)).as("__hts"))
    // No distinct() before the islands window: overlapping duplicated
    // windows emit the same (id, __ti) many times, and dedup-by-shuffle
    // would cost a full (id, ti) exchange of the dup-volume rows just to
    // feed the id-keyed window an exchange later. dense_rank makes the
    // run key duplicate-TOLERANT instead — repeated positions share a
    // rank, consecutive distinct positions get consecutive ranks, so
    // `ti − dense_rank` is constant across a maximal run with or without
    // duplicates — and the span length is the distinct-position count.
    // One exchange (id) total; the aggregate reuses it (grouping on a
    // superset of the partitioning keys needs no re-shuffle).
    val covered = spanCoveredPositions(hts, idCol, minLen, minOcc)
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__ti"))
    covered
      .withColumn("__run", col("__ti") - dense_rank().over(wDoc))
      .groupBy(col(idCol), col("__run"))
      .agg(min(col("__ti")).cast("long").as("span_start"),
        count_distinct(col("__ti")).as("span_len"))
      .select(col(idCol), col("span_start"), col("span_len"))
      .orderBy(col(idCol), col("span_start"))
  }

  /** Removal twin of [[duplicateSpanRanges]]: strip every maximal
    * duplicated run ≥ `minLen` whole and account for it at SPAN
    * granularity — (id, clean_text, n_tokens, n_removed, n_spans), one
    * row per input document, n_spans the number of maximal runs
    * removed (0 for untouched docs). clean_text/n_removed coincide
    * with `dedupSpans(df, id, text, minLen)` by the coverage-union
    * equivalence above (pinned in spec); n_spans is the signal the
    * fixed-window form cannot produce.
    */
  def dedupSpansVariable(df: DataFrame, idCol: String, textCol: Column,
      minLen: Int, minOcc: Int = 2): DataFrame = {
    require(minLen > 0, "minLen must be positive")
    require(minOcc >= 2, "minOcc >= 2 (1 would flag first occurrences)")
    val toksD = df.withColumn("__toks", tokens(textCol))
      .select(col(idCol), col("__toks"))
      .graftCheckpoint()
    val hts = toksD
      .withColumn("__hts", transform(col("__toks"), t => Hashing.h60(t)))
    val covered = spanCoveredPositions(hts, idCol, minLen, minOcc).distinct()
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__ti"))
    // span id per covered position: islands key — start-of-run positions
    // (run key change) count as new spans within the doc aggregate
    val cov = covered
      .withColumn("__run", col("__ti") - row_number().over(wDoc))
      .withColumn("__cov", lit(true))
    toksD.select(col(idCol), posexplode(col("__toks")).as(Seq("__ti", "__tok")))
      .join(cov, Seq(idCol, "__ti"), "left")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__cov").isNull,
            struct(col("__ti"), col("__tok"))))),
          s => s.getField("__tok"))).as("clean_text"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("__cov").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        count_distinct(col("__run")).as("n_spans"))
  }

  /** DSIR-style importance scores (hashed n-gram importance resampling,
    * the published recipe of Xie et al. 2023, arXiv:2302.03169): token
    * unigrams are hashed into `buckets` counts; a doc's score is its
    * mean per-token log-likelihood ratio between the TARGET distribution
    * (docs matching `targetPred`) and the RAW distribution (all docs),
    * both add-`alpha` smoothed. Rank-and-keep the top scores to tilt a
    * raw crawl toward the target domain.
    *
    * Output: (id, n_tokens, dsir_score) — score rounded to 6 dp for
    * engine-portable comparison.
    *
    * Scale shape: BOTH distributions come out of one count aggregate
    * (target counts are a conditional sum, not a second scan); the
    * bucket table is ≤`buckets` rows → broadcast back to the token
    * stream; totals ride as a 1-row broadcast cross join. The corpus is
    * never shuffled — only (id, bucket) token rows into the per-doc
    * mean. The algorithm is inherently TWO passes over the corpus
    * (count the model, then score against it — any engine pays both);
    * the token stream is deliberately RECOMPUTED for the scoring pass
    * rather than checkpointed: materializing O(corpus-tokens) rows
    * costs far more than re-running the codegen'd tokenize, and the
    * only cross-pass state that matters (counts, totals) is tiny.
    */
  def dsirScores(df: DataFrame, idCol: String, textCol: Column,
      targetPred: Column, buckets: Int = 4096,
      alpha: Double = 0.5): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val toks = df.select(col(idCol), targetPred.as("__is_t"),
        explode(tokens(textCol)).as("__tok"))
      .withColumn("__b", pmod(Hashing.h60(col("__tok")), lit(buckets.toLong)))
    val counts = toks.groupBy("__b").agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__is_t"), 1L).otherwise(0L)).as("__ct"))
    val totals = counts.agg(sum(col("__cr")).as("__tr"),
      sum(col("__ct")).as("__tt"))
    val aB = alpha * buckets
    val ratio = toks
      .join(broadcast(counts), Seq("__b"))
      .crossJoin(broadcast(totals))
      .withColumn("__lr",
        log((col("__ct") + alpha) / (col("__tt") + aB))
          - log((col("__cr") + alpha) / (col("__tr") + aB)))
    ratio.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("__lr")), 6).as("dsir_score"))
  }

  /** Per-document unigram surprisal (mean −ln p(token) under an add-
    * `alpha`-smoothed unigram LM trained on the corpus itself) — the
    * perplexity-bucket quality signal of the CCNet pipeline, with the
    * unigram LM standing in for the external KenLM (the operator shape
    * — train counts, broadcast, score — is identical; swap the model
    * table to use a real LM). High surprisal ⇒ rare/garbled vocabulary.
    *
    * Output: (id, n_tokens, surprisal) — rounded to 6 dp.
    *
    * Scale shape: same as [[dsirScores]] — one explode pass, a vocab-
    * sized count table broadcast back, totals as a 1-row cross join.
    * NOTE the model table here is vocab-sized, not `buckets`-bounded;
    * for an unbounded-vocab corpus hash tokens into buckets first (as
    * dsirScores does) to keep the broadcast bounded.
    */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: Column,
      alpha: Double = 0.5): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(textCol)).as("__tok"))
    val counts = toks.groupBy("__tok").agg(count(lit(1)).as("__c"))
    val totals = counts.agg(sum(col("__c")).as("__t"),
      count(lit(1)).as("__v"))
    toks.join(broadcast(counts), Seq("__tok"))
      .crossJoin(broadcast(totals))
      .withColumn("__s",
        -log((col("__c") + alpha) / (col("__t") + lit(alpha) * col("__v"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("__s")), 6).as("surprisal"))
  }

  /** Per-document bigram surprisal (mean −ln p(w₂|w₁) under an add-
    * `alpha`-smoothed bigram LM trained on the corpus itself) — the
    * next-order refinement of [[unigramSurprisal]]: a doc full of
    * common words in IMPLAUSIBLE order ("the of and a the") scores
    * high here while the unigram model waves it through. Documents
    * with fewer than 2 tokens contribute no bigrams and are absent
    * from the output.
    *
    * Smoothing: p(w₂|w₁) = (c(w₁w₂)+α) / (c(w₁·)+α·V) where c(w₁·)
    * counts bigrams STARTING with w₁ (derived from the bigram counts,
    * so corner tokens are handled consistently) and V is the context
    * vocabulary size.
    *
    * Scale shape — deliberately different from the unigram op: a
    * bigram LM is vocab²-bounded, too big to assume broadcastable, so
    * scoring is a SHUFFLE join keyed on the bigram between the
    * checkpointed compact (doc, bigram, tf) relation and the LM
    * derived FROM that same relation (the tfidf one-tokenize-pass
    * discipline — without the checkpoint the explode pipeline runs
    * once per consumer). Context counts and vocab collapse to
    * unigram-vocab- and 1-row relations. At broadcastable corpus
    * sizes AQE downgrades the bigram join to broadcast on its own.
    */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: Column,
      alpha: Double = 0.5): DataFrame = {
    val bg = df.withColumn("__toks", tokens(textCol))
      .select(col(idCol),
        explode(wordShinglesFromTokens(col("__toks"), 2)).as("__bg"))
    val dtf = bg.groupBy(col(idCol), col("__bg"))
      .agg(count(lit(1)).as("__tf"))
      .graftCheckpoint()
    val c12 = dtf.groupBy("__bg").agg(sum(col("__tf")).as("__c12"))
      .withColumn("__w1", substring_index(col("__bg"), " ", 1))
    val ctx = c12.groupBy("__w1").agg(sum(col("__c12")).as("__c1"))
    val vocab = ctx.agg(count(lit(1)).as("__v"))
    dtf.join(c12.join(broadcast(ctx), "__w1"), "__bg")
      .crossJoin(broadcast(vocab))
      .withColumn("__s",
        -log((col("__c12") + alpha) / (col("__c1") + lit(alpha) * col("__v"))))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).cast("long").as("n_bigrams"),
        round(sum(col("__tf") * col("__s")) / sum(col("__tf")), 6).as("surprisal"))
  }

  /** BM25 top-`k` retrieval for a fixed bag of query terms (Okapi BM25
    * with the Lucene `ln(1 + (N − df + 0.5)/(df + 0.5))` idf, so scores
    * are always ≥ 0). The retrieval op of a training-data pipeline's
    * "find documents about X" / targeted-subset-selection step.
    *
    * Scale shape — deliberately NOT the textbook inverted-index build:
    * per-document term frequencies for the handful of query terms are
    * computed map-side with `size(filter(toks, _ = term))` directly on
    * the token array — no explode, no (doc, term) shuffle, no posting
    * list. Corpus statistics (N, avgdl, per-term df) reduce to ONE row
    * via a single aggregate, broadcast back with a 1-row cross join;
    * scoring is then pure per-row arithmetic inside codegen, and the
    * only data movement for the result is the O(k)-per-partition
    * TakeOrdered. An inverted index pays off when queries are many and
    * ad-hoc; for a pipeline pass with a known query, two map passes
    * over the corpus beat building one.
    *
    * Output: (idCol, doc_len, bm25) — the k highest-scoring documents
    * with at least one query-term occurrence, ties broken on id.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: Column,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, "k must be positive")
    val terms = queryTerms.distinct
    val withTf = terms.zipWithIndex.foldLeft(
        df.select(col(idCol), tokens(textCol).as("__toks"))
          .withColumn("__dl", size(col("__toks")))) {
        case (acc, (term, i)) =>
          acc.withColumn(s"__tf_$i",
            size(filter(col("__toks"), x => x === lit(term))))
      }.drop("__toks")
    val dfAggs = avg(col("__dl")).as("__avgdl") +: terms.indices.map(i =>
      sum((col(s"__tf_$i") > 0).cast("long")).as(s"__df_$i"))
    val stats = withTf.agg(count(lit(1)).as("__n"), dfAggs: _*)
    val score = terms.indices.map { i =>
      val idf = log((col("__n") - col(s"__df_$i") + 0.5) /
        (col(s"__df_$i") + 0.5) + 1.0)
      val tf = col(s"__tf_$i").cast("double")
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .withColumn("bm25", round(score, 6))
      .filter(col("bm25") > 0)
      .select(col(idCol), col("__dl").cast("long").as("doc_len"), col("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }
}
