package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.{Dedup, TextOps}

/** End-to-end training-corpus curation — the LLM-data counterpart of
  * [[TrainingPipeline]] (E1) and [[GeoPipeline]] (E3): every stage is
  * an individually-oracle-checked operator, composed in the order a
  * production pipeline runs them. Stage order matters and is the
  * standard one:
  *
  *  1. map-only quality gates FIRST (language ID, token count,
  *     composite quality score) — they're free relative to everything
  *     downstream and shrink the corpus before any shuffle;
  *  2. exact dedup (one content-hash aggregate) before fuzzy — exact
  *     copies would otherwise inflate every LSH band bucket;
  *  3. fuzzy dedup: MinHash-LSH candidate pairs → connected
  *     components → lowest-id survivor per near-dup cluster;
  *  4. exact-substring span dedup of the SURVIVORS — document-level
  *     dedup keeps one copy per cluster, but shared boilerplate runs
  *     between non-near-dup documents remain; this strips them
  *     token-by-token;
  *  5. decontamination against the eval set (bloom-prefiltered exact
  *     n-gram membership) — after dedup, so the n-gram join probes
  *     the smallest possible corpus;
  *  6. greedy sequence packing of what survives into fixed token
  *     budgets, sharded for parallelism.
  *
  * Scale notes: stages 1 is shuffle-free; 2 is one hash aggregate;
  * 3 is banded (never all-pairs) + frontier CC; 4's fan-out tracks
  * dup volume; 5's shuffle tracks contamination rate; 6 is one
  * window per shard. No stage collects to the driver except the
  * bloom bitset (2 B/eval-gram).
  */
object CorpusPipeline {

  /** Curate `docs` (schema: doc_id, text, ...) against `evalSet`
    * (schema: ..., text). Returns one row per surviving document:
    * (doc_id, lang_id, n_tokens, shard, seq_in_shard, seq_offset)
    * where n_tokens counts tokens AFTER span-dedup and the seq_*
    * columns place the document in its packed training sequence.
    */
  def curate(docs: DataFrame, evalSet: DataFrame,
      minTokens: Int = 5, minQuality: Double = 0.3,
      spanN: Int = 8, packBudget: Long = 2048, shards: Int = 64): DataFrame = {
    val fm = TextOps.qualityFeatures(col("text")).toMap
    val gated = docs
      .withColumn("lang_id", TextOps.langId(col("text")))
      .withColumn("__nt", fm("n_tokens").cast("long"))
      .withColumn("__q", fm("quality_score"))
      .filter(col("lang_id") =!= "und" &&
        col("__nt") >= minTokens && col("__q") >= minQuality)
      .drop("__nt", "__q")
    val exact = Dedup.exact(gated, "text", "doc_id")
    val pairs = Dedup.minhashLshPairs(exact, "text", "doc_id",
      n = 3, k = 12, rowsPerBand = 2)
    val clusters = Dedup.connectedComponents(exact, pairs, "doc_id")
    val fuzzy = Dedup.dedupByClusters(exact, clusters, "doc_id")
    // span dedup re-emits the text with duplicated runs stripped; docs
    // reduced to nothing (pure boilerplate) drop out here
    val spanned = TextOps.dedupSpans(fuzzy, "doc_id", col("text"), spanN)
      .filter(col("n_tokens") > col("n_removed"))
      .select(col("doc_id"), col("clean_text").as("text"),
        (col("n_tokens") - col("n_removed")).as("n_tokens"))
    val contaminated = Dedup.contaminatedDocsBloom(spanned, evalSet,
      "text", "doc_id", n = spanN)
    val clean = spanned.join(contaminated, Seq("doc_id"), "left_anti")
      // lang_id rides from the gated relation (span dedup projects it
      // away); broadcast-sized only at toy scale, so a plain key join
      .join(fuzzy.select(col("doc_id"), col("lang_id")), Seq("doc_id"))
    val sharded = clean.withColumn("shard",
      pmod(Hashing.h60(col("doc_id").cast("string")), lit(shards.toLong)))
    TextOps.packSequences(sharded, col("doc_id"), col("n_tokens"),
        packBudget, col("shard"))
      .select(col("doc_id"), col("lang_id"), col("n_tokens"), col("shard"),
        col("seq_in_shard"), col("seq_offset"))
  }
}
