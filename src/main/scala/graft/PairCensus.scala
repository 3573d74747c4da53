package graft

import org.apache.spark.sql.SparkSession

/** Measurement tool for the dedup-family decade table (PLANS.md): counts
  * the emitted/candidate pairs behind each pair-driven decade member so
  * wall-time growth can be normalized by output size (sec/Mpair).
  *
  * - `lsh_candidate_pairs`: rows of `q_lsh_candidate_pairs` — the exact
  *   edge set consumed by q_neardup_clusters / q_dedup_fuzzy /
  *   q_leakage_split (all three build on Dedup.minhashLshPairs with the
  *   same parameters, Queries.scala).
  * - `simhash_neardup_pairs`: rows of `q_simhash_neardup_pairs` — its own
  *   verified pair output.
  *
  * Usage: runMain graft.PairCensus <sfDir> [queryName...] — prints one
  * `name=count` line per census (default: the two pair generators above;
  * pass explicit query names to count any SparkEntry query's output
  * cardinality, e.g. q_ngram_jaccard_pairs). Counting collapses sorts/
  * projections (fine: cardinality, not content, is the quantity here).
  */
object PairCensus {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: PairCensus <sfDir> [queryName...]")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_lsh_candidate_pairs", "q_simhash_neardup_pairs")
    for (q <- names)
      println(s"$q=${SparkEntry.queries(q)(spark, dir).count()}")
    spark.stop()
  }
}
