package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.pipelines.CorpusPipeline
import graft.sources.Tables

/** Round-11 scaling datapoints for the session's corpus operators at
  * one decade up (sf0.1 → locally generated sf1 — 50k docs with ~5%
  * injected near-dups and ~1.5% exact copies, tools/gen_sf1_documents
  * .py): exact-substring span dedup (the corpus-span window + dup-
  * bounded coverage fan-out is the part that must scale), bigram
  * surprisal (bigram-keyed LM join), BM25 top-k (map-only + 1-row
  * broadcast — should ride the per-job floor), and the full
  * CorpusPipeline.curate flagship on the sf1 dup structure. Run via
  * `sbt "Test/runMain graft.BenchCorpusSf1"`; output committed as
  * BENCH_corpus_sf1.json.
  */
object BenchCorpusSf1 {
  private def timeS[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }
  private def f3(v: Double): Double = math.rint(v * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = 2
    val results = Seq(("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sf1", "sf1"))
      .map { case (dir, tag) =>
        val runs = (1 to reps).map { _ =>
          val docs = Tables.documents(spark, dir, widen = true)
          val nDocs = docs.count()
          val (tSpan, spanOut) = timeS {
            val r = TextOps.dedupSpans(docs, "doc_id", col("text"), n = 8)
              .agg(count(lit(1)), sum(col("n_removed"))).collect().head
            (r.getLong(0), r.getLong(1))
          }
          val (tBigram, bigramRows) = timeS {
            TextOps.bigramSurprisal(docs, "doc_id", col("text")).count()
          }
          val (tBm25, bm25Rows) = timeS {
            TextOps.bm25TopK(docs, "doc_id", col("text"),
              Seq("spark", "query", "window", "hash"), 25).count()
          }
          val (tCurate, curateOut) = timeS {
            val eval = docs.filter(col("doc_id") % 101 === 0).select(col("text"))
            val r = CorpusPipeline.curate(docs, eval)
              .agg(count(lit(1)), sum(col("n_tokens"))).collect().head
            (r.getLong(0), r.getLong(1))
          }
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          (nDocs, tSpan, spanOut, tBigram, bigramRows, tBm25, bm25Rows,
            tCurate, curateOut)
        }
        val best = runs.minBy(r => r._2 + r._4 + r._6 + r._8)
        val (nDocs, tSpan, (spanDocs, spanRemoved), tBigram, bigramRows,
          tBm25, bm25Rows, tCurate, (kept, keptToks)) = best
        s""""$tag":{"n_docs":$nDocs,"span_dedup_sec":${f3(tSpan)},""" +
          s""""span_docs":$spanDocs,"span_tokens_removed":$spanRemoved,""" +
          s""""bigram_surprisal_sec":${f3(tBigram)},"bigram_docs":$bigramRows,""" +
          s""""bm25_sec":${f3(tBm25)},"bm25_rows":$bm25Rows,""" +
          s""""curate_sec":${f3(tCurate)},"curate_kept":$kept,"curate_tokens":$keptToks}"""
      }
    println(s"""{"metric":"corpus_scaling","reps_each":$reps,"best_of":"sum_sec",${results.mkString(",")}}""")
    spark.stop()
  }
}
