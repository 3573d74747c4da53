package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Drift, Similarity}
import graft.sources.Tables

/** Round-12 scaling datapoints for the drift / heavy-hitters / PQ
  * families at one decade up (sf0.1 → locally generated sf1,
  * tools/gen_sf1_*.py): PSI and KS are two hash aggregates + a
  * bins/value-cardinality tail; token-JS is scan + vocabulary-sized
  * tables; Misra-Gries is a single O(k)-buffer aggregate (must be
  * ~scan-linear); PQ/IVF-PQ pay a constant driver fit plus a
  * compressed scan (corpus-linear) / cell-gated probe. Run via
  * `sbt "Test/runMain graft.BenchDriftSf1"`; output committed as
  * BENCH_drift_sf1.json.
  */
object BenchDriftSf1 {
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
    graft.functions.GraftFunctions.register(spark)

    val reps = 2
    val results = Seq("/root/testdata/sf0.1" -> "sf0.1", "/tmp/sf1" -> "sf1")
      .map { case (dir, tag) =>
        val runs = (1 to reps).map { _ =>
          val ev = Tables.events(spark, dir, widen = true)
          val docs = Tables.documents(spark, dir, widen = true)
          val emb = Tables.embeddings(spark, dir, widen = true)
          val nEv = ev.count(); val nDocs = docs.count(); val nVecs = emb.count()
          val ref = ev.filter(col("event_id") % 2 === 0)
          val cur = ev.filter(col("event_id") % 2 === 1)
          val (tPsi, _) = timeS {
            Drift.psi(ref, cur, col("value"), nBins = 10).collect()
          }
          val (tKs, _) = timeS {
            Drift.ksStatistic(ref, cur, col("value")).collect()
          }
          val (tJs, _) = timeS {
            Drift.tokenJsDivergence(docs.filter(col("doc_id") % 2 === 0),
              docs.filter(col("doc_id") % 2 === 1), col("text")).collect()
          }
          val (tHh, _) = timeS {
            docs.agg(graft.functions.GraftFunctions.heavyHitters(
              graft.functions.Hashing.h60(col("lang")), 3)).collect()
          }
          val (tCm, _) = timeS {
            ev.agg(graft.functions.GraftFunctions.countMin(
              col("user_id"), 64, 4)).collect()
          }
          val (tBpe, _) = timeS {
            operators.TextOps.bpeTrain(docs, col("text"), rounds = 4).collect()
          }
          val qset = emb.filter(col("vec_id") < 10)
          val (tPq, pqRows) = timeS {
            Similarity.pqTopK(emb, qset, "vec_id", "embedding",
              5, m = 16, ksub = 64, refine = 20).count()
          }
          val (tIvfPq, ivfPqRows) = timeS {
            Similarity.ivfPqTopK(emb, qset, "vec_id", "embedding",
              5, nCells = 16, nProbe = 14, m = 16, ksub = 64, refine = 20).count()
          }
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          (nEv, nDocs, nVecs, tPsi, tKs, tJs, tHh, tCm, tBpe, tPq, pqRows, tIvfPq, ivfPqRows)
        }
        val best = runs.minBy(r => r._4 + r._5 + r._6 + r._7 + r._8 + r._9 + r._10 + r._12)
        val (nEv, nDocs, nVecs, tPsi, tKs, tJs, tHh, tCm, tBpe, tPq, pqRows, tIvfPq, ivfPqRows) = best
        s""""$tag":{"n_events":$nEv,"n_docs":$nDocs,"n_vecs":$nVecs,""" +
          s""""psi_sec":${f3(tPsi)},"ks_sec":${f3(tKs)},"token_js_sec":${f3(tJs)},""" +
          s""""heavy_hitters_sec":${f3(tHh)},"count_min_sec":${f3(tCm)},""" +
          s""""bpe_train4_sec":${f3(tBpe)},""" +
          s""""pq_topk_sec":${f3(tPq)},"pq_rows":$pqRows,""" +
          s""""ivfpq_topk_sec":${f3(tIvfPq)},"ivfpq_rows":$ivfPqRows}"""
      }
    println(s"""{"metric":"drift_scaling","reps_each":$reps,"best_of":"sum_sec",${results.mkString(",")}}""")
    spark.stop()
  }
}
