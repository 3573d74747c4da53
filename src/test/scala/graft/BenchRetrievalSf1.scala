package graft

import org.apache.spark.sql.SparkSession

/** Round-17 scaling datapoints for the retrieval lane at one decade up
  * (sf0.1 → locally generated sf1, tools/gen_sf1_*.py): hybrid RRF
  * fusion (BM25 top-50 + cosine top-50 → rrfFuse) and ranked-retrieval
  * eval metrics (exact top-10 vs label-match qrels). Both are expected
  * ~linear in the corpus: the BM25 side is two map passes + a 1-row
  * aggregate, the cosine side one broadcast pass + a query-keyed
  * window, and the fusion/metric joins are bounded by list depth and
  * eval-set size, not the corpus. Run via
  * `sbt "Test/runMain graft.BenchRetrievalSf1"`; output committed as
  * BENCH_retrieval_sf1.json.
  */
object BenchRetrievalSf1 {
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

    val reps = 3
    val hybrid = Queries.queries("q_hybrid_rrf")
    val retrieval = Queries.queries("q_retrieval_metrics")
    val results = Seq("/root/testdata/sf0.1" -> "sf0.1", "/tmp/sf1" -> "sf1")
      .map { case (dir, tag) =>
        val runs = (1 to reps).map { _ =>
          val nDocs = graft.sources.Tables.documents(spark, dir).count()
          val (tHybrid, hybridRows) = timeS(hybrid(spark, dir).count())
          val (tMetrics, metricRows) = timeS(retrieval(spark, dir).count())
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          (nDocs, tHybrid, hybridRows, tMetrics, metricRows)
        }
        val best = runs.minBy(r => r._2 + r._4)
        val (nDocs, tHybrid, hybridRows, tMetrics, metricRows) = best
        s""""$tag":{"n_docs":$nDocs,"hybrid_rrf_sec":${f3(tHybrid)},""" +
          s""""hybrid_rows":$hybridRows,"retrieval_metrics_sec":${f3(tMetrics)},""" +
          s""""metric_rows":$metricRows}"""
      }
    println(s"""{"metric":"retrieval_scaling","reps_each":$reps,"best_of":"sum_sec",${results.mkString(",")}}""")
    spark.stop()
  }
}
