package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Temporal}
import graft.sources.Tables

/** Round-11 scaling datapoints for the session's graph/analytics
  * operators at one decade up: PageRank on the LSH near-dup graph over
  * the locally-generated sf1 documents (50k docs, ~66× more candidate
  * pairs than sf0.1 — the iterative join+sum path under a much denser
  * graph), and the funnel / cohort-retention / SCD2 event analytics
  * over sf1 events (1M rows, 10× users). Run via
  * `sbt "Test/runMain graft.BenchAnalyticsSf1"`; output committed as
  * BENCH_analytics_sf1.json.
  */
object BenchAnalyticsSf1 {
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
          val events = Tables.events(spark, dir, widen = true)
          val nDocs = docs.count()
          val nEvents = events.count()
          val (tPr, prRows) = timeS {
            val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 12, 2)
            Dedup.pageRank(docs, pairs, "doc_id", iters = 4).count()
          }
          val (tFunnel, funnelReached) = timeS {
            Temporal.funnel(events, col("user_id"), col("event_type"),
                col("ts"), Seq("view", "click", "purchase"))
              .collect().map(_.getLong(2)).sum
          }
          val (tCohort, cohortCells) = timeS {
            Temporal.cohortRetention(events, col("user_id"), col("ts")).count()
          }
          val (tScd2, scd2Rows) = timeS {
            Temporal.scd2(events, Seq(col("user_id")),
                Seq(col("ts"), col("event_id")), col("event_type"))
              .count()
          }
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          (nDocs, nEvents, tPr, prRows, tFunnel, funnelReached,
            tCohort, cohortCells, tScd2, scd2Rows)
        }
        val best = runs.minBy(r => r._3 + r._5 + r._7 + r._9)
        val (nDocs, nEvents, tPr, prRows, tFunnel, funnelReached,
          tCohort, cohortCells, tScd2, scd2Rows) = best
        s""""$tag":{"n_docs":$nDocs,"n_events":$nEvents,""" +
          s""""pagerank_sec":${f3(tPr)},"pagerank_rows":$prRows,""" +
          s""""funnel_sec":${f3(tFunnel)},"funnel_reached_sum":$funnelReached,""" +
          s""""cohort_sec":${f3(tCohort)},"cohort_cells":$cohortCells,""" +
          s""""scd2_sec":${f3(tScd2)},"scd2_rows":$scd2Rows}"""
      }
    println(s"""{"metric":"analytics_scaling","reps_each":$reps,"best_of":"sum_sec",${results.mkString(",")}}""")
    spark.stop()
  }
}
