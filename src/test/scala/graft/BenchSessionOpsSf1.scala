package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Association, Dedup, Profiling, Relational, Temporal}
import graft.sources.Tables

/** Round-11 session-3 scaling datapoints, one decade up (sf0.1 →
  * locally-generated /tmp/sf1): the operators whose scale story is
  * worth MEASURING, not just arguing —
  *
  *  - rank_normalize: the globalRowNumber path (range partition +
  *    local index + broadcast offsets) on 1M rows — the op that
  *    replaces a single-task percent_rank;
  *  - sorted_neighborhood: globalRowNumber + banded rank self-join
  *    over 50k docs;
  *  - edit_distance_pairs: deletion-neighborhood blocking fan-out
  *    (~19 variants/row) over 150k customer names;
  *  - triangle_count / kcore: wedge and peel joins on the ~66×-denser
  *    sf1 LSH candidate graph;
  *  - assoc_rules: basket-keyed self-join over 6M lineitems / 150k
  *    orders;
  *  - the per-key window family (resample+ffill, EWMA, rolling
  *    z-score, TWA, streaks, transitions) over 1M events.
  *
  * Run via `sbt "Test/runMain graft.BenchSessionOpsSf1"` (generate
  * /tmp/sf1 first: tools/gen_sf1_{events,documents,tpch}.py). Output
  * committed as BENCH_sessionops_sf1.json.
  */
object BenchSessionOpsSf1 {
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
          val events = Tables.events(spark, dir, widen = true)
          val docs = Tables.documents(spark, dir, widen = true)
          val cust = Tables.table(spark, dir, "customer")
          val li = Tables.table(spark, dir, "lineitem")
          val nEvents = events.count()

          val (tRank, rankRows) = timeS {
            Relational.rankNormalize(
              events.select(col("event_id"), col("value")),
              col("value"), Seq(col("event_id"))).count()
          }
          val (tSn, snPairs) = timeS {
            Dedup.sortedNeighborhoodPairs(
              docs.select(col("doc_id"), col("text")), "doc_id",
              lower(substring(col("text"), 1, 32)), window = 4).count()
          }
          val (tEd, edPairs) = timeS {
            Dedup.editDistancePairs(cust, "c_custkey", col("c_name")).count()
          }
          val (tGraph, graphRows) = timeS {
            val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 12, 2)
              .localCheckpoint(true)
            Dedup.triangleCounts(pairs, "doc_id").count() +
              Dedup.kCoreBounded(pairs, "doc_id", k = 2, rounds = 4).count()
          }
          val (tAssoc, assocRows) = timeS {
            Association.rules(li, col("l_orderkey"), col("l_partkey"),
              minSupport = 3, topK = 50).count()
          }
          val (tWin, winRows) = timeS {
            Temporal.resampleFill(events, col("user_id"), col("ts"),
              col("value"), "day", "interval 1 day").count() +
            Temporal.ewmaTrailing(events, Seq(col("user_id")),
              Seq(col("ts"), col("event_id")), col("value"), 0.3, 12).count() +
            Temporal.rollingZscore(events, Seq(col("user_id")),
              Seq(col("ts"), col("event_id")), col("value"), 10, 3.0).count() +
            Temporal.timeWeightedAvg(events, Seq("user_id"), col("ts"),
              col("value"), Seq(col("event_id"))).count() +
            Temporal.streaks(events, col("user_id"), col("ts")).count() +
            Temporal.transitionMatrix(events, Seq(col("user_id")),
              Seq(col("ts"), col("event_id")), col("event_type")).count()
          }
          val (tProf, profRows) = timeS {
            Profiling.histogram(events, col("value"), 20).count() +
            Profiling.keySkew(events, col("user_id")).count() +
            Profiling.mutualInfo(events, col("event_type"),
              graft.functions.DateTimeKit.weekdayMon0(col("ts")).cast("long")).count() +
            Profiling.entropy(events, col("event_type")).count()
          }
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          (nEvents, tRank, rankRows, tSn, snPairs, tEd, edPairs,
            tGraph, graphRows, tAssoc, assocRows, tWin, winRows, tProf, profRows)
        }
        val best = runs.minBy(r => r._2 + r._4 + r._6 + r._8 + r._10 + r._12 + r._14)
        val (nEvents, tRank, rankRows, tSn, snPairs, tEd, edPairs,
          tGraph, graphRows, tAssoc, assocRows, tWin, winRows, tProf, profRows) = best
        s""""$tag":{"n_events":$nEvents,""" +
          s""""rank_normalize_sec":${f3(tRank)},"rank_rows":$rankRows,""" +
          s""""sorted_neighborhood_sec":${f3(tSn)},"sn_pairs":$snPairs,""" +
          s""""edit_distance_sec":${f3(tEd)},"ed_pairs":$edPairs,""" +
          s""""graph_sec":${f3(tGraph)},"graph_rows":$graphRows,""" +
          s""""assoc_sec":${f3(tAssoc)},"assoc_rows":$assocRows,""" +
          s""""window_family_sec":${f3(tWin)},"window_rows":$winRows,""" +
          s""""profiling_sec":${f3(tProf)},"profiling_rows":$profRows}"""
      }
    println(s"""{"metric":"sessionops_scaling","reps_each":$reps,"best_of":"sum_sec",${results.mkString(",")}}""")
    spark.stop()
  }
}
