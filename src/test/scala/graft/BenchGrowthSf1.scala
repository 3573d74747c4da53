package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Relational, Temporal}
import graft.sources.Tables

/** Round-12 scaling datapoints for the session-3/4 growth-accounting
  * and cleaning families, one decade up (sf0.1 → locally-generated
  * /tmp/sf1, 10× events) — VERDICT r11, Next round #6: these operators
  * had sf0.1 oracles but no sf1 measurement.
  *
  * Families measured (grouped by shared plan shape):
  *  - growth ledger: growthAccounting + stickiness + periodGrowth —
  *    distinct-(user,day) windows + day-keyed aggregates; work tracks
  *    the DISTINCT activity table, not the event table;
  *  - funnel timing: conversionLag — two min-aggregates + one join;
  *  - change detection: cusum — two key-partitioned windows + argmax
  *    join; seasonalForecast — hour-bucket aggregate + per-key OLS +
  *    phase means (M8 capability, new this round);
  *  - customer value: rfm — one user aggregate + 1-row quartile attach;
  *  - cleaning: winsorize + imputeByGroupMean + robustScale +
  *    targetEncodeLoo — grouped stats joined back on the group key (AQE
  *    chooses broadcast; the r12 change removed the unconditional
  *    hints), encode/clip as pure projections.
  *
  * Run via `sbt "Test/runMain graft.BenchGrowthSf1"` (generate /tmp/sf1
  * first: tools/gen_sf1_events.py). Output committed as
  * BENCH_growth_sf1.json.
  */
object BenchGrowthSf1 {
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
          val nEvents = events.count()

          val (tLedger, ledgerRows) = timeS {
            Temporal.growthAccounting(events, col("user_id"), col("ts")).count() +
            Temporal.stickiness(events, col("user_id"), col("ts"), 28).count() +
            Temporal.periodGrowth(events, col("event_type"), col("ts"),
              col("value"), "week").count()
          }
          val (tLag, lagRows) = timeS {
            Temporal.conversionLag(events, col("user_id"), col("event_type"),
              col("ts"), "view", "purchase").count()
          }
          val (tChange, changeRows) = timeS {
            Temporal.cusum(events, col("event_type"), col("ts"), col("value"),
              Seq(col("event_id"))).count() +
            Temporal.seasonalForecast(events, col("event_type"), col("ts"),
              24).count()
          }
          val (tRfm, rfmRows) = timeS {
            Temporal.rfm(events, col("user_id"), col("ts"), col("value"),
              col("event_type") === "purchase").count()
          }
          val (tClean, cleanRows) = timeS {
            Relational.winsorize(events, col("event_type"), col("value"),
              0.05, 0.95).count() +
            Relational.imputeByGroupMean(events, col("event_type"),
              col("value"), "v_filled").count() +
            Relational.robustScale(events, col("event_type"),
              col("value")).count() +
            graft.ml.Featurize.targetEncodeLoo(events, col("event_type"),
              col("value")).count()
          }
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          (nEvents, tLedger, ledgerRows, tLag, lagRows, tChange, changeRows,
            tRfm, rfmRows, tClean, cleanRows)
        }
        val best = runs.minBy(r => r._2 + r._4 + r._6 + r._8 + r._10)
        val (nEvents, tLedger, ledgerRows, tLag, lagRows, tChange, changeRows,
          tRfm, rfmRows, tClean, cleanRows) = best
        s""""$tag":{"n_events":$nEvents,""" +
          s""""growth_ledger_sec":${f3(tLedger)},"ledger_rows":$ledgerRows,""" +
          s""""conversion_lag_sec":${f3(tLag)},"lag_rows":$lagRows,""" +
          s""""change_detect_sec":${f3(tChange)},"change_rows":$changeRows,""" +
          s""""rfm_sec":${f3(tRfm)},"rfm_rows":$rfmRows,""" +
          s""""cleaning_sec":${f3(tClean)},"cleaning_rows":$cleanRows}"""
      }
    println(s"""{"metric":"growth_scaling","reps_each":$reps,"best_of":"sum_sec",${results.mkString(",")}}""")
    spark.stop()
  }
}
