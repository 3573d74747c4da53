package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Profiling, Relational, Temporal, TextOps}

/** Empty-input sweep: every operator that consumes a table must return
  * an EMPTY result on an empty table, not throw — at 100 TB an empty
  * input is not hypothetical (a partition filter that matches nothing,
  * a day with no events, an empty incremental batch), and the r11
  * advisor found exactly this class latent in globalRowNumber
  * (driver-side offset arithmetic patterns crash on zero partitions
  * where the distributed plan would have been fine). This spec makes
  * the contract systematic instead of per-bug.
  *
  * Operators whose CONTRACT requires data (model fits, quantile
  * cutoffs on empty stats) are exercised in their own specs; this
  * sweep covers the relational/dedup/temporal/text surface whose
  * empty-in → empty-out identity must hold.
  */
class EmptyInputSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val noEvents =
    Seq.empty[(Long, Long, String, java.sql.Timestamp, Double)]
      .toDF("event_id", "user_id", "event_type", "ts", "value")
  private lazy val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  private def empt(tag: String)(df: => DataFrame): Unit =
    assert(df.count() == 0, s"$tag must be empty")

  test("relational operators: empty in, empty out") {
    empt("globalRowNumber")(Relational.globalRowNumber(noEvents,
      Seq(col("value"), col("event_id")), "rn"))
    empt("rankNormalize")(Relational.rankNormalize(noEvents,
      col("value"), Seq(col("event_id"))))
    empt("winsorize")(Relational.winsorize(noEvents, col("event_type"),
      col("value"), 0.05, 0.95))
    empt("imputeByGroupMean")(Relational.imputeByGroupMean(noEvents,
      col("event_type"), col("value"), "f"))
    empt("robustScale")(Relational.robustScale(noEvents, col("event_type"),
      col("value")))
    empt("cumulativeShare")(Relational.cumulativeShare(noEvents,
      col("event_type"), col("value")))
    empt("hashSample")(Relational.hashSample(noEvents, col("event_id"), 0.5))
    empt("targetEncodeLoo")(graft.ml.Featurize.targetEncodeLoo(noEvents,
      col("event_type"), col("value")))
  }

  test("temporal operators: empty in, empty out") {
    empt("growthAccounting")(Temporal.growthAccounting(noEvents,
      col("user_id"), col("ts")))
    empt("stickiness")(Temporal.stickiness(noEvents, col("user_id"), col("ts")))
    empt("periodGrowth")(Temporal.periodGrowth(noEvents, col("event_type"),
      col("ts"), col("value"), "week"))
    empt("conversionLag rows")(Temporal.conversionLag(noEvents, col("user_id"),
      col("event_type"), col("ts"), "view", "purchase")
      .filter(col("n_converted") > 0))
    empt("cusum")(Temporal.cusum(noEvents, col("event_type"), col("ts"),
      col("value")))
    empt("seasonalForecast")(Temporal.seasonalForecast(noEvents,
      col("event_type"), col("ts")))
    empt("rfm")(Temporal.rfm(noEvents, col("user_id"), col("ts"),
      col("value"), lit(true)))
    empt("streaks")(Temporal.streaks(noEvents, col("user_id"), col("ts")))
    empt("funnel steps matched")(Temporal.funnel(noEvents, col("user_id"),
      col("event_type"), col("ts"), Seq("view", "purchase"))
      .filter(col("n_users") > 0))
  }

  test("dedup/text operators: empty in, empty out") {
    empt("exactDedup")(Dedup.exact(noDocs, "text", "doc_id"))
    empt("minhashLshPairs")(Dedup.minhashLshPairs(noDocs, "text", "doc_id", 3, 12, 2))
    empt("simhashNearDupPairs")(Dedup.simhashNearDupPairs(noDocs, "text", "doc_id"))
    empt("ngramJaccardPairs")(Dedup.ngramJaccardPairs(noDocs, "text", "doc_id"))
    empt("prefixJaccardPairs")(Dedup.prefixJaccardPairs(noDocs, "text", "doc_id"))
    empt("sortedNeighborhoodPairs")(Dedup.sortedNeighborhoodPairs(noDocs,
      "doc_id", lower(col("text")), window = 3))
    empt("contaminatedDocs")(Dedup.contaminatedDocs(noDocs,
      Seq((99L, "some eval text here words")).toDF("doc_id", "text"),
      "text", "doc_id"))
    empt("bpePairStats")(TextOps.bpePairStats(noDocs, col("text"), 10))
    empt("dedupSpans")(TextOps.dedupSpans(noDocs, "doc_id", col("text"), n = 8))
    empt("profileTable n>0")(Profiling.profileTable(noDocs, Seq("text"))
      .filter(col("n_rows") > 0))
  }

  test("drift operators: empty side in, empty out") {
    import graft.operators.Drift
    val someEvents = Seq((1L, 2L, "view",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.5))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    // empty reference: no bins to compare against
    empt("psiBins")(Drift.psiBins(noEvents, someEvents, col("value")))
    empt("psi")(Drift.psi(noEvents, someEvents, col("value")))
    // empty either side: divergence/ECDF against zero mass is undefined
    empt("jsDivergence both empty")(Drift.jsDivergence(noEvents, noEvents,
      col("event_type")))
    empt("jsDivergence one empty")(Drift.jsDivergence(someEvents, noEvents,
      col("event_type")))
    empt("ksStatistic both empty")(Drift.ksStatistic(noEvents, noEvents,
      col("value")))
    empt("ksStatistic one empty")(Drift.ksStatistic(noEvents, someEvents,
      col("value")))
    empt("tokenJsDivergence")(Drift.tokenJsDivergence(noDocs, noDocs,
      col("text")))
    // the matrix: empty either side (or both) emits no rows, not a throw
    empt("driftMatrix both empty")(Drift.driftMatrix(noEvents, noEvents,
      Seq("value")))
    empt("driftMatrix empty reference")(Drift.driftMatrix(noEvents,
      someEvents, Seq("value")))
    empt("driftMatrix empty current")(Drift.driftMatrix(someEvents,
      noEvents, Seq("value")))
    // non-empty sides must still emit their row after the guards
    assert(Drift.psi(someEvents, someEvents, col("value")).count() == 1)
    assert(Drift.jsDivergence(someEvents, someEvents, col("event_type"))
      .count() == 1)
    assert(Drift.ksStatistic(someEvents, someEvents, col("value")).count() == 1)
    assert(Drift.driftMatrix(someEvents, someEvents, Seq("value"))
      .count() == 1)
  }
}
