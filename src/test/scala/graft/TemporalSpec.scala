package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

/** Golden semantics for the temporal operators (as-of join, bounded
  * interval self-join, sessionization, per-group top-k) on tiny inline
  * fixtures where every expected row is hand-checkable.
  */
class TemporalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin picks latest right row at-or-before, inclusive at equality") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:00:00")),
      (3L, "u1", ts("2024-01-01 09:00:00")), // before any right row
      (4L, "u2", ts("2024-01-01 10:00:00")) // key with no right rows
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 10.0, 100L), // equal ts to left id=1
      ("u1", ts("2024-01-01 11:00:00"), 11.0, 101L)
    ).toDF("k", "t", "px", "rid")
    val got = Temporal.asofJoin(left, right, Seq("k"), "t", "t",
        Seq("px"), tieBreak = Some("rid"))
      .orderBy("id").select("id", "px").collect()
    assert(got(0).getDouble(1) == 10.0) // inclusive: right@10:00 visible at left@10:00
    assert(got(1).getDouble(1) == 11.0) // latest of the two
    assert(got(2).isNullAt(1)) // nothing at-or-before 09:00
    assert(got(3).isNullAt(1)) // left-outer: key with no right side
  }

  test("asofJoin tie at identical (key, ts): largest tieBreak wins") {
    val left = Seq((1L, "u", ts("2024-01-01 12:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      ("u", ts("2024-01-01 11:00:00"), 1.0, 7L),
      ("u", ts("2024-01-01 11:00:00"), 2.0, 9L),
      ("u", ts("2024-01-01 11:00:00"), 3.0, 8L)
    ).toDF("k", "t", "px", "rid")
    val got = Temporal.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("px"), tieBreak = Some("rid")).select("px").head()
    assert(got.getDouble(0) == 2.0) // rid=9 is the largest tie-break
  }

  test("pairsWithin finds exactly the strictly-after within-gap pairs, across bucket edges") {
    // gap = 60s. Pairs: (1,2) 30s apart within one bucket, (2,3) 59s apart
    // crossing a bucket boundary, (3,4) exactly 60s (kept: <=), (4,5) 61s
    // apart (dropped), different-key pair (1,6) dropped.
    val df = Seq(
      (1L, "a", ts("2024-01-01 00:00:00")),
      (2L, "a", ts("2024-01-01 00:00:30")),
      (3L, "a", ts("2024-01-01 00:01:29")),
      (4L, "a", ts("2024-01-01 00:02:29")),
      (5L, "a", ts("2024-01-01 00:03:30")),
      (6L, "b", ts("2024-01-01 00:00:10"))
    ).toDF("id", "k", "t")
    val got = Temporal.pairsWithin(df, Seq("k"), "t", "id", 60000000L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 3L), (3L, 4L)))
  }

  test("pairsWithin emits each pair exactly once (no bucket double-count)") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 00:00:59")),
      (2L, "a", ts("2024-01-01 00:01:01")) // same-bucket AND adjacent-bucket candidate
    ).toDF("id", "k", "t")
    val got = Temporal.pairsWithin(df, Seq("k"), "t", "id", 60000000L).collect()
    assert(got.length == 1)
  }

  test("sessionize merges at exactly-gap, splits only strictly beyond it") {
    val df = Seq(
      ("u", ts("2024-01-01 10:00:00"), 1.0),
      ("u", ts("2024-01-01 10:20:00"), 2.0), // 20 min: same session
      ("u", ts("2024-01-01 10:50:00"), 4.0), // exactly 30 min: still SAME session
      ("u", ts("2024-01-01 11:20:01"), 16.0), // 30 min 1 s: new session
      ("v", ts("2024-01-01 10:05:00"), 8.0)
    ).toDF("k", "t", "v")
    val got = Temporal.sessionize(df, col("k"), col("t"), "30 minutes",
        Seq(sum($"v").as("sv")))
      .orderBy("k", "session_start")
      .select("k", "n_events", "sv").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("u", 3L, 7.0), ("u", 1L, 16.0), ("v", 1L, 8.0)))
  }

  test("topKPerGroup keeps k rows per group with deterministic ranks") {
    val df = Seq(
      ("g1", 1L, 5.0), ("g1", 2L, 9.0), ("g1", 3L, 9.0), ("g1", 4L, 1.0),
      ("g2", 5L, 2.0)
    ).toDF("g", "id", "v")
    val got = Temporal.topKPerGroup(df, Seq(col("g")),
        Seq(col("v").desc, col("id")), 2)
      .orderBy("g", "rank").select("g", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    // tie at v=9.0 broken by id asc: id=2 then id=3
    assert(got == Seq(("g1", 2L, 1), ("g1", 3L, 2), ("g2", 5L, 1)))
  }

  test("funnel: earliest-first strict ordering; out-of-order and same-instant events excluded") {
    val events = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L), // full path
      (2L, "click", 1L), (2L, "view", 2L), (2L, "click", 3L),    // pre-view click ignored
      (3L, "view", 1L), (3L, "purchase", 2L),                    // skips click → stops at view
      (4L, "purchase", 1L), (4L, "click", 2L),                   // never views
      (5L, "view", 5L), (5L, "click", 5L))                       // same instant: strict > excludes
      .toDF("user_id", "event_type", "t")
    val got = Temporal.funnel(events, col("user_id"), col("event_type"),
        col("t"), Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, "view", 4L), (1L, "click", 2L), (2L, "purchase", 1L)))
  }

  test("funnel maxGap: late conversions fall out; the frontier stays the earliest in-window event") {
    val events = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 05:00:00")),   // within 12h → converts
      (2L, "view", ts("2024-01-01 00:00:00")),
      (2L, "click", ts("2024-01-02 00:00:00")),   // 24h later → out of window
      (3L, "view", ts("2024-01-01 00:00:00")),
      (3L, "click", ts("2024-01-01 12:00:00")))   // exactly 12h → inclusive
      .toDF("user_id", "event_type", "at")
    val got = Temporal.funnel(events, col("user_id"), col("event_type"),
        col("at"), Seq("view", "click"), maxGap = Some("12 HOURS"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("view", 3L), ("click", 2L)))
    // no gap → the original funnel semantics are untouched
    val open = Temporal.funnel(events, col("user_id"), col("event_type"),
        col("at"), Seq("view", "click"))
      .collect().map(r => r.getLong(2)).toSeq
    assert(open == Seq(3L, 3L))
  }

  test("scd2: runs collapse, re-appearing value reopens, intervals tile each key's timeline") {
    val obs = Seq(
      (1L, "gold",   ts("2024-01-01 00:00:00"), 1L),
      (1L, "gold",   ts("2024-01-02 00:00:00"), 2L), // same run — collapsed
      (1L, "silver", ts("2024-01-03 00:00:00"), 3L),
      (1L, "gold",   ts("2024-01-05 00:00:00"), 4L), // gold AGAIN → new interval (type 2)
      (2L, "bronze", ts("2024-01-04 00:00:00"), 5L))
      .toDF("k", "tier", "at", "obs_id")
    val got = Temporal.scd2(obs, Seq(col("k")), Seq(col("at"), col("obs_id")), col("tier"))
      .select("k", "tier", "valid_from", "valid_to", "is_current")
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4))).toSeq
    assert(got == Seq(
      (1L, "gold",   ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, "silver", ts("2024-01-03 00:00:00"), Some(ts("2024-01-05 00:00:00")), false),
      (1L, "gold",   ts("2024-01-05 00:00:00"), None, true),
      (2L, "bronze", ts("2024-01-04 00:00:00"), None, true)))
    // tiling: within a key, every valid_to equals the next valid_from,
    // and exactly one open interval exists
    got.groupBy(_._1).foreach { case (_, rows) =>
      rows.sliding(2).foreach {
        case Seq(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
      assert(rows.count(_._5) == 1)
    }
  }

  test("cohortRetention: cohort = Monday week of first event; offsets count distinct actives") {
    // 2024-01-01 is a Monday
    val events = Seq(
      (1L, ts("2024-01-03 10:00:00")), // u1 cohort 2024-01-01
      (1L, ts("2024-01-04 11:00:00")), // same week — one distinct active
      (1L, ts("2024-01-16 09:00:00")), // +2 weeks
      (2L, ts("2024-01-10 08:00:00")), // u2 cohort 2024-01-08
      (2L, ts("2024-01-15 20:00:00"))) // +1 week
      .toDF("user_id", "ts")
    val got = Temporal.cohortRetention(events, col("user_id"), col("ts"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("resampleFill: complete per-key grid, forward fill across multi-bucket gaps, gap flags") {
    val events = Seq(
      ("a", ts("2024-01-01 00:10:00"), 10.0),
      ("a", ts("2024-01-01 00:50:00"), 20.0), // same hour → avg 15.0
      ("a", ts("2024-01-01 03:30:00"), 30.0), // hours 1 and 2 are gaps
      ("b", ts("2024-01-01 05:00:00"), 7.0))  // single-bucket key
      .toDF("k", "at", "v")
    val got = Temporal.resampleFill(events, col("k"), col("at"), col("v"),
        "hour", "interval 1 hour")
      .orderBy("key", "bucket")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getBoolean(3))).toSeq
    assert(got == Seq(
      ("a", "2024-01-01 00:00:00.0", 15.0, false),
      ("a", "2024-01-01 01:00:00.0", 15.0, true),  // carried forward
      ("a", "2024-01-01 02:00:00.0", 15.0, true),  // still carried
      ("a", "2024-01-01 03:00:00.0", 30.0, false),
      ("b", "2024-01-01 05:00:00.0", 7.0, false))) // grid never crosses keys
  }

  test("ewmaTrailing: hand-computed weights, prefix renormalization, k-truncation") {
    val df = Seq((1L, "u", 1L, 10.0), (2L, "u", 2L, 20.0), (3L, "u", 3L, 30.0))
      .toDF("id", "k", "t", "x")
    val got = Temporal.ewmaTrailing(df, Seq(col("k")), Seq(col("t")),
        col("x"), alpha = 0.5, k = 2)
      .orderBy("id").select("ewma").collect().map(_.getDouble(0)).toSeq
    // row 1: only itself → 10; row 2: (20 + 0.5·10)/1.5; row 3 (k=2
    // truncates row 1 away): (30 + 0.5·20)/1.5
    assert(got(0) == 10.0)
    assert(math.abs(got(1) - 25.0 / 1.5) < 1e-12)
    assert(math.abs(got(2) - 40.0 / 1.5) < 1e-12)
  }

  test("rollingZscore: exclusive frame, null sigma until 2 priors, spike flagged") {
    val df = Seq(
      (1L, "u", 10.0), (2L, "u", 10.0), (3L, "u", 12.0), (4L, "u", 8.0),
      (5L, "u", 1000.0), // spike vs baseline of {10,10,12,8}
      (6L, "u", 10.0))   // NOT flagged: its baseline now contains the spike
      .toDF("id", "k", "x")
    val got = Temporal.rollingZscore(df, Seq(col("k")), Seq(col("id")),
        col("x"), k = 10, thresh = 3.0)
      .orderBy("id").collect()
    assert(got(0).isNullAt(got(0).fieldIndex("mu")))     // empty frame
    assert(got(1).isNullAt(got(1).fieldIndex("sigma")))  // 1 prior row
    assert(!got(1).getBoolean(got(1).fieldIndex("is_anomaly")))
    assert(got(4).getBoolean(got(4).fieldIndex("is_anomaly")))
    assert(!got(5).getBoolean(got(5).fieldIndex("is_anomaly")))
    // frame excludes self: row 5's mu is the clean baseline mean 10.0
    assert(got(4).getDouble(got(4).fieldIndex("mu")) == 10.0)
  }

  test("growthAccounting: ledger identity holds; churn lands on the first missing day; right-censored at the last observed day") {
    val df = Seq(
      (1L, ts("2024-01-01 09:00:00")), // u1 new on 1st
      (1L, ts("2024-01-02 09:00:00")), // retained on 2nd
      (1L, ts("2024-01-04 09:00:00")), // gap → resurrected on 4th, churn on 3rd
      (2L, ts("2024-01-02 09:00:00")), // u2 new on 2nd
      (2L, ts("2024-01-02 23:00:00"))) // same day — dedup
      .toDF("user_id", "at")
    val got = Temporal.growthAccounting(df, col("user_id"), col("at"))
      .orderBy("day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("2024-01-01", 1L, 1L, 0L, 0L, 0L),
      ("2024-01-02", 2L, 1L, 1L, 0L, 0L),
      ("2024-01-03", 0L, 0L, 0L, 0L, 2L), // u1 gap-churn + u2 last-day churn
      ("2024-01-04", 1L, 0L, 0L, 1L, 0L)))
    // NO "2024-01-05" row: u1 is active on the final observed day, and
    // whether they churn after it is right-censored — the ledger must
    // not report unknowable churn beyond the observation window
    // ledger identity: dau = new + retained + resurrected on every row
    got.foreach { case (_, dau, nw, ret, res, _) => assert(dau == nw + ret + res) }
  }

  test("stickiness: trailing-window distinct users, synthetic days dropped, exact ratio") {
    val df = Seq(
      (1L, ts("2024-01-01 09:00:00")),
      (2L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 09:00:00")), // u1 both days; u2 only the 1st
      (1L, ts("2024-01-02 23:00:00")), // same day — dedup
      (3L, ts("2024-01-05 09:00:00"))) // beyond u2's 3-day window on the 5th
      .toDF("user_id", "at")
    val got = Temporal.stickiness(df, col("user_id"), col("at"), windowDays = 3)
      .orderBy("day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      ("2024-01-01", 2L, 2L, 1.0),      // window [12-30..01-01]: u1,u2
      ("2024-01-02", 1L, 2L, 0.5),      // window [12-31..01-02]: u1,u2
      ("2024-01-05", 1L, 1L, 1.0)))     // u1/u2 aged out; only u3
    // no rows for inactive days 01-03/01-04 despite the explode fan-out
    assert(!got.exists(r => r._1 == "2024-01-03" || r._1 == "2024-01-04"))
  }

  test("seasonalForecast: exact continuation of a pure linear trend (zero residuals)") {
    // counts 1,2,3,4 in four consecutive hours: y = t exactly, so the
    // per-key OLS is slope 1, all residuals are exactly 0 (every term
    // is an exactly-representable double), and the 24-hour forecast is
    // the continued line 5,6,...,28
    val rows = for {
      h <- 0 to 3
      i <- 0 until (h + 1)
    } yield (i.toLong, ts(f"2024-01-01 0$h%d:15:00"))
    val df = rows.toDF("user_id", "at")
    val got = Temporal.seasonalForecast(df, lit("a"), col("at"), horizonHours = 24)
      .orderBy("forecast_hour").collect()
    assert(got.length == 24)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(r.fieldIndex("yhat")) == 5.0 + i, s"row $i")
    }
    assert(got.head.getTimestamp(got.head.fieldIndex("forecast_hour")).toString
      .startsWith("2024-01-01 04:00:00"))
  }

  test("seasonalForecast: degenerate single-bucket key gets slope 0 / mean intercept") {
    val df = Seq((1L, ts("2024-01-01 09:05:00")), (2L, ts("2024-01-01 09:45:00")),
      (3L, ts("2024-01-01 09:55:00"))).toDF("user_id", "at")
    val got = Temporal.seasonalForecast(df, lit("k"), col("at"), horizonHours = 6)
      .orderBy("forecast_hour").collect()
    assert(got.length == 6)
    // var(t) = 0 → slope coalesced to 0, intercept = mean(y) = 3; the
    // future hours have no observed hod/wd seasonal rows → 0
    got.foreach(r => assert(r.getDouble(r.fieldIndex("yhat")) == 3.0))
  }

  test("seasonalForecast multiplicative: beats additive on amplitude-growing series (VERDICT r17 #6)") {
    // Fixture built FROM the multiplicative generating process the mode
    // claims to capture: hourly count = round(10·e^{0.012t}·m(hod)) with
    // m a ±60% hour-of-day swing — the seasonal amplitude grows with the
    // level (2.6× over the week), the reference's
    // seasonality_mode='multiplicative' premise
    // (NYC_Traffic_Congestion.py:84). The additive fit averages the
    // swing over the whole history, so at the horizon (where the level
    // is highest) it under-predicts peaks and over-predicts troughs.
    // COSINE phase, deliberately: the sequential trend-then-seasonal
    // decomposition leaves the within-day covariance between the hour
    // ramp and the seasonal pattern in the slope, and cos(2πh/24) is
    // ~orthogonal to the h ramp where sin is maximally correlated —
    // the same phase sensitivity any detrend-then-average forecaster
    // (STL, classical decomposition) carries. 7 full days so every
    // weekday phase the horizon needs is observed.
    def m(hod: Int): Double = 1.0 + 0.6 * math.cos(2 * math.Pi * hod / 24.0)
    def level(t: Int): Double = 10.0 * math.exp(0.012 * t)
    def yTrue(t: Int): Double = level(t) * m(t % 24)
    val nTrain = 7 * 24
    val rows = for {
      t <- 0 until nTrain
      i <- 0 until math.max(1, math.rint(yTrue(t)).toInt)
    } yield (i.toLong, new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:30:00").getTime + t * 3600_000L))
    val df = rows.toDF("user_id", "at")
    def mae(multiplicative: Boolean): Double = {
      val fc = Temporal.seasonalForecast(df, lit("k"), col("at"),
          horizonHours = 24, multiplicative = multiplicative)
        .orderBy("forecast_hour").collect()
      assert(fc.length == 24)
      fc.zipWithIndex.map { case (r, i) =>
        val yh = r.getDouble(r.fieldIndex("yhat"))
        if (multiplicative) assert(yh > 0.0, s"multiplicative yhat not positive at $i")
        math.abs(yh - yTrue(nTrain + i))
      }.sum / 24
    }
    val (maeMult, maeAdd) = (mae(true), mae(false))
    // additive reads ~23 MAE here (the averaged swing is badly scaled at
    // the horizon level of ~75-120); multiplicative reads ~1.5 — count
    // rounding noise. Assert the decisive gap, with slack on both.
    assert(maeMult < maeAdd / 5,
      s"multiplicative MAE $maeMult should beat additive $maeAdd decisively on a level-scaled swing")
    assert(maeMult < 3.0, s"multiplicative MAE $maeMult too large for an exact-model fixture")
  }

  test("periodGrowth: per-key lag, first period null, exact pct change") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 10.0), // week of 2024-01-01
      ("a", ts("2024-01-08 00:00:00"), 15.0), // next week: +50%
      ("b", ts("2024-01-08 00:00:00"), 7.0))
      .toDF("k", "at", "v")
    val got = Temporal.periodGrowth(df, col("k"), col("at"), col("v"), "week")
      .orderBy("key", "period").collect()
    assert(got(0).isNullAt(got(0).fieldIndex("prev_total")))
    assert(got(1).getDouble(got(1).fieldIndex("pct_change")) == 0.5)
    assert(got(2).isNullAt(got(2).fieldIndex("prev_total"))) // b's first week
  }

  test("conversionLag: earliest-first pairs only; pre-stage events never convert") {
    val df = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 00:01:40")),  // 100 s
      (2L, "click", ts("2024-01-01 00:00:00")),  // click BEFORE any view
      (2L, "view", ts("2024-01-01 01:00:00")),
      (3L, "view", ts("2024-01-01 00:00:00")),
      (3L, "click", ts("2024-01-01 00:05:00")))  // 300 s
      .toDF("user_id", "event_type", "at")
    val r = Temporal.conversionLag(df, col("user_id"), col("event_type"),
      col("at"), "view", "click").head()
    assert(r.getLong(0) == 2) // u2's pre-view click doesn't count
    assert(r.getDouble(1) == 200.0) // median of {100, 300}
  }

  test("cusum: peak lands at the level shift; earliest argmax wins ties") {
    // key u: 4 obs at 10 then 4 at 20 → mean 15; cusum after each row:
    // -5,-10,-15,-20,-15,-10,-5,0 → max |cusum| = 20 at the 4th row
    // (the last pre-shift observation).
    val df = (1 to 8).map(i =>
      ("u", ts(f"2024-01-0$i 00:00:00"), if (i <= 4) 10.0 else 20.0, i.toLong))
      .toDF("k", "at", "x", "id")
    val r = Temporal.cusum(df, col("k"), col("at"), col("x"),
      Seq(col("id"))).head()
    assert(r.getString(0) == "u")
    assert(r.getDouble(1) == 20.0)
    assert(r.getTimestamp(2) == ts("2024-01-04 00:00:00"))
  }

  test("rfm: anchor-relative recency, population quartile buckets, tie falls low") {
    val df = Seq(
      // u1: 1 purchase long ago, small spend
      (1L, ts("2024-01-01 00:00:00"), 5.0, "purchase"),
      // u2: 4 purchases, recent, big spend
      (2L, ts("2024-01-02 00:00:00"), 50.0, "purchase"),
      (2L, ts("2024-01-10 00:00:00"), 50.0, "purchase"),
      (2L, ts("2024-01-20 00:00:00"), 50.0, "purchase"),
      (2L, ts("2024-01-30 00:00:00"), 50.0, "purchase"),
      // u3: non-purchase events must not qualify
      (3L, ts("2024-01-29 00:00:00"), 999.0, "view"))
      .toDF("user_id", "at", "v", "et")
    val got = Temporal.rfm(df, col("user_id"), col("at"), col("v"),
        col("et") === "purchase")
      .orderBy("user").collect()
    assert(got.length == 2) // u3 never purchased
    val u1 = got(0); val u2 = got(1)
    assert(u1.getLong(1) == 29 && u2.getLong(1) == 0) // anchor = u2's last
    assert(u1.getLong(2) == 1 && u2.getLong(2) == 4)
    assert(u1.getDouble(3) == 5.0 && u2.getDouble(3) == 200.0)
    // two-user population: u2 tops every dimension's upper bucket
    assert(u2.getLong(5) == 4 && u2.getLong(6) == 4) // f, m buckets
    assert(u1.getLong(4) == 4) // u1's recency is the worst (highest days)
  }

  test("timeWeightedAvg: interval weights, last row weightless, beats the plain mean on oversampling") {
    // key u: value 10 held 1s, then 100 held 3s, then 50 (last, no
    // weight) → twa = (10·1e6 + 100·3e6) / 4e6 = 77.5; the plain mean
    // (53.3) would be dragged by neither duration.
    val df = Seq(
      ("u", ts("2024-01-01 00:00:00"), 10.0, 1L),
      ("u", ts("2024-01-01 00:00:01"), 100.0, 2L),
      ("u", ts("2024-01-01 00:00:04"), 50.0, 3L),
      ("v", ts("2024-01-01 00:00:00"), 7.0, 4L)) // single obs: no interval
      .toDF("k", "at", "x", "id")
    val got = Temporal.timeWeightedAvg(df, Seq("k"), col("at"), col("x"),
        Seq(col("id")))
      .orderBy("k").collect()
    assert(got(0).getDouble(1) == 77.5)
    assert(got(0).getLong(2) == 4000000L && got(0).getLong(3) == 3L)
    assert(got(1).isNullAt(1)) // no covered time → null twa (0/0 guard)
    assert(got(1).getLong(2) == 0L && got(1).getLong(3) == 1L)
  }

  test("streaks: islands split on gaps, duplicate same-day events collapse, singletons count") {
    val df = Seq(
      // u: days 1,2,3 (streak 3; day 2 twice), gap, 5,6 (streak 2)
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-02 23:00:00")), (1L, ts("2024-01-03 01:00:00")),
      (1L, ts("2024-01-05 12:00:00")), (1L, ts("2024-01-06 12:00:00")),
      // v: one isolated day
      (2L, ts("2024-02-01 00:00:00")))
      .toDF("user_id", "at")
    val got = Temporal.streaks(df, col("user_id"), col("at"))
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 5L, 2L, 3L), (2L, 1L, 1L, 1L)))
  }

  test("transitionMatrix: adjacent pairs per key, row-normalized probabilities") {
    val df = Seq(
      (1L, "u", "a"), (2L, "u", "b"), (3L, "u", "a"), (4L, "u", "c"),
      (5L, "v", "a"), (6L, "v", "b"))
      .toDF("id", "k", "s")
    val got = Temporal.transitionMatrix(df, Seq(col("k")), Seq(col("id")),
        col("s"))
      .orderBy("from_state", "to_state")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // pairs: u: a→b, b→a, a→c; v: a→b  ⇒ from a: b=2/3, c=1/3; from b: a=1/1
    assert(got == Seq(
      ("a", "b", 2L, 2.0 / 3.0), ("a", "c", 1L, 1.0 / 3.0),
      ("b", "a", 1L, 1.0)))
    // no cross-key pair (4,"c")→(5,"a") ever forms
    assert(!got.exists(p => p._1 == "c"))
  }
}
