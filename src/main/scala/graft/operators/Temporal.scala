package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal relational operators: as-of (point-in-time) join, bounded
  * interval self-join, sessionization, per-group top-k.
  *
  * None of these exist in the reference (its only temporal join is the
  * exact point lookup, backend/NYC_Traffic_Congestion.py:110), but every
  * feature-store / event-pipeline user of such an engine needs them, and
  * all four have a shuffle-minimal Spark-first shape:
  *
  *  - as-of join: NOT a theta-join (which Spark plans as a broadcast
  *    nested loop or an exploding sort-merge) but a union + one window —
  *    a single hash shuffle on the key, linear scan per partition.
  *  - interval self-join: NOT `a.ts < b.ts <= a.ts + g` (quadratic per
  *    key) but an equi-join on (key, time-bucket) with the left side
  *    duplicated into two adjacent buckets — the standard banded join;
  *    candidate fan-out is bounded by events-per-2g-window.
  *  - sessionization: Spark's native `session_window` aggregate (merging
  *    windows inside one hash aggregate — no self-join, no iteration).
  *  - top-k per group: `row_number` window; parallelism = group count,
  *    fine for k-small analytics (for huge k·groups use the BottomK
  *    sketch, functions/BottomK.scala).
  */
object Temporal {

  /** As-of join: for each left row, attach `payload` columns from the
    * LATEST right row with the same `keys` and `rightTs <= leftTs`
    * (inclusive — a right row at exactly the left timestamp is visible).
    * Left rows with no preceding right row keep null payloads (left-outer
    * semantics).
    *
    * Implementation: tag right rows side=0 and left rows side=1, union,
    * then `last(payload, ignoreNulls)` over a window ordered by
    * (ts, side, tieBreak) within each key — right rows sort before left
    * rows at equal ts, so the running "last seen payload" at a left row
    * is exactly the as-of match. ONE shuffle on `keys`, no join fan-out,
    * no range predicate for the planner to mishandle; at 100 TB both
    * sides co-partition on the key and the window is a linear merge.
    *
    * `tieBreak` (a right-side column) makes the choice among right rows
    * that share (keys, ts) deterministic: the one with the LARGEST
    * tieBreak value wins.
    *
    * `payload` names must not collide with left columns; left columns
    * pass through unchanged.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: Option[String] = None): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    require(payload.forall(right.columns.contains), "payload must be right columns")
    require(!payload.exists(left.columns.contains),
      s"payload ${payload.mkString(",")} collides with left columns")
    val tbCols = tieBreak.toSeq
    val r = right.select((keys.map(col) :+ col(rightTs).as("__ts")) ++
        (payload ++ tbCols).map(col): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val ord = Seq(col("__ts"), col("__side")) ++
      tbCols.map(c => coalesce(col(c), lit(Long.MinValue)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      (d, p) => d.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .drop("__ts", "__side").drop(tbCols: _*)
  }

  /** Bounded interval self-join: all ordered pairs of rows sharing
    * `keys` with `0 < ts_b - ts_a <= gap` (strictly-after, within-gap).
    * Returns the key columns plus `<idCol>_a`, `<idCol>_b`, and `gap_us`
    * (microseconds between the two rows).
    *
    * Banded-join shape: rows join on (keys, time-bucket) where the
    * bucket is `floor(us / gap)`; the a-side is emitted into its own
    * bucket AND the next one, so every qualifying pair meets in exactly
    * one bucket (b's) and the inequality is a cheap post-filter. The
    * shuffle key is fully partitionable and the per-task candidate set
    * is bounded by the rows in two gap-widths — no quadratic-per-key
    * blowup, no BroadcastNestedLoopJoin.
    */
  def pairsWithin(df: DataFrame, keys: Seq[String], tsCol: String,
      idCol: String, gapMicros: Long): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    val base = df.select((keys.map(col) :+
      unix_micros(col(tsCol)).as("__us") :+ col(idCol)): _*)
    val bkt = expr(s"__us div ${gapMicros}L")
    val a = base.withColumn("__bkt", explode(array(bkt, bkt + lit(1L))))
      .withColumnRenamed("__us", "__us_a").withColumnRenamed(idCol, s"${idCol}_a")
    val b = base.withColumn("__bkt", bkt)
      .withColumnRenamed("__us", "__us_b").withColumnRenamed(idCol, s"${idCol}_b")
    a.join(b, keys :+ "__bkt")
      .filter(col("__us_b") > col("__us_a") &&
        col("__us_b") - col("__us_a") <= gapMicros)
      .select(keys.map(col) ++ Seq(col(s"${idCol}_a"), col(s"${idCol}_b"),
        (col("__us_b") - col("__us_a")).as("gap_us")): _*)
  }

  /** Sessionization: group events into per-key sessions separated by
    * inactivity of at least `gap` (e.g. "30 minutes"), returning one row
    * per session with its start, event count, and the aggregates in
    * `aggs`. An event exactly `gap` after its predecessor joins the SAME
    * session (Spark session windows merge while `next ts <= last + gap`;
    * only a strictly larger gap starts a new session — pinned in
    * TemporalSpec).
    *
    * Uses Spark's native `session_window` aggregate: window merging
    * happens inside one hash aggregate — one shuffle on the key, no
    * self-join, no gaps-and-islands double window. The same call works
    * unchanged in Structured Streaming (with a watermark) — the batch
    * and streaming session semantics are the same operator.
    */
  def sessionize(df: DataFrame, keyCol: Column, tsCol: Column, gap: String,
      aggs: Seq[Column]): DataFrame = {
    val allAggs = count(lit(1)).as("n_events") +: aggs
    df.groupBy(session_window(tsCol, gap).as("__sw"), keyCol)
      .agg(allAggs.head, allAggs.tail: _*)
      .withColumn("session_start", col("__sw.start"))
      .drop("__sw")
  }

  /** Top-k rows per group under `order` (first column set wins; include
    * a unique tie-break column to make results deterministic). Adds a
    * `rank` column (1-based). Window `row_number` — one shuffle on the
    * group key; for very large k or millions of groups prefer the
    * BottomK TypedImperativeAggregate which never materializes the
    * per-group sort.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Ordered funnel: how many users performed `stages` in order —
    * stage i+1 counts only events STRICTLY after the user's earliest
    * qualifying stage-i event (the classic earliest-first funnel
    * definition; each user counts once per stage reached).
    *
    * Output: (stage_idx, stage, n_users) — one row per stage,
    * monotonically non-increasing counts.
    *
    * Scale shape: stage i is a type-filtered scan (predicate pushed to
    * the source) aggregated by user and equi-joined to the stage-(i−1)
    * frontier — every join and aggregate keys on the user, so a
    * pre-partitioned/bucketed events table pays ONE partitioning for
    * the whole chain. The frontier shrinks monotonically; no window,
    * no self-join, no per-user event-list materialization (the
    * collect_list-then-UDF shape this replaces blows memory on power
    * users at corpus scale).
    */
  def funnel(df: DataFrame, userCol: Column, typeCol: Column,
      tsCol: Column, stages: Seq[String],
      maxGap: Option[String] = None): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    // maxGap: optional per-step conversion window ("1 day") — stage i+1
    // counts only within maxGap of the user's stage-i frontier event
    // (the "converted within 24h" funnel). Same plan shape; the bound
    // is one more pushed conjunct on the frontier join.
    val within = maxGap.map(g => expr(s"INTERVAL $g"))
    val first = df.filter(typeCol === stages.head)
      .groupBy(userCol.as("__u")).agg(min(tsCol).as("__t"))
    val frontiers = stages.tail.scanLeft(first) { (prev, stage) =>
      val step = df.filter(typeCol === stage)
        .join(prev, userCol === col("__u"))
        .filter(tsCol > col("__t"))
      within.fold(step)(g => step.filter(tsCol <= col("__t") + g))
        .groupBy(col("__u")).agg(min(tsCol).as("__t"))
    }
    frontiers.zip(stages).zipWithIndex
      .map { case ((f, stage), i) =>
        f.agg(count(lit(1)).as("n_users"))
          .select(lit(i.toLong).as("stage_idx"), lit(stage).as("stage"),
            col("n_users"))
      }
      .reduce(_ union _)
      .orderBy("stage_idx")
  }

  /** SCD2 (slowly-changing-dimension type 2) history builder: collapse
    * an event/snapshot stream into attribute validity intervals — one
    * row per (key, attribute-value run) with `valid_from`/`valid_to`
    * and an `is_current` flag (open interval). A row opens an interval
    * iff its attribute differs from the key's previous observation
    * (first observation always opens); `valid_to` is the next
    * interval's `valid_from`, null while current.
    *
    * `orderCols` must totally order each key's observations (include a
    * unique tie-break — an event id — or same-instant runs are
    * nondeterministic).
    *
    * Scale shape: two windows over the SAME (key, order) partitioning —
    * Catalyst plans one Exchange and sorts once; the second window
    * runs over the collapsed change-rows only. The classic MERGE-based
    * SCD2 loader needs a target-table join per batch; this is the
    * from-scratch history rebuild that backfills one.
    */
  def scd2(df: DataFrame, keys: Seq[Column], orderCols: Seq[Column],
      attr: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderCols: _*)
    val changed = df
      .withColumn("__prev", lag(attr, 1).over(w))
      .filter(col("__prev").isNull || !(attr <=> col("__prev")))
      .drop("__prev")
    val w2 = Window.partitionBy(keys: _*).orderBy(orderCols: _*)
    changed
      .withColumn("valid_from", orderCols.head)
      .withColumn("valid_to", lead(orderCols.head, 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Weekly cohort retention: users are cohorted by the Monday-
    * truncated week of their FIRST event; each (cohort, offset) cell
    * counts distinct users active `offset` weeks after their cohort
    * week. Both timestamps are week-truncated before differencing, so
    * the day gap is an exact multiple of 7 and the offset is integral
    * in both engines.
    *
    * Output: (cohort_week "yyyy-MM-dd" string, week_offset, n_users) —
    * string dates because engines disagree on date-object rendering,
    * not on the dates themselves.
    *
    * Scale shape: the first-event table is user-cardinality (one
    * min-aggregate), joined back on the user key — the same one-
    * partitioning-serves-all chain as [[funnel]]; the retention matrix
    * itself is (cohorts × offsets)-sized, trivially small.
    */
  def cohortRetention(df: DataFrame, userCol: Column,
      tsCol: Column): DataFrame = {
    val firsts = df.groupBy(userCol.as("__u"))
      .agg(date_trunc("week", min(tsCol)).cast("date").as("__cw"))
    df.join(firsts, userCol === col("__u"))
      .withColumn("week_offset",
        (datediff(date_trunc("week", tsCol).cast("date"), col("__cw")) / 7)
          .cast("long"))
      .groupBy(date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"))
      .agg(count_distinct(userCol).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Resample + gap-fill: aggregate `valueCol` into fixed `unit` buckets
    * per key (avg), then densify each key's series onto a complete
    * bucket grid from its first to its last observation, forward-
    * filling the aggregate across empty buckets. Emits `bucket`,
    * `v_filled` (the carried-forward aggregate), and `is_gap` (true on
    * buckets with no observations). The sensor/metrics "resample +
    * ffill" everybody reaches for in pandas, as a shuffle-minimal
    * distributed plan.
    *
    * Scale shape: one hash aggregate on (key, bucket); the grid is
    * generated per KEY from that aggregate's own min/max (sequence +
    * explode — rows ∝ key-cardinality × span/step, never touching the
    * raw table again); the fill is one window over the SAME (key,
    * bucket) partitioning as the grid join, so Catalyst plans a single
    * Exchange chain keyed on the key. No self-join, no per-gap
    * iteration; gaps of any length fill in one linear pass.
    *
    * `unit` is a date_trunc unit ("hour", "day", ...) and `step` the
    * matching sequence stride (e.g. "interval 1 hour").
    */
  def resampleFill(df: DataFrame, keyCol: Column, tsCol: Column,
      valueCol: Column, unit: String, step: String): DataFrame = {
    val buckets = df
      .groupBy(keyCol.as("__k"), date_trunc(unit, tsCol).as("bucket"))
      .agg(avg(valueCol).as("__v"))
    val grid = buckets
      .groupBy(col("__k"))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col("__k"),
        explode(sequence(col("__b0"), col("__b1"), expr(step))).as("bucket"))
    val w = Window.partitionBy(col("__k")).orderBy(col("bucket"))
    grid.join(buckets, Seq("__k", "bucket"), "left")
      .withColumn("v_filled", last(col("__v"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("__v").isNull)
      .select(col("__k").as("key"), col("bucket"), col("v_filled"),
        col("is_gap"))
  }

  /** Trailing exponentially-weighted moving average, exactly truncated
    * to the last `k` observations: for row n (per key, under `order`),
    *   ewma_n = Σ_{j=0..k-1} (1-α)^j · x_{n-j} / Σ_{j=0..k-1} (1-α)^j
    * over the rows that exist (shorter prefixes renormalize — the
    * pandas `adjust=True` semantics, window-bounded). Truncation makes
    * the statistic exactly computable by ANY engine from k lag columns
    * — no recursion, no state — which is what makes it certifiable and
    * what bounds its memory at 100 TB: the infinite-history recurrence
    * forces a sequential scan per key, while this is k codegen'd lag()
    * reads over ONE window partitioning, weight (1-α)^k of discarded
    * history (α=0.3, k=12 → <1% mass).
    *
    * Weights are computed once on the driver and embedded as literals,
    * so the numerator is one left-associated fused sum — engines agree
    * bit-for-bit given the same literals (shortest-roundtrip double
    * rendering, see [[ewmaWeights]]).
    */
  def ewmaTrailing(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      x: Column, alpha: Double, k: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    val ws = ewmaWeights(alpha, k)
    val terms = ws.zipWithIndex.map { case (c, j) =>
      val xj = if (j == 0) x else lag(x, j).over(w)
      (coalesce(xj * lit(c), lit(0.0)),
        when(xj.isNotNull, lit(c)).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn("ewma", num / den)
  }

  /** (1-α)^j for j in 0 until k — shared with oracle SQL generation so
    * both engines consume the identical double literals.
    */
  def ewmaWeights(alpha: Double, k: Int): Seq[Double] =
    (0 until k).map(j => math.pow(1.0 - alpha, j))

  /** Trailing-window z-score anomaly flags: each row is scored against
    * the mean/stddev of its key's PREVIOUS `k` observations (exclusive
    * window — the row never sees itself, so a genuine spike can't mask
    * itself by inflating its own baseline). Emits `mu`/`sigma` (null
    * until 2 prior rows exist), `z`, and `is_anomaly` = |z| > thresh.
    *
    * One window partitioning on the key; avg and stddev_samp share the
    * same frame so Catalyst computes both in a single window physical
    * node. stddev_samp to 6 dp is already proven engine-portable
    * (q_multi_agg / q_standardize).
    */
  def rollingZscore(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      x: Column, k: Int, thresh: Double): DataFrame = {
    require(k >= 2, "k must be >= 2 for a sample stddev")
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(-k, -1)
    val mu = avg(x).over(w)
    // guard: stddev_samp over a 1-row frame is NaN (0/0), not null —
    // pin the short-prefix behavior to null so any engine agrees
    val sd = when(count(x).over(w) >= 2, stddev_samp(x).over(w))
    df.withColumn("mu", mu)
      .withColumn("sigma", sd)
      .withColumn("z", when(col("sigma") > 0, (x - col("mu")) / col("sigma")))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > thresh, lit(false)))
  }

  /** Time-weighted average: each observation's value is weighted by how
    * LONG it held — the interval to the key's next observation — fixing
    * the sampling-rate bias a plain mean has on irregular series (a
    * sensor that reports 1000× while stuck at one value drags the mean;
    * the TWA is unchanged). The key's last observation has no interval
    * and carries no weight (step-function-until-next semantics).
    *
    * Output per key: `twa`, `span_us` (total covered microseconds),
    * `n_obs`. One window (lead) and one aggregate, both on the same key
    * partitioning — one Exchange at scale.
    */
  def timeWeightedAvg(df: DataFrame, keys: Seq[String], tsCol: Column,
      x: Column, tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tsCol +: tieBreak: _*)
    val dt = (lead(unix_micros(tsCol), 1).over(w) - unix_micros(tsCol))
      .as("__dt")
    df.select(keys.map(col) :+ x.as("__x") :+ dt: _*)
      .groupBy(keys.map(col): _*)
      .agg((sum(col("__x") * col("__dt")) / sum(col("__dt"))).as("twa"),
        coalesce(sum(col("__dt")), lit(0L)).as("span_us"),
        count(lit(1)).as("n_obs"))
  }

  /** Activity streaks (gaps-and-islands): per key, collapse the set of
    * active DAYS into maximal runs of consecutive days and report how
    * many active days, how many distinct streaks, and the longest
    * streak. The classic engagement metric, via the rank-difference
    * trick: within a key, consecutive days d with row_number r share a
    * constant d − r, so grouping on it labels each island — two
    * aggregates and one window, all on the key partitioning, no
    * self-join, no iteration.
    */
  def streaks(df: DataFrame, keyCol: Column, tsCol: Column): DataFrame = {
    val days = df.select(keyCol.as("__k"), to_date(tsCol).as("__d")).distinct()
    val w = Window.partitionBy(col("__k")).orderBy(col("__d"))
    val islands = days
      .withColumn("__grp",
        datediff(col("__d"), lit("1970-01-01").cast("date")) -
          row_number().over(w))
      .groupBy(col("__k"), col("__grp"))
      .agg(count(lit(1)).as("__len"))
    islands.groupBy(col("__k").as("key"))
      .agg(sum(col("__len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("__len")).as("longest_streak"))
  }

  /** Growth accounting: the product-analytics daily ledger — for each
    * active day, how many users were active (dau), NEW (first-ever
    * day), RETAINED (also active the previous day), RESURRECTED
    * (returning after a gap ≥ 2 days); plus CHURNED (active the
    * previous day, absent today — attributed to the day they failed to
    * show). new + retained + resurrected = dau on every row by
    * construction. The ledger ends at the LAST OBSERVED activity day:
    * churn of users active on that final day is right-censored (we
    * cannot know they left yet), so no phantom max_day+1 row is
    * emitted.
    *
    * Scale shape: one distinct to the (user, day) activity table, two
    * windows (lag/lead/min) on the USER partitioning, then day-keyed
    * counting aggregates joined on the day — the churn side is the
    * same activity table shifted one day, so no day-grid generation
    * and no user×day densification ever happens.
    */
  def growthAccounting(df: DataFrame, userCol: Column,
      tsCol: Column): DataFrame = {
    val days = df.select(userCol.as("__u"), to_date(tsCol).as("__d")).distinct()
    val w = Window.partitionBy(col("__u")).orderBy(col("__d"))
    val flagged = days
      .withColumn("__first", min(col("__d")).over(w))
      .withColumn("__prev", lag(col("__d"), 1).over(w))
      .withColumn("__next", lead(col("__d"), 1).over(w))
    val active = flagged.groupBy(col("__d").as("day"))
      .agg(count(lit(1)).as("dau"),
        sum(when(col("__d") === col("__first"), 1L).otherwise(0L)).as("new_users"),
        sum(when(datediff(col("__d"), col("__prev")) === 1, 1L).otherwise(0L)).as("retained"),
        sum(when(col("__prev").isNotNull &&
          datediff(col("__d"), col("__prev")) > 1, 1L).otherwise(0L)).as("resurrected"))
    val churned = flagged
      .filter(col("__next").isNull || datediff(col("__next"), col("__d")) > 1)
      .groupBy(date_add(col("__d"), 1).as("day"))
      .agg(count(lit(1)).as("churned"))
    // Right-censor: churn attributed past the last observed activity
    // day is unknowable, not real — clip the ledger at max(__d).
    // One-row scalar attach, broadcast by construction.
    val maxDay = days.agg(max(col("__d")).as("__maxd"))
    active.join(churned, Seq("day"), "full_outer")
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("__maxd"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("new_users"), lit(0L)).as("new_users"),
        coalesce(col("retained"), lit(0L)).as("retained"),
        coalesce(col("resurrected"), lit(0L)).as("resurrected"),
        coalesce(col("churned"), lit(0L)).as("churned"))
  }

  /** DAU/MAU stickiness: for each active day, the count of users active
    * that day (dau), the count active in the trailing `windowDays`-day
    * window ending that day (mau), and their ratio — the
    * "how often do monthly users show up" engagement metric that
    * completes [[growthAccounting]]'s ledger.
    *
    * Scale shape: a trailing-window COUNT DISTINCT can't ride a range
    * window frame, and a day-range join would plan as a nested loop —
    * instead each (user, day) activity row is exploded to the
    * `windowDays` report days it supports (a bounded ×window fan-out of
    * the DISTINCT activity table, far smaller than the event table),
    * then day-keyed distinct counting. Report days are restricted to
    * observed active days via the dau join, so the explode's synthetic
    * future days drop out.
    */
  def stickiness(df: DataFrame, userCol: Column, tsCol: Column,
      windowDays: Int = 28): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val days = df.select(userCol.as("__u"), to_date(tsCol).as("__d")).distinct()
    val dau = days.groupBy(col("__d").as("day")).agg(count(lit(1)).as("dau"))
    val mau = days
      .select(col("__u"), explode(sequence(col("__d"),
        date_add(col("__d"), windowDays - 1))).as("day"))
      .groupBy(col("day")).agg(countDistinct(col("__u")).as("mau"))
    dau.join(mau, Seq("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("mau"),
        round(col("dau").cast("double") / col("mau"), 6).as("stickiness"))
  }

  /** Period-over-period growth: aggregate `x` per (key, period bucket),
    * then attach the previous period's total and the percent change —
    * the WoW/MoM report. One aggregate + one lag window on the
    * period-cardinality table (dimension-sized). First period per key
    * has null prev/change.
    */
  def periodGrowth(df: DataFrame, keyCol: Column, tsCol: Column,
      x: Column, unit: String): DataFrame = {
    val agg = df.groupBy(keyCol.as("key"),
        date_trunc(unit, tsCol).as("__p"))
      .agg(sum(x).as("total"))
    val w = Window.partitionBy(col("key")).orderBy(col("__p"))
    agg.withColumn("prev_total", lag(col("total"), 1).over(w))
      .withColumn("pct_change",
        (col("total") - col("prev_total")) / col("prev_total"))
      .withColumn("period", col("__p")).drop("__p")
  }

  /** Stage-to-stage conversion lag: for users converting stage a → b
    * under the earliest-first funnel semantics ([[funnel]]), the delay
    * distribution — n converters plus exact p50/p90 delay seconds. The
    * "how fast do they convert" companion to the funnel's "how many".
    */
  def conversionLag(df: DataFrame, userCol: Column, typeCol: Column,
      tsCol: Column, stageA: String, stageB: String): DataFrame = {
    val a = df.filter(typeCol === stageA)
      .groupBy(userCol.as("__u")).agg(min(tsCol).as("__ta"))
    val b = df.filter(typeCol === stageB)
      .join(a, userCol === col("__u"))
      .filter(tsCol > col("__ta"))
      .groupBy(col("__u")).agg(min(tsCol).as("__tb"), min(col("__ta")).as("__ta2"))
    b.select(((unix_micros(col("__tb")) - unix_micros(col("__ta2"))) / lit(1e6))
        .as("__lag_s"))
      .agg(count(lit(1)).as("n_converted"),
        expr("percentile(__lag_s, 0.5)").as("p50_lag_s"),
        expr("percentile(__lag_s, 0.9)").as("p90_lag_s"))
  }

  /** CUSUM change-point screen: per key, the running sum of deviations
    * from the key's own mean — a mean shift makes the cusum drift, and
    * the drift's extreme marks the most likely change point (Page's
    * classic statistic, the offline scan form). Output per key: the
    * maximum |cusum|, and the EARLIEST order value attaining it (exact
    * equality join back — the cusum path is a deterministic sequential
    * sum, so the argmax is reproducible). |cusum| is quantized to 6 dp
    * BEFORE the max/argmax so two engines summing in different orders
    * land on the same peak row, not merely epsilon-close peaks.
    *
    * Two windows + one join, ALL on the key partitioning: mean via a
    * full-partition frame, cusum via a running frame, argmax via a
    * per-key max joined back on exact equality.
    */
  def cusum(df: DataFrame, keyCol: Column, tsCol: Column, x: Column,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val wAll = Window.partitionBy(keyCol)
    val wRun = Window.partitionBy(keyCol).orderBy(tsCol +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val path = df
      .withColumn("__dev", x - avg(x).over(wAll))
      .withColumn("__cusum", sum(col("__dev")).over(wRun))
      .select(keyCol.as("__k"), tsCol.as("__t"),
        round(abs(col("__cusum")), 6).as("__a"))
    val peaks = path.groupBy(col("__k").as("key"))
      .agg(max(col("__a")).as("max_abs_cusum"))
    peaks.join(path,
        col("key") === col("__k") && col("max_abs_cusum") === col("__a"))
      .groupBy(col("key"), col("max_abs_cusum"))
      .agg(min(col("__t")).as("change_ts"))
  }

  /** RFM (recency / frequency / monetary) scoring: per user, days since
    * their last qualifying event (relative to the stream's own max
    * timestamp), qualifying-event count, and value total — each
    * discretized into quartile buckets 1–4 against the POPULATION
    * distribution. The classic customer-value segmentation.
    *
    * Scale shape: one user-keyed aggregate; the three quartile cutoff
    * sets collapse to ONE 9-value row (broadcast back) and bucketing is
    * a pure comparison projection — no global ntile window, no
    * user-table sort. Bucket semantics: 1 + (x > q25) + (x > q50) +
    * (x > q75), so ties on a cutoff fall into the LOWER bucket in any
    * engine. Note recency buckets rank DAYS (4 = longest ago); invert
    * downstream if "4 = best" scoring is wanted.
    */
  def rfm(df: DataFrame, userCol: Column, tsCol: Column, valueCol: Column,
      qualify: Column): DataFrame = {
    val base = df.filter(qualify)
    val perUser = base.groupBy(userCol.as("user"))
      .agg(max(tsCol).as("__last"), count(lit(1)).as("frequency"),
        sum(valueCol).as("monetary"))
    val anchored = perUser
      .crossJoin(broadcast(base.agg(max(tsCol).as("__anchor"))))
      .withColumn("recency_days", datediff(col("__anchor"), col("__last")))
      .drop("__last", "__anchor")
    val cuts = anchored.agg(
      expr("percentile(recency_days, 0.25)").as("r25"),
      expr("percentile(recency_days, 0.5)").as("r50"),
      expr("percentile(recency_days, 0.75)").as("r75"),
      expr("percentile(frequency, 0.25)").as("f25"),
      expr("percentile(frequency, 0.5)").as("f50"),
      expr("percentile(frequency, 0.75)").as("f75"),
      expr("percentile(monetary, 0.25)").as("m25"),
      expr("percentile(monetary, 0.5)").as("m50"),
      expr("percentile(monetary, 0.75)").as("m75"))
    def bucket(x: Column, q25: Column, q50: Column, q75: Column): Column =
      (lit(1) + (x > q25).cast("int") + (x > q50).cast("int") +
        (x > q75).cast("int")).cast("long")
    anchored.crossJoin(broadcast(cuts))
      .select(col("user"), col("recency_days").cast("long").as("recency_days"),
        col("frequency"), col("monetary"),
        bucket(col("recency_days"), col("r25"), col("r50"), col("r75")).as("r_bucket"),
        bucket(col("frequency"), col("f25"), col("f50"), col("f75")).as("f_bucket"),
        bucket(col("monetary"), col("m25"), col("m50"), col("m75")).as("m_bucket"))
  }

  /** First-order Markov transition matrix over a per-key event-type
    * sequence: P(next = b | current = a) estimated from adjacent pairs
    * under `order` within each key. Emits one row per observed (from,
    * to) pair with its count and row-normalized probability — the
    * next-event model behind session prediction and anomalous-flow
    * detection.
    *
    * Scale shape: one window partitioning on the key to form adjacent
    * pairs (lead), then a hash aggregate on (from, to) — state² rows,
    * trivially small however large the corpus; the normalizing row sum
    * rides a second tiny aggregate joined back on `from`, never a
    * window over the pair table.
    */
  /** Seasonal-trend hourly forecast (SURVEY §2.8 M8): the capability of
    * the reference's LSTM/Prophet hybrid
    * (backend/NYC_Traffic_Congestion.py:57-92 — hourly volume forecast
    * per borough; that file never ran: syntax error at :27, deps absent)
    * re-expressed as the decomposition every classical forecaster
    * shares: per key,
    *   yhat(t) = trend(t) + s_hod(hour-of-day) + s_wd(weekday),
    * with the trend a one-pass closed-form OLS on the hour index
    * (slope = covar/var sufficient statistics — [[graft.metrics.Metrics.olsSimple]]'s
    * shape, grouped per key) and each seasonal component the mean
    * DETRENDED residual at that phase. Emits `horizonHours` rows per key
    * beyond the key's own last observed hour. A point-prediction lookup
    * (the reference's `:110` predict-for-timestamp) is a filter on
    * (key, ts) of this output.
    *
    * Scale shape: events collapse to (key, hour) counts in one hash
    * aggregate — everything after runs on that bucket-cardinality
    * table: a per-key trend aggregate, a (key, phase) mean aggregate,
    * and a key-sized explode of the horizon. No windows, no driver
    * round-trips; every join is key-keyed on dimension-sized tables
    * (AQE broadcasts them when small). Keys whose observed hours have
    * zero variance (single bucket) get slope 0 / intercept = mean —
    * the same degenerate-fit convention as SQL `regr_slope` (NULL,
    * coalesced), so engines agree.
    *
    * Fitting runs on OBSERVED hour buckets only (absent hours are
    * missing data, not zeros) — the same convention as fitting on the
    * raw event stream; densify with [[resampleFill]] first if
    * zero-filled semantics are wanted.
    *
    * `multiplicative = true` is the reference's
    * `seasonality_mode='multiplicative'` (NYC_Traffic_Congestion.py:84):
    * seasonal swing that SCALES with the level —
    *   yhat(t) = trend(t) · m_hod(hour) · m_wd(weekday)
    * — fitted as the SAME additive decomposition in log space (trend OLS
    * on ln y, seasonal components the mean log-residual per phase) and
    * exponentiated back, so the two modes share every aggregate below.
    * ln is total here: __y is an observed-bucket event COUNT, hence ≥ 1
    * (absent hours are absent rows, not zeros — see above). Callers
    * feeding a densified/zero-valued series must stay additive or
    * pre-shift, the same domain restriction Prophet's multiplicative
    * mode carries.
    */
  def seasonalForecast(df: DataFrame, keyCol: Column, tsCol: Column,
      horizonHours: Int = 24, multiplicative: Boolean = false): DataFrame = {
    require(horizonHours >= 1, "horizonHours must be >= 1")
    val rawY = count(lit(1)).cast("double")
    val hourly = df
      .groupBy(keyCol.as("__k"), date_trunc("hour", tsCol).as("__h"))
      .agg((if (multiplicative) log(rawY) else rawY).as("__y"))
      // hour index: __h is truncated to the hour, so /3600 is exact
      .withColumn("__t", (unix_timestamp(col("__h")) / 3600).cast("long"))
    val slope = covar_samp(col("__t").cast("double"), col("__y")) /
      var_samp(col("__t").cast("double"))
    val trend = hourly.groupBy(col("__k"))
      .agg(slope.as("__b"), avg(col("__y")).as("__my"),
        avg(col("__t").cast("double")).as("__mt"), max(col("__t")).as("__tmax"))
      .select(col("__k"),
        coalesce(col("__b"), lit(0.0)).as("__b"),
        (col("__my") - coalesce(col("__b"), lit(0.0)) * col("__mt")).as("__a"),
        col("__tmax"))
    val resid = hourly.join(trend, "__k")
      .withColumn("__r", col("__y") - (col("__a") + col("__b") * col("__t")))
      .withColumn("__hod", hour(col("__h")))
      .withColumn("__wd", graft.functions.DateTimeKit.weekdayMon0(col("__h")))
    val sHod = resid.groupBy(col("__k").as("__kh"), col("__hod").as("__ph"))
      .agg(avg(col("__r")).as("__s_hod"))
    val sWd = resid.groupBy(col("__k").as("__kw"), col("__wd").as("__pw"))
      .agg(avg(col("__r")).as("__s_wd"))
    trend
      .select(col("__k"), col("__a"), col("__b"),
        explode(sequence(lit(1), lit(horizonHours))).as("__i"),
        col("__tmax"))
      .withColumn("__t", col("__tmax") + col("__i"))
      .withColumn("__h", timestamp_seconds(col("__t") * 3600L))
      .withColumn("__hod", hour(col("__h")))
      .withColumn("__wd", graft.functions.DateTimeKit.weekdayMon0(col("__h")))
      .join(sHod, col("__k") === col("__kh") && col("__hod") === col("__ph"), "left")
      .join(sWd, col("__k") === col("__kw") && col("__wd") === col("__pw"), "left")
      .select(col("__k").as("key"), col("__h").as("forecast_hour"), {
        val fit = col("__a") + col("__b") * col("__t") +
          coalesce(col("__s_hod"), lit(0.0)) +
          coalesce(col("__s_wd"), lit(0.0))
        (if (multiplicative) exp(fit) else fit).as("yhat")
      })
  }

  def transitionMatrix(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      state: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    val pairs = df
      .select(state.as("from_state"), lead(state, 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
      .groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_state"))
      .agg(sum(col("n")).as("__tot"))
    pairs.join(totals, "from_state")
      .select(col("from_state"), col("to_state"), col("n"),
        (col("n").cast("double") / col("__tot")).as("p"))
  }
}
