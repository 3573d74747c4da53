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
      tsCol: Column, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    val first = df.filter(typeCol === stages.head)
      .groupBy(userCol.as("__u")).agg(min(tsCol).as("__t"))
    val frontiers = stages.tail.scanLeft(first) { (prev, stage) =>
      df.filter(typeCol === stage)
        .join(prev, userCol === col("__u"))
        .filter(tsCol > col("__t"))
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
}
