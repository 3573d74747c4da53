package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Lineage.LineageOps

/** Core relational operators (SURVEY.md §2.2 P1–P14, §2.3 J1–J2, §2.4
  * A1/A5/A6, §2.5 O1–O3) as composable `DataFrame => DataFrame` stages.
  *
  * Everything here is declarative DataFrame API: Catalyst supplies
  * projection pushdown, predicate pushdown, and join planning that the
  * reference hand-rolled with `usecols` / chunking / category dtypes
  * (SURVEY.md §4).
  */
object Relational {

  /** P10: per-column null-count profile in ONE aggregate pass (reference
    * `df[cols].isnull().sum()`, backend/random_forest.py:164-166). Output:
    * one row, one column per input col, named `<col>_nulls`.
    */
  def nullProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      sum(col(cols.head).isNull.cast("long")).as(s"${cols.head}_nulls"),
      cols.tail.map(c => sum(col(c).isNull.cast("long")).as(s"${c}_nulls")): _*)

  /** P11: safe numeric cast — invalid strings become null, matching
    * `pd.to_numeric(errors="coerce")`
    * (scripts/convert_traffic_csv_to_geojson_point.py:12).
    */
  def safeNumeric(c: Column): Column = c.try_cast("double")

  /** P14/M6: deterministic temporal 80/20 split. The reference sorts by
    * time then slices positionally (`iloc[:int(len*0.8)]`,
    * SegmentedModeling.py:62-64). Spark-native: `row_number` over a
    * deterministic (tie-broken) ordering vs the total count — one window
    * pass, no collect.
    *
    * Scale note: `row_number` over an un-partitioned window funnels all
    * rows through one task. That is inherent to the operator's *global
    * positional* semantics (same as sorting 100 TB to one sequence); for
    * scale-out, callers should prefer [[temporalSplitAt]] with an explicit
    * timestamp cutoff, which is a pushed-down filter with no global window.
    */
  def temporalSplitFlag(df: DataFrame, orderCols: Seq[String],
      trainFrac: Double = 0.8): DataFrame = {
    val w = Window.orderBy(orderCols.map(col): _*)
    val n = df.count()
    val cut = math.ceil(n * trainFrac).toLong
    df.withColumn("__rn", row_number().over(w))
      .withColumn("is_train", (col("__rn") <= cut).cast("int"))
      .drop("__rn")
  }

  /** Scale-friendly temporal split: cutoff = the `trainFrac` quantile of
    * the order column (computed with a single approxQuantile pass), split
    * by comparison — pushes down to the scan, no global window.
    */
  def temporalSplitAt(df: DataFrame, tsCol: String, cutoff: Column): (DataFrame, DataFrame) =
    (df.filter(col(tsCol) <= cutoff), df.filter(col(tsCol) > cutoff))

  /** A1: n-ary union by name (reference `pd.concat(frames)`,
    * backend/weather_merge.py:23).
    */
  def unionAll(frames: Seq[DataFrame]): DataFrame = frames.reduce(_.unionByName(_))

  /** A5: oversample — replicate each row `k`× (reference
    * `pd.concat([evt_df]*5).sample(frac=1)`, SegmentedModeling.py:80-87).
    * Multiset parity; the pandas shuffle order is RNG-dependent and
    * meaningless in a distributed setting (SURVEY.md §7 risk 2).
    * `explode(array_repeat)` replicates without a shuffle.
    */
  def oversample(df: DataFrame, k: Int): DataFrame =
    df.withColumn("__rep", explode(array_repeat(lit(1), k))).drop("__rep")

  /** J2-style deliberate fan-out join: join on a coarser key than the
    * natural one so each left row matches several right rows (the
    * reference's 4-key traffic×weather join, SegmentedModeling.py:220-223,
    * multiplies rows ×~10 — intentional; SURVEY.md §7 risk 4).
    * Kept as an explicitly-named operator so nobody "fixes" it.
    */
  def fanOutJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "inner")

  /** Broadcast-dimension left join with fallback (J3: the reference's
    * coordinate-map dict hit-or-fallback, point_to_linestring.py:43-51).
    * `fallback` supplies values for unmatched rows via coalesce.
    */
  def lookupJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      mapped: Seq[(String, Column)]): DataFrame = {
    val joined = fact.join(broadcast(dim), keys, "left")
    mapped.foldLeft(joined) { case (d, (name, fallbackCol)) =>
      d.withColumn(name, coalesce(col(name), fallbackCol))
    }
  }

  /** Skew-safe equi-join: spread a hot key's rows across `saltFactor`
    * shuffle partitions by appending a per-row salt to the join key on
    * the skewed side and REPLICATING the other side once per salt value.
    *
    * The tool of last resort for join skew a planner can't fix: AQE's
    * skew-join handles skewed SHUFFLE partitions, but a single hot key
    * (one NULL-ish id, one mega-city) still lands in one task; salting
    * is the only way to split one key's rows. Cost: `other` is
    * replicated ×saltFactor — use for fact⋈dim shapes where dim is
    * small enough to replicate but too big (or too cold) to broadcast.
    *
    * The salt is drawn with `rand(seed)` — WHICH salt a row gets is
    * irrelevant to correctness (every salt value sees the full `other`
    * side), so Spark's retry nondeterminism is harmless. Inner and
    * left-outer semantics are preserved for any `joinType` Spark
    * supports on the skewed side ("inner", "left", "left_semi", ...).
    *
    * The replicated side carries a `shuffle_hash` hint: sort-merge
    * would SORT both exchanges on (keys, salt), and the salt's whole
    * point is that the key distribution is pathological — hash-probing
    * the replicated (dimension) build side does the same join without
    * ordering either side (measured at sf1: 5.4 s sort-merge → 1.4 s
    * shuffled hash on the q_salted_join shape). AQE still handles the
    * build-side size; if the dimension outgrows executor memory,
    * that's the signal to shrink it before the join, not to sort.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      saltFactor: Int = 16, joinType: String = "inner",
      seed: Long = 42): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // outer-preserving the REPLICATED side would emit each unmatched
    // `other` row saltFactor times — reject rather than silently duplicate
    require(!Set("right", "rightouter", "right_outer", "full", "outer",
        "fullouter", "full_outer").contains(joinType.toLowerCase.replace(" ", "")),
      s"joinType $joinType would duplicate unmatched rows of the replicated side; " +
        "salt the other side instead")
    val l = skewed.withColumn("__salt", (rand(seed) * saltFactor).cast("int"))
    val r = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
      .hint("shuffle_hash")
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Deterministic hash sampling: keep a row iff
    * `h60(idCol) mod denom < fraction·denom`. Unlike `rand()`/`sample()`
    * the keep/drop decision is a pure function of the row's id — stable
    * across runs, engines, partitionings, and INCREMENTAL reprocessing
    * (a document's membership never flips when the corpus grows), which
    * is what a reproducible train/eval carve of a 100 TB corpus needs.
    * Map-only: the filter pipelines with the scan.
    */
  def hashSample(df: DataFrame, idCol: Column, fraction: Double,
      denom: Int = 10000): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.filter(pmod(graft.functions.Hashing.h60(idCol.cast("string")),
      lit(denom)) < math.round(fraction * denom))
  }

  /** Per-stratum deterministic hash sampling — e.g. language-balanced
    * corpus carving: each value of `stratumCol` gets its own keep
    * fraction (unlisted strata get `defaultFraction`). Same stability
    * contract as [[hashSample]]; still one map-only filter.
    */
  def stratifiedHashSample(df: DataFrame, idCol: Column, stratumCol: Column,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      denom: Int = 10000): DataFrame = {
    require(fractions.values.forall(v => v >= 0.0 && v <= 1.0),
      "per-stratum fractions must be in [0,1]")
    require(defaultFraction >= 0.0 && defaultFraction <= 1.0,
      "defaultFraction must be in [0,1]")
    // thresholds are rounded to integers HERE, exactly like hashSample:
    // comparing against the unrounded double product would diverge from
    // hashSample (and any decimal-math oracle) on boundary hash values
    // for fractions whose product is inexact in binary (0.07 * 10000 =
    // 700.0000000000001)
    val threshold = fractions.foldLeft(lit(math.round(defaultFraction * denom))) {
      case (acc, (k, v)) => when(stratumCol === k, lit(math.round(v * denom))).otherwise(acc)
    }
    df.filter(pmod(graft.functions.Hashing.h60(idCol.cast("string")),
      lit(denom)) < threshold)
  }

  /** Per-group cap: keep at most `n` rows per value of `keyCol`, chosen
    * in deterministic HASH order of the id (not first-seen order, which
    * is partitioning-dependent, and not id order, which biases toward
    * old rows). The standard crawl-corpus guard — no single domain may
    * contribute more than n documents — and a skew guard in its own
    * right: a hot key's contribution is bounded before any downstream
    * join/explode sees it.
    *
    * Shape: one window keyed by `keyCol` ordered by (h60(id), id). At
    * corpus scale the key (domain) cardinality is huge, so window
    * parallelism is wide; for a pathological single hot key, cap it
    * upstream with [[hashSample]] first (the window's per-key sort is
    * the same single-task ceiling any per-key total order has).
    */
  def capPerKey(df: DataFrame, keyCol: Column, idCol: Column, n: Int): DataFrame = {
    require(n > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
      .orderBy(graft.functions.Hashing.h60(idCol.cast("string")), idCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic k-fold assignment: `fold = h60(id) mod k`, appended
    * as a column. The cross-validation partitioner done the way it has
    * to be done at corpus scale: the fold is a PURE FUNCTION of the row
    * key — stable across runs, machines, partitionings, and re-ingests
    * (a row keeps its fold when the table grows), so train/eval splits
    * never leak under re-shuffles. A row_number-based round-robin would
    * give exact fold sizes but ties the assignment to a global sort
    * (one total-order bottleneck) and to the CURRENT dataset contents;
    * the hash form is map-only — zero shuffle — and fold sizes converge
    * to n/k by the same md5-uniformity every sampler here relies on.
    *
    * Training view for fold i is `.filter(col("fold") =!= i)`, eval view
    * `=== i` — both stay pushdown-friendly scans of the same table.
    */
  def kfold(df: DataFrame, idCol: Column, k: Int,
      foldCol: String = "fold"): DataFrame = {
    require(k >= 2, "k must be at least 2")
    df.withColumn(foldCol,
      pmod(graft.functions.Hashing.h60(idCol.cast("string")), lit(k.toLong)))
  }

  /** Mixture sampling: deterministically carve the LARGEST corpus subset
    * whose per-group composition matches `targetShares` (e.g. 60% web /
    * 30% books / 10% code). The binding group — the one whose supply
    * runs out first relative to its target — is kept whole; every other
    * group is hash-downsampled to proportion. Groups absent from
    * `targetShares` are dropped.
    *
    * Scale shape: one tiny count-per-group aggregate (rows = #groups)
    * collected to the driver to solve the feasibility scale
    * T = min(count_g / share_g), then ONE map-only stratified hash
    * filter — the corpus itself is never shuffled. Keep decisions are
    * h60-deterministic (stable across runs/engines/partitionings, same
    * contract as [[hashSample]]).
    */
  def mixtureSample(df: DataFrame, groupCol: Column, idCol: Column,
      targetShares: Map[String, Double], denom: Int = 10000): DataFrame = {
    require(targetShares.nonEmpty && targetShares.values.forall(_ > 0.0),
      "targetShares must be non-empty and positive")
    // Deterministic summation order; keep fractions rounded to 6 dp so a
    // 1-ulp double difference in a re-implementation (the SQL oracle, a
    // port) cannot flip a keep threshold.
    val shareSum = targetShares.toSeq.sortBy(_._1).map(_._2).sum
    val counts = df.groupBy(groupCol.as("__g")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getAs[Any]("__g").toString -> r.getAs[Long]("__n")).toMap
    val present = targetShares.filter { case (g, _) => counts.getOrElse(g, 0L) > 0L }
    require(present.nonEmpty, "no target group present in the data")
    // Feasibility scale: total output size T such that every group g can
    // supply share_g/shareSum * T rows. The argmin group keeps ~all rows.
    val t = present.map { case (g, s) => counts(g) / (s / shareSum) }.min
    val fractions = present.map { case (g, s) =>
      g -> math.round(math.min(1.0, (s / shareSum) * t / counts(g)) * 1e6) / 1e6
    }
    stratifiedHashSample(df, idCol, groupCol, fractions,
      defaultFraction = 0.0, denom = denom)
  }

  /** Temperature-scaled mixture sampling (the multilingual data-mixing
    * standard — XLM-R / mT5 style): target shares ∝ p_g^α where p_g is
    * the OBSERVED group share and α ∈ (0, 1] the temperature — α = 1
    * keeps the natural mix, α → 0 flattens toward uniform, so
    * high-resource groups are relatively downsampled and low-resource
    * groups keep more of their rows. Powered shares are rounded to
    * 6 dp (and floored at 1e-6) before feeding [[mixtureSample]], so a
    * pow-ulp difference in a re-implementation cannot flip a keep
    * threshold except exactly at a rounding boundary.
    *
    * Scale shape: one group-count aggregate (group-cardinality rows
    * collected — the same bounded collect mixtureSample already does)
    * then mixtureSample's map-only deterministic hash filter.
    */
  def temperatureSample(df: DataFrame, groupCol: Column, idCol: Column,
      alpha: Double, denom: Int = 10000): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val counts = df.filter(groupCol.isNotNull)
      .groupBy(groupCol.as("__g")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getAs[Any]("__g").toString -> r.getAs[Long]("__n"))
    require(counts.nonEmpty, "no non-null groups present")
    val total = counts.map(_._2).sum.toDouble
    val target = counts.map { case (g, n) =>
      g -> math.max(math.round(math.pow(n / total, alpha) * 1e6) / 1e6, 1e-6)
    }.toMap
    mixtureSample(df.filter(groupCol.isNotNull), groupCol, idCol, target, denom)
  }

  /** Contiguous 1-based global row number under a total order, WITHOUT
    * the single-task window a bare `row_number() OVER (ORDER BY …)`
    * plans (one partition holding the entire table — the first thing
    * that dies at scale). Three bounded steps instead:
    *
    *  1. range-partition + sort (the same machinery a global `orderBy`
    *     uses — every partition's keys precede the next partition's);
    *  2. `monotonically_increasing_id` inside the sorted partitions —
    *     its (partitionId << 33 | counter) layout hands back a
    *     per-partition CONTIGUOUS local index for free, no window, no
    *     second shuffle;
    *  3. per-partition row counts (numPartitions rows, collected) →
    *     cumulative offsets broadcast back; rn = offset + local index.
    *
    * The sorted+numbered intermediate is eagerly localCheckpoint'ed so
    * the count job and the final projection read ONE materialization —
    * and so the id assignment (which is partition-layout-dependent) is
    * pinned, not recomputed, between them.
    *
    * `order` must be a total order (include a unique tie-break):
    * equal-key rows may straddle a range boundary, and their relative
    * numbering would be arbitrary — exactly as arbitrary as
    * `row_number` over ties, but pin it anyway for replayability.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], rnCol: String,
      numPartitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "order must be non-empty")
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__lrn", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
      .graftCheckpoint()
    val counts = sorted.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // Empty input: no partitions to offset — short-circuit (the
    // sliding(2) below would otherwise see a 1-element scan and fail).
    if (counts.isEmpty)
      return sorted.withColumn(rnCol, col("__lrn"))
        .drop("__mid", "__pid", "__lrn").limit(0)
    val offsets = counts.scanLeft((-1L, 0L)) { case ((_, acc), (pid, c)) =>
      (pid, acc + c) }.sliding(2).map { case Array((_, off), (pid, _)) =>
      (pid, off) }.toSeq
    val offDf = broadcast(df.sparkSession.createDataFrame(offsets)
      .toDF("__pid", "__off"))
    sorted.join(offDf, "__pid")
      .withColumn(rnCol, col("__off") + col("__lrn") + 1)
      .drop("__mid", "__pid", "__lrn", "__off")
  }

  /** Winsorization: clip `x` into its group's [pLo, pHi] percentile
    * band — the tail-taming cleaning step that keeps outlier ROWS
    * (unlike a filter) while bounding their LEVERAGE (unlike leaving
    * them). Exact cutoffs from one grouped percentile aggregate joined
    * back on the group key (no broadcast hint — AQE broadcasts the
    * group-cardinality stats side when its runtime size permits, and
    * degrades to a key shuffle when the group space is huge); the clip
    * is a pure projection.
    */
  def winsorize(df: DataFrame, groupCol: Column, x: Column,
      pLo: Double, pHi: Double, outCol: String = "x_wins"): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0, "need 0 <= pLo < pHi <= 1")
    val stats = df.select(groupCol.as("__g"), x.cast("double").as("__x"))
      .groupBy(col("__g")).agg(
        expr(s"percentile(__x, $pLo)").as("__lo"),
        expr(s"percentile(__x, $pHi)").as("__hi"))
    df.join(stats, groupCol === col("__g"))
      .withColumn(outCol, least(greatest(x.cast("double"), col("__lo")), col("__hi")))
      .drop("__g", "__lo", "__hi")
  }

  /** Group-mean imputation: replace nulls in `x` with the mean of the
    * row's OWN group, falling back to the global mean for groups whose
    * every value is null — the ML-cleaning step between `na.drop`
    * (loses rows) and constant fill (ignores structure). Group stats
    * joined back on the group key (AQE picks broadcast when the group
    * space is small); the fill is a pure coalesce projection.
    */
  def imputeByGroupMean(df: DataFrame, groupCol: Column, x: Column,
      outCol: String): DataFrame = {
    val stats = df.groupBy(groupCol.as("__g")).agg(avg(x).as("__gm"))
    val global = df.agg(avg(x).as("__m"))
    df.join(stats, groupCol === col("__g"), "left")
      .crossJoin(broadcast(global))
      .withColumn(outCol, coalesce(x, col("__gm"), col("__m")))
      .drop("__g", "__gm", "__m")
  }

  /** Pareto / cumulative-contribution analysis: rank keys by their
    * value total (descending) and report each key's cumulative share of
    * the grand total, plus the "top 80%" membership flag (a key is in
    * the head while the share BEFORE it is < `threshold` — so the key
    * that crosses the line is included, and the flagged set is the
    * smallest prefix covering the threshold). The concentration screen
    * behind "which parts drive 80% of volume".
    *
    * Scale shape: the data-sized work is ONE hash aggregate to
    * key-cardinality totals; the ranking window runs over that
    * DIMENSION-SIZED table (fine single-task for any real key space —
    * for degenerate billion-key spaces, the [[globalRowNumber]]
    * offset-broadcast pattern extends to prefix sums). Rank on an
    * EXACTLY-representable metric (integral values in doubles) when
    * the flagged set must be engine-reproducible: float-sum ulp noise
    * can swap near-equal totals ranked on arbitrary doubles.
    */
  def cumulativeShare(df: DataFrame, keyCol: Column, valueCol: Column,
      threshold: Double = 0.8): DataFrame = {
    val totals = df.groupBy(keyCol.as("key"))
      .agg(sum(valueCol).as("total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("total").desc, col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grand = totals.agg(sum(col("total")).as("__g"))
    totals.crossJoin(broadcast(grand))
      .withColumn("cum_share", sum(col("total")).over(w) / col("__g"))
      .withColumn("is_head",
        (sum(col("total")).over(w) - col("total")) / col("__g") < threshold)
      .drop("__g")
  }

  /** Robust scaling: (x − median) / IQR per group — the outlier-proof
    * standardization (mean/stddev both move with a single extreme
    * value; median and quartiles don't). Rows in groups with IQR = 0
    * get a null scaled value (degenerate distribution — flag, don't
    * divide). Exact percentiles via one grouped aggregate joined back
    * on the group key; group cardinality bounds the joined table, and
    * AQE broadcasts it when small (no unconditional hint — a huge group
    * space must be allowed to shuffle). For percentile cost at extreme
    * group sizes swap in approx_percentile — certified against exact
    * bands in q_approx_quantiles.
    */
  def robustScale(df: DataFrame, groupCol: Column, x: Column,
      outCol: String = "x_scaled"): DataFrame = {
    val stats = df.select(groupCol.as("__g"), x.cast("double").as("__x"))
      .groupBy(col("__g")).agg(
        expr("percentile(__x, 0.5)").as("__med"),
        (expr("percentile(__x, 0.75)") -
          expr("percentile(__x, 0.25)")).as("__iqr"))
    df.join(stats, groupCol === col("__g"))
      .withColumn(outCol,
        when(col("__iqr") > 0, (x.cast("double") - col("__med")) / col("__iqr")))
      .drop("__g", "__med", "__iqr")
  }

  /** Rank (quantile) normalization: map `x` to its empirical quantile
    * q = (rank − 1) / (N − 1) ∈ [0, 1] under the total order (x,
    * tie-break) — the distribution-free feature transform (uniformizes
    * any input marginal, the first half of a quantile-normalization /
    * Gaussian-rank pipeline). A single constant column (q = 0.5) when
    * N = 1.
    *
    * Scale shape: the rank comes from [[globalRowNumber]] (range
    * partition + local index + broadcast offsets) — a bare
    * `percent_rank() OVER (ORDER BY x)` plans ONE partition holding
    * the whole table, which is exactly what this avoids. N is one
    * bounded count.
    */
  def rankNormalize(df: DataFrame, x: Column, tieBreak: Seq[Column],
      qCol: String = "q"): DataFrame = {
    val n = df.count()
    val ranked = globalRowNumber(df, x +: tieBreak, "__rn")
    val q = if (n <= 1L) lit(0.5)
      else (col("__rn") - 1).cast("double") / lit((n - 1).toDouble)
    ranked.withColumn(qCol, q).drop("__rn")
  }

  /** Snapshot diff: classify every key of two table versions as
    * `added` (only in v2), `removed` (only in v1), or `changed`
    * (present in both with any compared column differing, null-safely).
    * Unchanged keys are dropped — the output is the delta, sized by the
    * churn rate, not the table. The pipeline use is data-version
    * auditing: "what did this rebuild actually change" before promoting
    * a 100 TB snapshot (the batch analog of the CDC/SCD2 operators).
    *
    * Output: the key columns (coalesced across sides), `change`, and
    * `<c>_old` / `<c>_new` for every compared column.
    *
    * Scale shape: ONE full-outer shuffle join co-partitioned on the key
    * — the minimum any exact diff pays. With both snapshots bucketed by
    * the key (the layout a versioned table should have anyway) the
    * exchange disappears entirely. The change classification and column
    * comparisons are projections on the joined row; nothing is ever
    * collected.
    *
    * Keys are assumed non-null (primary keys); compared columns may be
    * null on either side — `<=>` makes null→value and value→null count
    * as changes while null→null does not.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    // Rename both sides up front: v1/v2 usually derive from the SAME
    // scan (two versions of one table), and side-qualified column refs
    // on a self-join are exactly the ambiguity trap this avoids.
    val l = v1.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"__l_$c")) :+ lit(1).as("__a"): _*)
    val r = v2.select(keys.map(k => col(k).as(s"__r_$k")) ++
      compareCols.map(c => col(c).as(s"__r_$c")) :+ lit(1).as("__b"): _*)
    val cond = keys.map(k => col(k) === col(s"__r_$k")).reduce(_ && _)
    val same = compareCols.map(c => col(s"__l_$c") <=> col(s"__r_$c")).reduce(_ && _)
    val change = when(col("__b").isNull, lit("removed"))
      .when(col("__a").isNull, lit("added"))
      .when(!same, lit("changed"))
    val keyOut = keys.map(k => coalesce(col(k), col(s"__r_$k")).as(k))
    val valOut = compareCols.flatMap(c =>
      Seq(col(s"__l_$c").as(s"${c}_old"), col(s"__r_$c").as(s"${c}_new")))
    l.join(r, cond, "full_outer")
      .withColumn("change", change)
      .filter(col("change").isNotNull)
      .select(keyOut ++ (col("change") +: valOut): _*)
  }
}
