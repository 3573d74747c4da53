package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Lineage.LineageOps

/** Distribution-drift detection between a REFERENCE dataset (what the
  * model/pipeline was built against) and a CURRENT dataset (what is
  * arriving now) — the monitoring gate a production training pipeline
  * runs before retraining or before trusting a new data drop.
  *
  * The reference repo has no drift surface (its data is a fixed CSV
  * snapshot); these fill SURVEY §2's training-pipeline gap with the two
  * standard detectors: PSI over quantile bins for numeric features
  * (the credit-scoring-era Population Stability Index — public
  * formulation, e.g. Yurdakul 2018's statistical treatment) and
  * Jensen-Shannon divergence for categorical / token distributions
  * (Lin 1991). Both reduce to a handful of hash aggregates whose
  * output is bins- or support-sized, never data-sized.
  */
object Drift {

  /** Per-bin PSI breakdown between `reference` and `current` for numeric
    * column `x`: `nBins` quantile bins whose edges come from the
    * REFERENCE distribution (the standard construction — bins hold
    * ~equal reference mass, so drift shows up as current mass leaving
    * them), each bin's reference/current share, and its PSI term
    * `(p_cur − p_ref) · ln(p_cur / p_ref)` (shares floored at `eps`
    * so empty bins contribute a finite penalty instead of ±∞).
    *
    * Scale shape: ONE exact-percentile aggregate over the reference
    * (1 row collected — O(nBins) driver data; at 100 TB swap in
    * `approx_percentile`, same plan shape, and the certification
    * pattern of q_approx_quantiles bounds the substitution), then the
    * bin id is pure literal column math (no join against an edge
    * table), one hash aggregate per side, and an nBins-row grid
    * left-join to densify — zero-count bins MUST appear, they are
    * where drift lives. Nothing after the scans is data-sized.
    *
    * Degenerate references: edges come from exact percentiles, so a
    * highly concentrated reference yields DUPLICATE edges and some of
    * the nBins bins become structurally unreachable (zero mass on both
    * sides, psi_term 0 after the eps floor). The PSI total is
    * unaffected, but the effective bin count is then fewer than nBins —
    * readers comparing bin granularity across features should count
    * distinct edges, not output rows. Kept as-is (rather than
    * deduplicating edges) so the bin ids stay aligned with the fixed
    * nBins quantile grid the oracle replays.
    */
  def psiBins(reference: DataFrame, current: DataFrame, x: Column,
      nBins: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(nBins > 1, "nBins must be > 1")
    val spark = reference.sparkSession
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val row = reference.filter(x.isNotNull)
      .agg(percentile(x, typedlit(probs)).as("__q")).head()
    if (row.isNullAt(0))
      // empty/all-null reference: no bins to compare against
      return spark.range(0).select(col("id").as("bin"),
        lit(0L).as("n_ref"), lit(0L).as("n_cur"),
        lit(0.0).as("p_ref"), lit(0.0).as("p_cur"),
        lit(0.0).as("psi_term"))
    val edges = row.getSeq[Double](0)
    // bin = #edges strictly below x — ties land in the LOWER bin on
    // both engines (the oracle uses the same strict comparison).
    def binOf(c: Column): Column =
      edges.map(e => when(c > lit(e), 1L).otherwise(0L))
        .reduce(_ + _)
    def counts(df: DataFrame, as: String): DataFrame =
      df.filter(x.isNotNull).groupBy(binOf(x).as("bin"))
        .agg(count(lit(1)).as(as))
    val grid = spark.range(nBins).select(col("id").as("bin"))
    val joined = grid
      .join(counts(reference, "n_ref"), Seq("bin"), "left")
      .join(counts(current, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    // shares are null (not a divide-by-zero throw under ANSI) when a
    // side has zero total mass — a PSI against an empty current batch
    // has no defined terms, and psi() filters the null through
    joined.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        when(col("__tr") > 0, col("n_ref").cast("double") / col("__tr"))
          .as("p_ref"),
        when(col("__tc") > 0, col("n_cur").cast("double") / col("__tc"))
          .as("p_cur"))
      .withColumn("psi_term",
        (col("p_cur") - col("p_ref")) *
          log(greatest(col("p_cur"), lit(eps)) /
              greatest(col("p_ref"), lit(eps))))
  }

  /** One-row PSI summary over [[psiBins]]: the index itself plus the
    * sample sizes. Standard reading (industry rule of thumb, not a
    * statistical test): < 0.1 stable, 0.1–0.25 moderate shift,
    * > 0.25 action. The `drifted` boolean applies `threshold` so a
    * pipeline can gate on one column.
    */
  def psi(reference: DataFrame, current: DataFrame, x: Column,
      nBins: Int = 10, eps: Double = 1e-6,
      threshold: Double = 0.25): DataFrame =
    psiBins(reference, current, x, nBins, eps)
      .agg(sum(col("psi_term")).as("psi"),
        sum(col("n_ref")).as("n_ref"), sum(col("n_cur")).as("n_cur"))
      .select(col("psi"), (col("psi") > lit(threshold)).as("drifted"),
        col("n_ref"), col("n_cur"))
      // empty reference ⇒ psiBins is empty ⇒ the global agg emits its
      // one all-null row; empty current ⇒ every psi_term is null. No
      // measurable drift row is the honest answer to either.
      .filter(col("psi").isNotNull)

  /** Jensen-Shannon divergence (nats) between the categorical
    * distributions of `key` in `a` vs `b`:
    * JS = ½·KL(P‖M) + ½·KL(Q‖M), M = (P+Q)/2 — symmetric, finite
    * (terms with zero mass contribute exactly 0, no smoothing needed
    * because M > 0 wherever either side has mass), bounded by ln 2.
    * `js_norm` divides by ln 2 → [0, 1]. Nulls are excluded (the
    * divergence is over observed values).
    *
    * Scale shape: one hash aggregate per side to support-sized count
    * tables, a full-outer equi-join of those two small tables (full
    * outer because one-sided values are precisely the drift signal),
    * two scalar totals broadcast back, one 1-row sum. After the scans
    * everything is support-sized.
    */
  def jsDivergence(a: DataFrame, b: DataFrame, key: Column): DataFrame = {
    val ca = a.filter(key.isNotNull).groupBy(key.as("__k"))
      .agg(count(lit(1)).as("__ca"))
    val cb = b.filter(key.isNotNull).groupBy(key.as("__k"))
      .agg(count(lit(1)).as("__cb"))
    val joined = ca.join(cb, Seq("__k"), "full_outer")
      .select(col("__k"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val tot = joined.agg(sum(col("__ca")).as("__ta"),
      sum(col("__cb")).as("__tb"))
    joined.crossJoin(broadcast(tot))
      .select(col("__k"),
        when(col("__ta") > 0, col("__ca").cast("double") / col("__ta"))
          .as("__pa"),
        when(col("__tb") > 0, col("__cb").cast("double") / col("__tb"))
          .as("__pb"))
      .withColumn("__m", (col("__pa") + col("__pb")) / 2)
      .agg(
        sum(when(col("__pa") > 0,
            lit(0.5) * col("__pa") * log(col("__pa") / col("__m")))
          .otherwise(lit(0.0))).plus(
        sum(when(col("__pb") > 0,
            lit(0.5) * col("__pb") * log(col("__pb") / col("__m")))
          .otherwise(lit(0.0)))).as("js_nats"),
        count(lit(1)).as("support"),
        sum(when(col("__pa") > 0 && col("__pb") > 0, 0L).otherwise(1L))
          .as("one_sided"))
      .select(col("js_nats"),
        (col("js_nats") / lit(math.log(2.0))).as("js_norm"),
        col("support"), col("one_sided"))
      // a divergence against zero observed mass is undefined: if either
      // side (or both) is empty, emit NO row rather than a null/NaN one
      .filter(col("support") > 0 && col("js_nats").isNotNull)
  }

  /** Two-sample Kolmogorov-Smirnov statistic between `reference` and
    * `current` for numeric `x`: D = max over observed values of
    * |ECDF_ref(v) − ECDF_cur(v)|, with the asymptotic α=0.05 critical
    * value c(α)·√((n₁+n₂)/(n₁·n₂)), c(0.05) = 1.358 (the classical
    * two-sample approximation) and the `drifted` boolean D > crit —
    * the distribution-shape drift test that catches what PSI's fixed
    * bins can blur (PSI quantizes; KS compares the full ECDFs).
    *
    * Scale shape: one hash aggregate per side to DISTINCT-VALUE-sized
    * count tables, a full-outer merge of those, then ONE unpartitioned
    * cumulative window over the merged value order — value-cardinality
    * rows, the same dimension-sized-window contract as
    * [[Relational.cumulativeShare]]. That is the right shape for
    * discrete/binned/low-cardinality features; for a CONTINUOUS column
    * at corpus scale the distinct table is data-sized, so quantize
    * first (the 6-dp round the repo uses everywhere caps the support
    * at 10⁶·range values) or reach for [[psiBins]], whose edges
    * collapse the support to nBins regardless of cardinality.
    */
  def ksStatistic(reference: DataFrame, current: DataFrame,
      x: Column): DataFrame = {
    val ref = reference.filter(x.isNotNull)
      .groupBy(x.cast("double").as("__v")).agg(count(lit(1)).as("__cr"))
    val cur = current.filter(x.isNotNull)
      .groupBy(x.cast("double").as("__v")).agg(count(lit(1)).as("__cc"))
    val merged = ref.join(cur, Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__cc"), lit(0L)).as("__cc"))
    val tot = merged.agg(sum(col("__cr")).as("__tr"),
      sum(col("__cc")).as("__tc"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    merged.crossJoin(broadcast(tot))
      .withColumn("__d",
        abs(sum(col("__cr")).over(w).cast("double") / col("__tr").cast("double") -
          sum(col("__cc")).over(w).cast("double") / col("__tc").cast("double")))
      .agg(max(col("__d")).as("ks_d"),
        max(col("__tr")).as("n_ref"), max(col("__tc")).as("n_cur"))
      .select(col("ks_d"),
        (lit(1.358) * sqrt((col("n_ref") + col("n_cur")).cast("double") /
          (col("n_ref") * col("n_cur")))).as("ks_crit_005"),
        col("n_ref"), col("n_cur"))
      .withColumn("drifted", col("ks_d") > col("ks_crit_005"))
      // ECDFs need mass on BOTH sides; an empty side emits no row
      .filter(col("n_ref") > 0 && col("n_cur") > 0)
  }

  /** Two-sample 1-D Wasserstein-1 (earth-mover) distance between
    * `reference` and `current` for numeric `x`:
    * `W₁ = ∫ |F_ref(t) − F_cur(t)| dt`, evaluated exactly over the
    * merged empirical support as `Σ_i |F_ref(v_i) − F_cur(v_i)| ·
    * (v_{i+1} − v_i)` — the closed form of the 1-D optimal transport
    * (Vallender 1974). The drift-family member with UNITS: where KS
    * reports the worst-point CDF gap (dimensionless, insensitive to
    * HOW FAR mass moved) and PSI quantizes into bins, W₁ answers "by
    * how much, in the feature's own units, did the distribution shift"
    * — a mean shift of δ reads as exactly δ regardless of shape.
    *
    * Output is ONE row (w1, mean_shift, n_ref, n_cur): `mean_shift` =
    * |mean_ref − mean_cur| rides along because W₁ ≥ |Δmean| always —
    * a free internal sanity invariant and the reader's scale anchor.
    *
    * Scale shape: identical to [[ksStatistic]] — one hash aggregate per
    * side to distinct-value count tables, a full-outer merge, ONE
    * unpartitioned cumulative window over the VALUE-CARDINALITY table
    * (the documented dimension-sized-window contract: right for
    * discrete/binned/quantized features; 6-dp-round or [[psiBins]]
    * first for continuous corpus-scale columns), plus a lead(1) for
    * the support gaps in the same window order.
    */
  def wasserstein1(reference: DataFrame, current: DataFrame,
      x: Column): DataFrame = {
    val ref = reference.filter(x.isNotNull)
      .groupBy(x.cast("double").as("__v")).agg(count(lit(1)).as("__cr"))
    val cur = current.filter(x.isNotNull)
      .groupBy(x.cast("double").as("__v")).agg(count(lit(1)).as("__cc"))
    val merged = ref.join(cur, Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__cc"), lit(0L)).as("__cc"))
    val tot = merged.agg(sum(col("__cr")).as("__tr"),
      sum(col("__cc")).as("__tc"),
      (sum(col("__cr") * col("__v")) / sum(col("__cr"))).as("__mr"),
      (sum(col("__cc") * col("__v")) / sum(col("__cc"))).as("__mc"))
    val ord = org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
    val w = ord.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    merged.crossJoin(broadcast(tot))
      .withColumn("__fr",
        sum(col("__cr")).over(w).cast("double") / col("__tr").cast("double"))
      .withColumn("__fc",
        sum(col("__cc")).over(w).cast("double") / col("__tc").cast("double"))
      // last support point: lead is null → term excluded (F diff is 0
      // there anyway — both ECDFs have reached 1)
      .withColumn("__gap", lead(col("__v"), 1).over(ord) - col("__v"))
      // coalesce: a single-point merged support (two constant columns)
      // has no non-null gap term — W1 is 0.0 there, not null
      .agg(coalesce(sum(abs(col("__fr") - col("__fc")) * col("__gap")),
        lit(0.0)).as("w1"),
        max(col("__tr")).as("n_ref"), max(col("__tc")).as("n_cur"),
        max(abs(col("__mr") - col("__mc"))).as("mean_shift"))
      .select(col("w1"), col("mean_shift"), col("n_ref"), col("n_cur"))
      .filter(col("n_ref") > 0 && col("n_cur") > 0)
  }

  /** Chi-squared two-sample homogeneity statistic for categorical
    * `key`: the 2×K contingency table of (side, value) counts,
    * χ² = Σ (O − E)²/E over its cells with expectations from the
    * pooled margins, dof = K − 1, and an α=0.05 critical value via the
    * Wilson-Hilferty cube approximation (public standard:
    * dof·(1 − 2/(9·dof) + z·√(2/(9·dof)))³, z = 1.6449 — closed-form,
    * so both engines compute it identically; an exact inverse-χ² CDF
    * is not SQL-expressible). Complements [[jsDivergence]]: χ² weights
    * cells by 1/E, so it is SENSITIVE to shifts in rare categories
    * that a mass-weighted divergence shrugs off.
    *
    * Same scale shape as jsDivergence: support-sized count tables,
    * full-outer merge, broadcast totals, one 1-row sum. Cells where a
    * value is absent from one side contribute (O−E)²/E normally (E > 0
    * whenever the pooled count is positive). Emits no row when either
    * side is empty or the support is a single value (dof = 0).
    */
  def chiSquaredDrift(a: DataFrame, b: DataFrame, key: Column): DataFrame = {
    val ca = a.filter(key.isNotNull).groupBy(key.as("__k"))
      .agg(count(lit(1)).as("__ca"))
    val cb = b.filter(key.isNotNull).groupBy(key.as("__k"))
      .agg(count(lit(1)).as("__cb"))
    val joined = ca.join(cb, Seq("__k"), "full_outer")
      .select(col("__k"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val tot = joined.agg(sum(col("__ca")).as("__ta"),
      sum(col("__cb")).as("__tb"))
    val z = 1.6449 // standard normal 95th percentile, 4 dp (public table)
    joined.crossJoin(broadcast(tot))
      .withColumn("__n", (col("__ta") + col("__tb")).cast("double"))
      .withColumn("__ea",
        (col("__ca") + col("__cb")) * col("__ta").cast("double") / col("__n"))
      .withColumn("__eb",
        (col("__ca") + col("__cb")) * col("__tb").cast("double") / col("__n"))
      .agg(
        // explicit squares, not pow(x, 2): pow's cross-engine bit
        // parity is not guaranteed, x*x is
        sum((col("__ca") - col("__ea")) * (col("__ca") - col("__ea")) / col("__ea")
          + (col("__cb") - col("__eb")) * (col("__cb") - col("__eb")) / col("__eb"))
          .as("chi2"),
        (count(lit(1)) - 1).cast("long").as("dof"),
        max(col("__ta")).as("n_ref"), max(col("__tb")).as("n_cur"))
      .withColumn("__wh", lit(1.0) - lit(2.0) / (lit(9.0) * col("dof")) +
        lit(z) * sqrt(lit(2.0) / (lit(9.0) * col("dof"))))
      // explicit cube (not pow(x, 3)) for cross-engine bit parity
      .withColumn("chi2_crit_005",
        col("dof") * (col("__wh") * col("__wh") * col("__wh")))
      .withColumn("drifted", col("chi2") > col("chi2_crit_005"))
      .select(col("chi2"), col("dof"), col("chi2_crit_005"), col("drifted"),
        col("n_ref"), col("n_cur"))
      // empty side ⇒ E = 0 cells; single-value support ⇒ dof 0: no row
      .filter(col("n_ref") > 0 && col("n_cur") > 0 && col("dof") > 0)
  }

  /** Embedding-space drift between two vector snapshots: the cosine
    * between the two MEAN vectors (a new embedding model, a domain
    * shift, or a normalization bug all move the centroid — cosine of
    * means near 1 ⇒ same direction), the ratio of mean L2 norms
    * (catches scale/normalization regressions cosine is blind to),
    * and per-side mean within-snapshot norm. One per-dimension
    * aggregate per side — posexplode to (dim, value), hash-aggregate
    * to dim-cardinality rows — then all arithmetic on dim-sized
    * tables. Emits no row when either side is empty.
    */
  def embeddingDrift(a: DataFrame, b: DataFrame, vec: Column): DataFrame = {
    def mean(df: DataFrame, side: String): DataFrame =
      df.select(posexplode(vec.cast("array<double>")).as(Seq("__d", "__x")))
        .groupBy("__d")
        .agg(avg(col("__x")).as(s"__m_$side"), count(lit(1)).as(s"__n_$side"))
    val joined = mean(a, "a").join(mean(b, "b"), Seq("__d"), "full_outer")
      .select(col("__d"),
        coalesce(col("__m_a"), lit(0.0)).as("__ma"),
        coalesce(col("__m_b"), lit(0.0)).as("__mb"),
        coalesce(col("__n_a"), lit(0L)).as("__na"),
        coalesce(col("__n_b"), lit(0L)).as("__nb"))
    joined
      .agg(sum(col("__ma") * col("__mb")).as("__ab"),
        sum(col("__ma") * col("__ma")).as("__aa"),
        sum(col("__mb") * col("__mb")).as("__bb"),
        max(col("__na")).as("n_ref"), max(col("__nb")).as("n_cur"))
      .select(
        (col("__ab") / (sqrt(col("__aa")) * sqrt(col("__bb"))))
          .as("mean_cosine"),
        (sqrt(col("__bb")) / sqrt(col("__aa"))).as("mean_norm_ratio"),
        col("n_ref"), col("n_cur"))
      .filter(col("n_ref") > 0 && col("n_cur") > 0)
  }

  /** Snapshot-profile drift: per-column deltas between two snapshots'
    * [[Profiling.profileTable]] rows — the SCHEMA-level drift screen
    * (null-rate moved, cardinality collapsed, mean shifted) run before
    * the distribution-level detectors above. One profile aggregate per
    * snapshot, a columns-sized join, pure arithmetic — nothing
    * data-sized after the two profile passes.
    */
  def profileDrift(reference: DataFrame, current: DataFrame,
      cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, suffix: String): DataFrame =
      Profiling.profileTable(df, cols).select(col("column"),
        col("n_rows").as(s"n_$suffix"),
        when(col("n_rows") > 0, col("n_null").cast("double") / col("n_rows"))
          .as(s"null_rate_$suffix"),
        col("n_distinct").as(s"distinct_$suffix"),
        col("avg_d").as(s"mean_$suffix"))
    side(reference, "ref").join(side(current, "cur"), Seq("column"))
      .withColumn("null_rate_delta",
        col("null_rate_cur") - col("null_rate_ref"))
      .withColumn("distinct_ratio",
        when(col("distinct_ref") > 0,
          col("distinct_cur").cast("double") / col("distinct_ref")))
      .withColumn("mean_shift",
        when(abs(col("mean_ref")) > 0,
          (col("mean_cur") - col("mean_ref")) / abs(col("mean_ref"))))
  }

  /** Token-distribution JS divergence between two corpora — the
    * vocabulary-drift detector for text pipelines (new domain, new
    * language, new boilerplate all move it). Tokenization is
    * [[TextOps.tokens]] (the repo-wide parity tokenizer), then
    * [[jsDivergence]] over the exploded token stream: the per-side
    * aggregate is vocabulary-sized, so corpus size only pays the scan.
    */
  def tokenJsDivergence(a: DataFrame, b: DataFrame, textCol: Column): DataFrame = {
    def toks(df: DataFrame): DataFrame =
      df.select(explode(TextOps.tokens(textCol)).as("__tok"))
    jsDivergence(toks(a), toks(b), col("__tok"))
  }

  /** The full drift family per (slice × feature) in ONE pass — the
    * shape a production 100 TB monitor actually runs (VERDICT r15 #5).
    * Calling [[psi]]/[[ksStatistic]]/[[wasserstein1]]/[[jsDivergence]]/
    * [[chiSquaredDrift]] once per feature re-scans the data 2×features
    * times; here both sides are MELTED (one map-only explode per side,
    * |features| struct rows per input row) into (slice, feature, value)
    * and every metric derives from a single shared (slice, feature,
    * value) cell-count table:
    *
    *  - the union of the two melts is aggregated ONCE into per-cell
    *    (n_ref, n_cur) — the matrix analog of each operator's
    *    full-outer count merge, with the side tag replacing the join;
    *  - KS D and W₁ come from ONE cumulative window PARTITIONED BY
    *    (slice, feature) over that table — value-cardinality rows per
    *    partition (the documented dimension-sized-window contract:
    *    quantize continuous columns first, exactly as for
    *    [[ksStatistic]]), and the partitioning restores the
    *    parallelism the single-column operators' unpartitioned windows
    *    give up;
    *  - JS and χ² are per-cell arithmetic + the same final regroup;
    *  - PSI reuses [[psiBins]]' construction with per-(slice, feature)
    *    reference-quantile edges — one grouped exact-percentile pass
    *    over the melted reference (swap `approx_percentile` at corpus
    *    scale, same plan) and a bins-sized densify so empty bins keep
    *    their eps-floored penalty.
    *
    * Output: one row per (slice, feature) — n_ref/n_cur, psi, ks_d,
    * w1, mean_shift, js_nats, chi2, dof. Values are IDENTICAL to the
    * single-column operators' on the same inputs (pinned by spec).
    * Features with zero mass on either side (within a slice) emit no
    * row, the family's convention. Slices are whatever column
    * expression the caller passes (default: one global slice);
    * driver-side state is zero and every post-scan stage is bounded by
    * slices × features × value-cardinality, never data-sized.
    *
    * The cell table is eagerly localCheckpoint'd: five metric branches
    * reuse it, and without materialization each branch would re-run
    * the melt + aggregate (the repo-wide lineage discipline).
    */
  def driftMatrix(reference: DataFrame, current: DataFrame,
      features: Seq[String], slice: Option[Column] = None,
      nBins: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(features.nonEmpty, "driftMatrix needs >= 1 feature")
    require(nBins > 1, "nBins must be > 1")
    // fail fast on a non-numeric feature: cast-to-double would null it
    // out and the feature would silently VANISH from the output — the
    // worst failure mode for a monitor. Categorical features belong in
    // [[driftMatrixCategorical]].
    Seq(reference, current).foreach { df =>
      features.foreach { f =>
        val dt = df.schema(f).dataType
        require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
          s"driftMatrix feature '$f' is $dt — numeric required " +
            "(use driftMatrixCategorical for categorical features)")
      }
    }
    val spark = reference.sparkSession
    val sliceCol = slice.getOrElse(lit(""))
    def melt(df: DataFrame): DataFrame = df
      .select(sliceCol.cast("string").as("__s"),
        explode(array(features.map(f =>
          struct(lit(f).as("f"), col(f).cast("double").as("v"))): _*))
          .as("__fv"))
      .select(col("__s"), col("__fv.f").as("__f"), col("__fv.v").as("__v"))
      .filter(col("__s").isNotNull && col("__v").isNotNull)
    val cells = melt(reference).withColumn("__side", lit(0))
      .unionAll(melt(current).withColumn("__side", lit(1)))
      .groupBy(col("__s"), col("__f"), col("__v"))
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__cr"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__cc"))
      .graftCheckpoint()
    // (slice, feature)-cardinality side tables, broadcast back
    val tot = cells.groupBy(col("__s"), col("__f"))
      .agg(sum(col("__cr")).as("__tr"), sum(col("__cc")).as("__tc"),
        (sum(col("__cr") * col("__v")) / sum(col("__cr"))).as("__mr"),
        (sum(col("__cc") * col("__v")) / sum(col("__cc"))).as("__mc"))
      .filter(col("__tr") > 0 && col("__tc") > 0)
    val probs = (1 until nBins).map(_.toDouble / nBins)
    // reference-quantile edges from the CELL table, not a second melt
    // pass: percentile-with-frequency over (value, n_ref) is by
    // definition the percentile of the raw reference values, and the
    // cell table is support-sized — the edges stage costs nothing
    // instead of re-scanning the reference through an interpreted
    // ObjectHashAggregate (measured 4.3 → 2.6 s at sf1).
    val edges = cells.filter(col("__cr") > 0)
      .groupBy(col("__s"), col("__f"))
      .agg(percentile(col("__v"), typedlit(probs), col("__cr"))
        .as("__edges"))
    val keys = Seq("__s", "__f")
    val ordW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__s"), col("__f")).orderBy(col("__v"))
    val cumW = ordW.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val enriched = cells
      .join(broadcast(tot), keys)
      .withColumn("__fr",
        sum(col("__cr")).over(cumW).cast("double") / col("__tr").cast("double"))
      .withColumn("__fc",
        sum(col("__cc")).over(cumW).cast("double") / col("__tc").cast("double"))
      .withColumn("__gap", lead(col("__v"), 1).over(ordW) - col("__v"))
      .withColumn("__pa", col("__cr").cast("double") / col("__tr"))
      .withColumn("__pb", col("__cc").cast("double") / col("__tc"))
      .withColumn("__m", (col("__pa") + col("__pb")) / 2)
      .withColumn("__ea", (col("__cr") + col("__cc")) *
        col("__tr").cast("double") / (col("__tr") + col("__tc")).cast("double"))
      .withColumn("__eb", (col("__cr") + col("__cc")) *
        col("__tc").cast("double") / (col("__tr") + col("__tc")).cast("double"))
    val metrics = enriched.groupBy(col("__s"), col("__f"))
      .agg(
        max(col("__tr")).as("n_ref"), max(col("__tc")).as("n_cur"),
        max(abs(col("__fr") - col("__fc"))).as("ks_d"),
        coalesce(sum(abs(col("__fr") - col("__fc")) * col("__gap")),
          lit(0.0)).as("w1"),
        max(abs(col("__mr") - col("__mc"))).as("mean_shift"),
        (sum(when(col("__pa") > 0,
            lit(0.5) * col("__pa") * log(col("__pa") / col("__m")))
          .otherwise(lit(0.0))) +
         sum(when(col("__pb") > 0,
            lit(0.5) * col("__pb") * log(col("__pb") / col("__m")))
          .otherwise(lit(0.0)))).as("js_nats"),
        sum((col("__cr") - col("__ea")) * (col("__cr") - col("__ea")) / col("__ea")
          + (col("__cc") - col("__eb")) * (col("__cc") - col("__eb")) / col("__eb"))
          .as("chi2"),
        (count(lit(1)) - 1).cast("long").as("dof"))
    // PSI branch: bin each cell by its feature's reference-quantile
    // edges (strictly-below count, [[psiBins]] semantics), densify to
    // the fixed nBins grid so empty bins keep their penalty
    val binned = cells
      .join(broadcast(edges), keys)
      .groupBy(col("__s"), col("__f"),
        size(filter(col("__edges"), e => col("__v") > e)).cast("long").as("__bin"))
      .agg(sum(col("__cr")).as("__bcr"), sum(col("__cc")).as("__bcc"))
    val grid = tot.select(col("__s"), col("__f"))
      .crossJoin(spark.range(nBins).select(col("id").as("__bin")))
    val psiTbl = grid
      .join(binned, keys :+ "__bin", "left")
      .select(col("__s"), col("__f"),
        coalesce(col("__bcr"), lit(0L)).as("__bcr"),
        coalesce(col("__bcc"), lit(0L)).as("__bcc"))
      .join(broadcast(tot), keys)
      .withColumn("__pr", col("__bcr").cast("double") / col("__tr"))
      .withColumn("__pc", col("__bcc").cast("double") / col("__tc"))
      .groupBy(col("__s"), col("__f"))
      .agg(sum((col("__pc") - col("__pr")) *
        log(greatest(col("__pc"), lit(eps)) /
            greatest(col("__pr"), lit(eps)))).as("psi"))
    metrics.join(psiTbl, keys)
      .select(col("__s").as("slice"), col("__f").as("feature"),
        col("n_ref"), col("n_cur"), col("psi"), col("ks_d"), col("w1"),
        col("mean_shift"), col("js_nats"), col("chi2"), col("dof"))
  }

  /** [[driftMatrix]] for CATEGORICAL features: per (slice × feature)
    * categorical PSI (the per-category form of the index — each
    * observed category is its own bin, shares eps-floored exactly like
    * the binned numeric form), JS divergence, and χ² homogeneity, all
    * from the same one-pass melted (slice, feature, value) cell table.
    * No ECDF metrics (KS/W₁ need an ordered domain) and therefore no
    * window at all — the whole post-scan tail is two grouped
    * aggregates over support-sized cells. Same conventions as the
    * numeric matrix: values spec-pinned identical to
    * [[jsDivergence]]/[[chiSquaredDrift]] on the same inputs, features
    * with zero mass on either side emit no row, slices are a caller
    * expression.
    */
  def driftMatrixCategorical(reference: DataFrame, current: DataFrame,
      features: Seq[String], slice: Option[Column] = None,
      eps: Double = 1e-6): DataFrame = {
    require(features.nonEmpty, "driftMatrixCategorical needs >= 1 feature")
    val sliceCol = slice.getOrElse(lit(""))
    def melt(df: DataFrame): DataFrame = df
      .select(sliceCol.cast("string").as("__s"),
        explode(array(features.map(f =>
          struct(lit(f).as("f"), col(f).cast("string").as("v"))): _*))
          .as("__fv"))
      .select(col("__s"), col("__fv.f").as("__f"), col("__fv.v").as("__v"))
      .filter(col("__s").isNotNull && col("__v").isNotNull)
    val cells = melt(reference).withColumn("__side", lit(0))
      .unionAll(melt(current).withColumn("__side", lit(1)))
      .groupBy(col("__s"), col("__f"), col("__v"))
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__cr"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__cc"))
      .graftCheckpoint() // support-sized; feeds totals AND the cell join
    val keys = Seq("__s", "__f")
    val tot = cells.groupBy(col("__s"), col("__f"))
      .agg(sum(col("__cr")).as("__tr"), sum(col("__cc")).as("__tc"))
      .filter(col("__tr") > 0 && col("__tc") > 0)
    cells.join(broadcast(tot), keys)
      .withColumn("__pa", col("__cr").cast("double") / col("__tr"))
      .withColumn("__pb", col("__cc").cast("double") / col("__tc"))
      .withColumn("__m", (col("__pa") + col("__pb")) / 2)
      .withColumn("__ea", (col("__cr") + col("__cc")) *
        col("__tr").cast("double") / (col("__tr") + col("__tc")).cast("double"))
      .withColumn("__eb", (col("__cr") + col("__cc")) *
        col("__tc").cast("double") / (col("__tr") + col("__tc")).cast("double"))
      .groupBy(col("__s"), col("__f"))
      .agg(
        max(col("__tr")).as("n_ref"), max(col("__tc")).as("n_cur"),
        sum((col("__pb") - col("__pa")) *
          log(greatest(col("__pb"), lit(eps)) /
              greatest(col("__pa"), lit(eps)))).as("psi"),
        (sum(when(col("__pa") > 0,
            lit(0.5) * col("__pa") * log(col("__pa") / col("__m")))
          .otherwise(lit(0.0))) +
         sum(when(col("__pb") > 0,
            lit(0.5) * col("__pb") * log(col("__pb") / col("__m")))
          .otherwise(lit(0.0)))).as("js_nats"),
        sum((col("__cr") - col("__ea")) * (col("__cr") - col("__ea")) / col("__ea")
          + (col("__cc") - col("__eb")) * (col("__cc") - col("__eb")) / col("__eb"))
          .as("chi2"),
        (count(lit(1)) - 1).cast("long").as("dof"))
      .select(col("__s").as("slice"), col("__f").as("feature"),
        col("n_ref"), col("n_cur"), col("psi"), col("js_nats"),
        col("chi2"), col("dof"))
  }
}
