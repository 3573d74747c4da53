package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regression / statistics aggregates (SURVEY.md §2.4 A7–A10).
  *
  * The reference computes these with sklearn on materialized numpy arrays
  * (backend/LinearRegression.py:79-93, SegmentedModeling.py:122-137). Here
  * each metric is a pure aggregate *expression* — one distributed pass,
  * map-side partial aggregation, no driver-side arrays.
  */
object Metrics {

  /** Mean squared error. */
  def mse(y: Column, p: Column): Column = avg(pow(y - p, 2))

  /** Mean absolute error. */
  def mae(y: Column, p: Column): Column = avg(abs(y - p))

  /** Root mean squared error (A9). */
  def rmse(y: Column, p: Column): Column = sqrt(mse(y, p))

  /** R² = 1 − SS_res/SS_tot, single pass via sufficient statistics:
    * SS_tot = Σy² − (Σy)²/n.
    */
  def r2(y: Column, p: Column): Column = {
    val ssRes = sum(pow(y - p, 2))
    val ssTot = sum(y * y) - pow(sum(y), 2) / count(y)
    lit(1.0) - ssRes / ssTot
  }

  /** A10: MAPE with the reference's zero-mask
    * (`mean_absolute_percentage_error(y[y>0], p[y>0])`,
    * SegmentedModeling.py:122-128) — rows with y<=0 are excluded from the
    * mean, expressed as a conditional aggregate (no pre-filter needed, so
    * it composes with other metrics in one pass).
    */
  def mapeNonzero(y: Column, p: Column): Column =
    avg(when(y > 0, abs((y - p) / y)))

  /** All four regression metrics in one aggregate pass. */
  def regressionReport(df: DataFrame, yCol: String, pCol: String): DataFrame = {
    val (y, p) = (col(yCol), col(pCol))
    df.agg(
      r2(y, p).as("r2"), mse(y, p).as("mse"), mae(y, p).as("mae"),
      rmse(y, p).as("rmse"), mapeNonzero(y, p).as("mape_nonzero"))
  }

  /** One-pass single-feature OLS from sufficient statistics:
    * slope = cov(x,y)/var(x), intercept = ȳ − slope·x̄, R² = corr(x,y)²
    * (exact for simple linear regression). Four aggregate expressions in
    * ONE distributed pass — the scale path for 100 TB single-feature
    * fits, where an MLlib fit's instance collection and extra count job
    * buy nothing (the normal-equation solve is closed-form either way).
    * Matches DuckDB `regr_slope/regr_intercept/regr_r2` and the MLlib
    * solver (q_ols_coeffs) to ~1e-12 relative.
    *
    * Rows where either column is NULL are excluded up front — SQL
    * `regr_*` semantics. Without the filter, `covar_samp(x,y)` would
    * drop pairwise-null rows while `var_samp(x)`/`avg(x)` kept them,
    * silently mixing two different populations on nullable inputs.
    */
  def olsSimple(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val (x, y) = (col(xCol).cast("double"), col(yCol).cast("double"))
    val slope = covar_samp(x, y) / var_samp(x)
    df.filter(x.isNotNull && y.isNotNull).agg(
      slope.as("slope"),
      (avg(y) - slope * avg(x)).as("intercept"),
      pow(corr(x, y), 2).as("r2"),
      count(lit(1)).as("n"))
  }

  /** A7: full pairwise Pearson correlation matrix over numeric columns.
    * Output: one row per column (`feature`), one column per column —
    * mirrors `df.corr()`. Uses `corr` aggregates (single pass, n² cells
    * but each a cheap partial agg — fine for the ≤dozens of features the
    * reference profiles; for very wide matrices use
    * `ml.stat.Correlation.corr` on an assembled vector).
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = for (a <- cols; b <- cols) yield corr(col(a), col(b)).as(s"${a}__${b}")
    val wide = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val spark = df.sparkSession
    import spark.implicits._
    val rows = cols.map { a => (a, cols.map(b => wide.getAs[Double](s"${a}__${b}"))) }
    rows.toDF("feature", "corrs")
      .select(col("feature") +: cols.zipWithIndex.map { case (b, i) =>
        col("corrs").getItem(i).as(b)
      }: _*)
  }
}
