package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression, RandomForestRegressor}
import org.apache.spark.sql.DataFrame

/** MLlib model builders mirroring the reference's three regressors
  * (SURVEY.md §2.8 M1-M3) plus the two split strategies (M5/M6).
  *
  * Parity notes (SURVEY.md §7 risk 2): sklearn's exact-split trees and
  * histogram-GBM have no MLlib twin — parity is metric-tolerance (R²
  * within ~0.05 on identical fixtures), not prediction identity. OLS
  * (M1) is solver-exact on both sides, so its coefficients ARE
  * oracle-checkable (DuckDB `regr_slope`/`regr_intercept`).
  */
object Models {

  /** M1: OLS linear regression (reference backend/LinearRegression.py:13).
    * `solver=normal`, zero regularization → exact normal-equations OLS.
    */
  def ols(features: Seq[String], label: String,
      predictionCol: String = "prediction",
      featuresCol: String = "features"): Pipeline = {
    val lr = new LinearRegression()
      .setFeaturesCol(featuresCol).setLabelCol(label)
      .setPredictionCol(predictionCol)
      .setSolver("normal").setRegParam(0.0).setElasticNetParam(0.0)
    new Pipeline().setStages(Array(
      Featurize.assembler(features, featuresCol), lr))
  }

  /** M2: random-forest regressor, reference config
    * `n_estimators=100, max_depth=15, random_state=42`
    * (backend/random_forest.py:17). Smaller settings for unit fixtures.
    */
  def randomForest(features: Seq[String], label: String,
      numTrees: Int = 100, maxDepth: Int = 15, seed: Long = 42,
      predictionCol: String = "prediction",
      featuresCol: String = "features"): Pipeline = {
    val rf = new RandomForestRegressor()
      .setFeaturesCol(featuresCol).setLabelCol(label)
      .setPredictionCol(predictionCol)
      .setNumTrees(numTrees).setMaxDepth(math.min(maxDepth, 30)).setSeed(seed)
    new Pipeline().setStages(Array(
      Featurize.assembler(features, featuresCol), rf))
  }

  /** M3: gradient-boosted trees, reference config `max_iter=200,
    * learning_rate=0.1, max_depth=6, random_state=42`
    * (HistGradientBoostingRegressor.py:118-125). For the reference's
    * `early_stopping=True` path use [[fitGbtEarlyStopping]].
    */
  def gbt(features: Seq[String], label: String,
      maxIter: Int = 200, stepSize: Double = 0.1, maxDepth: Int = 6,
      seed: Long = 42, predictionCol: String = "prediction",
      featuresCol: String = "features"): Pipeline = {
    val g = new GBTRegressor()
      .setFeaturesCol(featuresCol).setLabelCol(label)
      .setPredictionCol(predictionCol)
      .setMaxIter(maxIter).setStepSize(stepSize).setMaxDepth(maxDepth)
      .setSeed(seed)
    new Pipeline().setStages(Array(
      Featurize.assembler(features, featuresCol), g))
  }

  /** M3 with early stopping — the reference's
    * `early_stopping=True, validation_fraction=0.1`
    * (HistGradientBoostingRegressor.py:121-123). MLlib's analog is
    * `validationIndicatorCol`: a seeded Bernoulli(validationFraction)
    * indicator marks held-out rows, and boosting stops once an
    * iteration's validation-error improvement falls below
    * `validationTol`. Deviation from sklearn (documented, COVERAGE.md):
    * sklearn waits `n_iter_no_change=10` flat iterations before
    * stopping; MLlib stops at the first sub-tol iteration, so it may
    * stop a few rounds earlier on plateaued fits — metric parity stays
    * within the M2/M3 tolerance band (SURVEY.md §7 risk 2).
    *
    * Returns the fitted model plus the ensemble size actually reached,
    * so callers (and the spec) can see early stopping engage
    * (`trees < maxIter`).
    */
  def fitGbtEarlyStopping(df: DataFrame, features: Seq[String], label: String,
      maxIter: Int = 200, stepSize: Double = 0.1, maxDepth: Int = 6,
      validationFraction: Double = 0.1, validationTol: Double = 0.01,
      seed: Long = 42, predictionCol: String = "prediction",
      featuresCol: String = "features"): (PipelineModel, Int) = {
    val valCol = "__graft_is_validation"
    val g = new GBTRegressor()
      .setFeaturesCol(featuresCol).setLabelCol(label)
      .setPredictionCol(predictionCol)
      .setMaxIter(maxIter).setStepSize(stepSize).setMaxDepth(maxDepth)
      .setSeed(seed)
      .setValidationIndicatorCol(valCol)
    // Seeded rand() is deterministic per partition layout — the same
    // (df, seed) always carves the same holdout, like sklearn's
    // random_state-driven validation_fraction split. validationTol has
    // no public setter on GBTRegressor, so it rides in via ParamMap.
    val withVal = df.withColumn(valCol,
      org.apache.spark.sql.functions.rand(seed) < validationFraction)
    val model = new Pipeline().setStages(Array(
      Featurize.assembler(features, featuresCol), g))
      .fit(withVal, org.apache.spark.ml.param.ParamMap(
        g.validationTol -> validationTol))
    val nTrees = model.stages.last
      .asInstanceOf[org.apache.spark.ml.regression.GBTRegressionModel]
      .trees.length
    (model, nTrees)
  }

  /** M5: random split (reference `train_test_split(test_size=…)`;
    * different RNG → multiset-level parity only, SURVEY.md §7 risk 2).
    */
  def randomSplit(df: DataFrame, testSize: Double, seed: Long = 42): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(1.0 - testSize, testSize), seed)
    (train, test)
  }

  /** S14: model artifact sink/scan (reference joblib.dump/load,
    * save_models.py:32-50) — MLlib's native Parquet+JSON format.
    */
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)
  def load(path: String): PipelineModel = PipelineModel.load(path)
}
