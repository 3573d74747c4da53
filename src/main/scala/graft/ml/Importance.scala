package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.regression.RandomForestRegressionModel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.metrics.Metrics

/** Feature-importance utilities (SURVEY.md §2.4 A11/A12).
  *
  * A11 reads MLlib's impurity importances straight off the fitted forest.
  * A12 (permutation importance) is the reference's meta-algorithm
  * (SegmentedModeling.py:144-158): shuffle one feature column, re-score,
  * report the metric drop — a driver-side loop over features where each
  * iteration is a distributed transform+aggregate. The shuffle itself is
  * a rand-keyed re-pairing of the column against the rest of the row.
  */
object Importance {

  /** A11: impurity-based importances of a fitted RF pipeline, named. */
  def featureImportances(model: PipelineModel, featureNames: Seq[String]): Seq[(String, Double)] = {
    val rf = model.stages.collectFirst { case m: RandomForestRegressionModel => m }
      .getOrElse(throw new IllegalArgumentException("no RandomForestRegressionModel stage"))
    val v: Vector = rf.featureImportances
    featureNames.zipWithIndex.map { case (n, i) => n -> v(i) }
  }

  /** Shuffle (permute) one column against the others: rand-keyed
    * row_number on both sides, join on the row number.
    *
    * Scale note: the two global `row_number` windows single-task the
    * sequence assignment. Permutation importance is a *metric estimate*,
    * so at 100 TB callers should pass a sampled df (the estimate converges
    * long before the full data) — the operator itself stays collect-free.
    */
  def shuffleColumn(df: DataFrame, colName: String, seed: Long): DataFrame = {
    val others = df.drop(colName)
      .withColumn("__rn", row_number().over(Window.orderBy(rand(seed))))
    val vals = df.select(col(colName))
      .withColumn("__rn", row_number().over(Window.orderBy(rand(seed + 1))))
    others.join(vals, "__rn").drop("__rn")
  }

  /** A12: permutation importance — for each feature, the mean R² drop
    * over `repeats` shuffles (reference: `n_repeats=5`).
    */
  def permutationImportance(model: Transformer, df: DataFrame,
      features: Seq[String], labelCol: String,
      predictionCol: String = "prediction", repeats: Int = 5,
      seed: Long = 42): Seq[(String, Double)] = {
    def r2Of(d: DataFrame): Double =
      model.transform(d)
        .agg(Metrics.r2(col(labelCol), col(predictionCol))).head().getDouble(0)
    val base = r2Of(df)
    features.map { f =>
      val drops = (0 until repeats).map { r =>
        base - r2Of(shuffleColumn(df, f, seed + 31L * r + f.hashCode))
      }
      f -> drops.sum / repeats
    }
  }
}
