package graft.pipelines

import org.apache.spark.ml.Transformer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** E2 — the reference's `/predict` serving path (main.py:278-310,
  * SURVEY.md §3 E2): a fixed 9-field request row → model registry
  * dispatch → single-row transform → expm1 inverse.
  *
  * The registry is an eagerly-loaded name→Transformer map (the
  * reference's lazy double-checked GCS hydration collapses to a startup
  * load — same capability, SURVEY.md §4).
  */
object ServingPipeline {

  /** The reference's PredictRequest: 9 doubles (main.py:278-287). */
  case class PredictRequest(
    hour_sin: Double, hour_cos: Double, wd_sin: Double, wd_cos: Double,
    month_sin: Double, month_cos: Double,
    vol_lag_1: Double, vol_roll_3: Double, vol_roll_24: Double)

  /** name → fitted model registry (M7). */
  final class Registry(models: Map[String, Transformer]) {
    def apply(name: String): Transformer =
      models.getOrElse(name,
        throw new NoSuchElementException(s"unknown model '$name'"))
    def names: Set[String] = models.keySet
  }

  def registry(models: (String, Transformer)*): Registry =
    new Registry(models.toMap)

  /** One prediction: request → 1-row DataFrame → transform → first
    * prediction, expm1-inverted when the model was trained on log1p
    * (main.py:305-309). The 1-row DataFrame path keeps serving identical
    * to batch semantics; latency-critical callers can reuse the same
    * Transformer on micro-batched request groups.
    */
  def predict(spark: SparkSession, reg: Registry, modelName: String,
      req: PredictRequest, expm1Inverse: Boolean = false): Double = {
    import spark.implicits._
    val df = Seq(req).toDF()
    val scored = reg(modelName).transform(df)
    val raw = scored.select(col("prediction")).head().getDouble(0)
    if (expm1Inverse) math.expm1(raw) else raw
  }
}
