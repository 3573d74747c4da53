package graft.pipelines

import org.apache.spark.ml.{PipelineModel, PredictionModel, Transformer}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.{Vector, Vectors}
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

  /** PredictRequest fields in declaration order — the assembly order
    * [[predict]]'s 1-row DataFrame presents to a VectorAssembler that
    * lists the canonical nine names.
    */
  private val RequestFields = Seq("hour_sin", "hour_cos", "wd_sin",
    "wd_cos", "month_sin", "month_cos", "vol_lag_1", "vol_roll_3",
    "vol_roll_24")

  private def requestValue(req: PredictRequest, field: String): Double =
    field match {
      case "hour_sin" => req.hour_sin
      case "hour_cos" => req.hour_cos
      case "wd_sin" => req.wd_sin
      case "wd_cos" => req.wd_cos
      case "month_sin" => req.month_sin
      case "month_cos" => req.month_cos
      case "vol_lag_1" => req.vol_lag_1
      case "vol_roll_3" => req.vol_roll_3
      case "vol_roll_24" => req.vol_roll_24
      case other => throw new IllegalArgumentException(
        s"model expects feature column '$other' not present on PredictRequest")
    }

  /** Sub-millisecond serving fast path (SURVEY §3 E2's "`predict` on a
    * local vector for latency"): assemble the nine request doubles
    * driver-side into an `ml.linalg.Vector` and call the fitted model's
    * public `predict(Vector)` directly — no DataFrame, no Catalyst
    * planning, no Spark job. Identical prediction to [[predict]] by
    * construction (pinned in PipelinesSpec): the assembly replays the
    * model's own VectorAssembler input order, and the scalar `predict`
    * is the same code `transform` applies per row.
    *
    * Supported registry shapes: a bare `PredictionModel[Vector, _]`, or
    * a `PipelineModel` whose stages are VectorAssemblers plus exactly
    * one PredictionModel (the [[graft.ml.Models]] factories). Anything
    * else (custom transform stages whose semantics the driver-side
    * assembly cannot replay) is refused — use [[predict]].
    */
  def predictLocal(reg: Registry, modelName: String, req: PredictRequest,
      expm1Inverse: Boolean = false): Double = {
    val raw = reg(modelName) match {
      case pm: PredictionModel[Vector @unchecked, _] =>
        pm.predict(Vectors.dense(RequestFields.map(requestValue(req, _)).toArray))
      case p: PipelineModel =>
        val predictor = p.stages.reverse.collectFirst {
          case m: PredictionModel[Vector @unchecked, _] => m
        }.getOrElse(throw new IllegalArgumentException(
          s"model '$modelName' has no PredictionModel stage — use predict()"))
        require(p.stages.forall(s =>
            (s eq predictor) || s.isInstanceOf[VectorAssembler]),
          s"predictLocal supports VectorAssembler+PredictionModel pipelines " +
            s"only; model '$modelName' has other stages — use predict()")
        // Exactly ONE assembler, and it must feed the predictor: with
        // chained assemblers (VA1(a,b→v1), VA2(v1,c→features)) the
        // first stage's inputCols would silently build a wrong-order/
        // wrong-dimension vector — refuse those shapes instead.
        val assemblers = p.stages.collect { case va: VectorAssembler => va }
        require(assemblers.size <= 1,
          s"predictLocal cannot replay chained VectorAssemblers; " +
            s"model '$modelName' has ${assemblers.size} — use predict()")
        require(assemblers.headOption.forall(
            _.getOutputCol == predictor.getFeaturesCol),
          s"model '$modelName': assembler output '" +
            assemblers.head.getOutputCol + "' does not feed the " +
            s"predictor's featuresCol '${predictor.getFeaturesCol}' — use predict()")
        val order = assemblers.headOption.map(_.getInputCols.toSeq)
          .getOrElse(RequestFields)
        predictor.predict(Vectors.dense(order.map(requestValue(req, _)).toArray))
      case other => throw new IllegalArgumentException(
        s"model '$modelName' (${other.getClass.getSimpleName}) has no " +
          "local predict path — use predict()")
    }
    if (expm1Inverse) math.expm1(raw) else raw
  }
}
