package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature construction (SURVEY.md §2.6 F14/F15, §2.8 assembly).
  *
  * One-hot encoding follows the reference's `pd.get_dummies(...,
  * drop_first=True)` (reference backend/features.py:51-52): explicit
  * `when(col === v, 1)` columns with stable, value-derived names — chosen
  * over MLlib's StringIndexer+OneHotEncoder so column names (and thus the
  * DuckDB oracle) are deterministic and order-independent. The value list
  * is passed explicitly: at 100 TB, collecting distinct values per batch
  * is a separate (cheap, aggregate-only) step the caller controls.
  */
object Featurize {

  /** F15: one-hot columns `<prefix>_<value>` for each value; with
    * `dropFirst` the alphabetically-first value is omitted (the
    * reference's `drop_first=True` collinearity guard).
    */
  def oneHot(df: DataFrame, colName: String, values: Seq[String],
      prefix: String, dropFirst: Boolean = true): DataFrame = {
    val kept = if (dropFirst) values.sorted.drop(1) else values.sorted
    kept.foldLeft(df) { (d, v) =>
      d.withColumn(s"${prefix}_$v", (col(colName) === lit(v)).cast("int"))
    }
  }

  /** F14: pairwise interaction features `<a>_x_<b> = a * b` (reference
    * backend/features.py:31-40 — precip×is_winter etc.). Pure column
    * arithmetic; stays inside whole-stage codegen.
    */
  def withInteractions(df: DataFrame, pairs: Seq[(String, String)]): DataFrame =
    pairs.foldLeft(df) { case (d, (a, b)) =>
      d.withColumn(s"${a}_x_$b", col(a) * col(b))
    }

  /** Assemble feature columns into an MLlib vector column. */
  def assembler(features: Seq[String], outputCol: String = "features"): VectorAssembler =
    new VectorAssembler().setInputCols(features.toArray).setOutputCol(outputCol)
      .setHandleInvalid("skip")
}
