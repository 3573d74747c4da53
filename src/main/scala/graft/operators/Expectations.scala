package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation suite — the validation gate a training
  * pipeline runs on every ingest drop before the data is allowed near
  * a model (the "expectations" pattern popularized by Great
  * Expectations / Deequ; both public). The reference repo validates
  * implicitly (dropna + manual dtype fixes); at 100 TB the checks must
  * be DECLARED, batched, and cheap: a silent schema drift or a 0.1%
  * null-rate regression is invisible in any sample a human looks at.
  *
  * Relationship to [[Profiling.validate]] (the r11 gate, oracle
  * q_quality_gate): validate batches arbitrary caller-supplied
  * violation AGGREGATES into one pass and stays the right tool for
  * ad-hoc constraints. This suite is the declared-expectation layer on
  * top: a typed expectation API, `n_checked` reported alongside
  * violations (so a vacuously-passing check is visible), and the two
  * check classes that CANNOT be a single aggregate expression —
  * referential integrity (an anti-join) and composite-key uniqueness
  * (a grouped pass). Row-level checks compile to the same
  * one-aggregate shape validate uses.
  *
  * Output: ONE row per expectation — (expectation, column, n_checked,
  * n_violations, pass) — so a pipeline gates on `min(pass)` and a
  * monitor trends `n_violations` per drop.
  *
  * Scale shape, by expectation class:
  *  - ROW-LEVEL (not-null, range, accepted-values, regex): folded into
  *    ONE global aggregate over one scan — each expectation is a
  *    conditional sum, all evaluated in the same codegen stage; adding
  *    an expectation adds a column, not a pass.
  *  - UNIQUENESS: one (key)-grouped aggregate; violations = rows in
  *    excess of one per key (Σ (c−1) over duplicated keys). A shuffle
  *    of the key columns only.
  *  - REFERENTIAL: a broadcast left-anti count against the dimension
  *    for the violations only — n_checked (the non-null fk count)
  *    rides the shared row-level pass, so the check adds exactly one
  *    extra job, not two. (Dimensions are broadcast-sized by
  *    definition here; a fact-sized "dimension" belongs in a shuffle
  *    join the caller writes deliberately.)
  * Row-level checks cost one scan TOTAL regardless of how many are
  * declared; uniqueness and referential each add one bounded-output
  * job. Null semantics: range/accepted/regex checks skip null values
  * (declare NotNull alongside if nulls are violations — matching the
  * public tools' convention); n_checked counts the non-null values
  * those checks actually evaluated.
  */
object Expectations {

  sealed trait Expectation
  /** `column` must contain no nulls. */
  final case class NotNull(column: String) extends Expectation
  /** Non-null values of `column` must lie in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Expectation
  /** Non-null values of `column` must be one of `values`. */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Expectation
  /** Non-null values of `column` must match `regex` (RLIKE, i.e.
    * unanchored — anchor explicitly for full-string matches). */
  final case class MatchesRegex(column: String, regex: String)
      extends Expectation
  /** The tuple of `columns` must be unique across rows. */
  final case class Unique(columns: Seq[String]) extends Expectation
  /** Non-null values of `column` must appear in `dimColumn` of the
    * (broadcast-sized) `dim` table. */
  final case class ReferentialIn(column: String, dim: DataFrame,
      dimColumn: String) extends Expectation

  private case class RowCheck(name: String, column: String,
      checked: Column, violated: Column)

  /** Evaluate `expectations` against `df`; returns one row per
    * expectation in declaration order: (expectation, column,
    * n_checked, n_violations, pass).
    */
  def check(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "need >= 1 expectation")
    val spark = df.sparkSession
    // 1) row-level checks: one aggregate, one scan. Results are keyed
    // by DECLARATION INDEX, not the rendered name — two expectations
    // that render to the same label (e.g. AcceptedValues(c, Seq("a|b"))
    // vs AcceptedValues(c, Seq("a", "b"))) must not collide.
    val rowChecks: Seq[(Int, RowCheck)] = expectations.zipWithIndex.collect {
      case (NotNull(c), i) =>
        i -> RowCheck("not_null", c, lit(true), col(c).isNull)
      case (InRange(c, lo, hi), i) =>
        i -> RowCheck(s"in_range[$lo,$hi]", c, col(c).isNotNull,
          col(c).isNotNull && !(col(c) >= lo && col(c) <= hi))
      case (AcceptedValues(c, vs), i) =>
        i -> RowCheck(s"accepted_values[${vs.mkString("|")}]", c,
          col(c).isNotNull,
          col(c).isNotNull && !col(c).cast("string").isInCollection(vs))
      case (MatchesRegex(c, re), i) =>
        i -> RowCheck(s"matches_regex[$re]", c, col(c).isNotNull,
          col(c).isNotNull && !col(c).cast("string").rlike(re))
      // referential n_checked (= non-null fk count) rides the same
      // single row-level pass; only the violation count needs the
      // anti-join job below
      case (ReferentialIn(c, _, dc), i) =>
        i -> RowCheck(s"referential_in[$dc]", c, col(c).isNotNull,
          lit(false))
    }
    val rowResults: Map[Int, (Long, Long)] =
      if (rowChecks.isEmpty) Map.empty
      else {
        val aggs = rowChecks.zipWithIndex.flatMap { case ((_, rc), j) =>
          Seq(sum(rc.checked.cast("long")).as(s"__n$j"),
            sum(rc.violated.cast("long")).as(s"__v$j"))
        }
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        rowChecks.zipWithIndex.map { case ((declIdx, _), j) =>
          declIdx ->
            (if (r.isNullAt(2 * j)) 0L else r.getLong(2 * j),
             if (r.isNullAt(2 * j + 1)) 0L else r.getLong(2 * j + 1))
        }.toMap
      }
    // 2+3) uniqueness / referential: one bounded job each
    def uniqueResult(cols: Seq[String]): (Long, Long) = {
      val g = df.na.drop(cols).groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c")), lit(0L)).as("__n"),
          coalesce(sum(col("__c") - 1), lit(0L)).as("__v"))
        .head()
      (g.getLong(0), g.getLong(1))
    }
    def refViolations(c: String, dim: DataFrame, dc: String): Long =
      df.filter(col(c).isNotNull).select(col(c).as("__k"))
        .join(broadcast(dim.select(col(dc).as("__k")).distinct()),
          Seq("__k"), "left_anti")
        .count()
    val rowCheckNames: Map[Int, RowCheck] = rowChecks.toMap
    val rows = expectations.zipWithIndex.map {
      case (Unique(cols), _) =>
        val (n, v) = uniqueResult(cols)
        ("unique", cols.mkString(","), n, v)
      case (ReferentialIn(c, dim, dc), i) =>
        val (n, _) = rowResults(i)
        (rowCheckNames(i).name, c, n, refViolations(c, dim, dc))
      case (_, i) =>
        val rc = rowCheckNames(i)
        val (n, v) = rowResults(i)
        (rc.name, rc.column, n, v)
    }
    import spark.implicits._
    rows.toDF("expectation", "column", "n_checked", "n_violations")
      .withColumn("pass", col("n_violations") === 0L)
  }
}
