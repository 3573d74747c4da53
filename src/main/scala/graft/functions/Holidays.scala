package graft.functions

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** US federal (+ NY state) holiday calendar, generated as a dimension
  * table (SURVEY.md §2.3 J4, §4).
  *
  * The reference calls the `holidays` PyPI package
  * (`date.isin(holidays.US(years=...))`, reference
  * traffic_volume_models/SegmentedModeling.py:234-236, and
  * `holidays.US(subdiv='NY')`, backend/features.py:26-29). Here the same
  * calendar rules are implemented in pure Scala from the public statutory
  * definitions (5 U.S.C. §6103), and the dates become a *broadcast
  * dimension table*: `is_holiday` is a left-semi/left join against it,
  * never a per-row UDF — at 100 TB the calendar is a few KB while the fact
  * side streams through a broadcast hash join.
  */
object Holidays {

  private def nthWeekday(year: Int, month: Int, dow: DayOfWeek, n: Int): LocalDate =
    LocalDate.of(year, month, 1).`with`(TemporalAdjusters.dayOfWeekInMonth(n, dow))

  private def lastWeekday(year: Int, month: Int, dow: DayOfWeek): LocalDate =
    LocalDate.of(year, month, 1).`with`(TemporalAdjusters.lastInMonth(dow))

  /** US federal holidays (actual dates, no observed-shift; matches the
    * package's default `observed=True` adding shifted duplicates — we emit
    * BOTH actual and observed dates, as `holidays.US` does).
    */
  def federal(year: Int): Seq[(LocalDate, String)] = {
    val fixed = Seq(
      LocalDate.of(year, 1, 1) -> "New Year's Day",
      LocalDate.of(year, 6, 19) -> "Juneteenth National Independence Day",
      LocalDate.of(year, 7, 4) -> "Independence Day",
      LocalDate.of(year, 11, 11) -> "Veterans Day",
      LocalDate.of(year, 12, 25) -> "Christmas Day")
    val floating = Seq(
      nthWeekday(year, 1, DayOfWeek.MONDAY, 3) -> "Martin Luther King Jr. Day",
      nthWeekday(year, 2, DayOfWeek.MONDAY, 3) -> "Washington's Birthday",
      lastWeekday(year, 5, DayOfWeek.MONDAY) -> "Memorial Day",
      nthWeekday(year, 9, DayOfWeek.MONDAY, 1) -> "Labor Day",
      nthWeekday(year, 10, DayOfWeek.MONDAY, 2) -> "Columbus Day",
      nthWeekday(year, 11, DayOfWeek.THURSDAY, 4) -> "Thanksgiving")
    // Observed shifts for fixed-date holidays falling on a weekend.
    val observed = fixed.flatMap { case (d, name) =>
      d.getDayOfWeek match {
        case DayOfWeek.SATURDAY => Some(d.minusDays(1) -> s"$name (observed)")
        case DayOfWeek.SUNDAY => Some(d.plusDays(1) -> s"$name (observed)")
        case _ => None
      }
    }
    fixed ++ floating ++ observed
  }

  /** NY-state additions (subdiv='NY' in the reference's package call):
    * Lincoln's Birthday (Feb 12) and Election Day (first Tuesday after the
    * first Monday of November).
    */
  def nyState(year: Int): Seq[(LocalDate, String)] = Seq(
    LocalDate.of(year, 2, 12) -> "Lincoln's Birthday",
    nthWeekday(year, 11, DayOfWeek.MONDAY, 1).plusDays(1) -> "Election Day")

  /** Holiday dimension DataFrame over [startYear, endYear]:
    * (holiday_date: date, holiday_name: string).
    */
  def dimension(spark: SparkSession, startYear: Int, endYear: Int,
      includeNY: Boolean = false): DataFrame = {
    import spark.implicits._
    val rows = (startYear to endYear).flatMap { y =>
      federal(y) ++ (if (includeNY) nyState(y) else Nil)
    }.map { case (d, n) => (java.sql.Date.valueOf(d), n) }.distinct
    rows.toDF("holiday_date", "holiday_name")
  }

  /** Attach `is_holiday` (int 0/1) to `df` by joining `to_date(tsCol)`
    * against the broadcast holiday dimension — the Spark-native form of
    * the reference's `.apply(lambda x: x in us_holidays)` row loop.
    */
  def withIsHoliday(df: DataFrame, tsCol: String, startYear: Int, endYear: Int): DataFrame = {
    val spark = df.sparkSession
    val dim = dimension(spark, startYear, endYear)
      .select(col("holiday_date")).distinct()
      .withColumn("__is_holiday_hit", lit(1))
    df.join(broadcast(dim), to_date(col(tsCol)) === dim("holiday_date"), "left")
      .withColumn("is_holiday", coalesce(col("__is_holiday_hit"), lit(0)))
      .drop("holiday_date", "__is_holiday_hit")
  }
}
