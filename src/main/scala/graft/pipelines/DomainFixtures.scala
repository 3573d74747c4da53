package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic generators for the reference's two domain
  * inputs (FIXTURES.md §B1/B2) — schema-faithful stand-ins for the NYC
  * DOT traffic counts and Open-Meteo weather CSVs (both LFS pointers in
  * the snapshot, so generated, never copied).
  *
  * Everything is derived arithmetically from a row index — fully
  * distributed (`spark.range`), no driver-side data, reproducible at any
  * scale factor.
  */
object DomainFixtures {

  val boroughs = Seq("Manhattan", "Brooklyn", "Queens", "Bronx", "Staten Island")
  val directions = Seq("NB", "SB", "EB", "WB")

  /** B1: traffic counts. Includes the quirks the cleaning operators must
    * handle: exact duplicate rows (P7), a non-numeric Vol value (P11),
    * multiple rows per (Yr,M,D,HH) (fan-out J2 + tie-break O1).
    */
  def traffic(spark: SparkSession, nHours: Int, rowsPerHour: Int = 4): DataFrame = {
    val boroA = array(boroughs.map(lit): _*)
    val dirA = array(directions.map(lit): _*)
    val base = spark.range(nHours.toLong * rowsPerHour)
      .withColumn("hourIdx", (col("id") / rowsPerHour).cast("long"))
      .withColumn("ts", expr("timestampadd(HOUR, hourIdx, timestamp'2024-01-01 00:00:00')"))
      .withColumn("Boro", element_at(boroA, (col("id") % 5 + 1).cast("int")))
      .withColumn("xFt", lit(913175L) + (col("id") * 7919L) % 154000L)
      .withColumn("yFt", lit(120000L) + (col("id") * 104729L) % 154000L)
    base.select(
      col("id").as("RequestID"),
      col("Boro"),
      year(col("ts")).as("Yr"), month(col("ts")).as("M"),
      dayofmonth(col("ts")).as("D"), hour(col("ts")).as("HH"),
      lit(0).as("MM"),
      // mostly numeric, occasionally junk — exercises safe coercion
      when(col("id") % 97 === 0, lit("n/a"))
        .otherwise(((col("id") * 37) % 400).cast("string")).as("Vol"),
      (col("id") % 5000).as("SegmentID"),
      concat(lit("POINT ("), col("xFt"), lit(" "), col("yFt"), lit(")")).as("WktGeom"),
      concat(lit("ST "), (col("id") % 40).cast("string")).as("street"),
      concat(lit("FROM "), (col("id") % 17).cast("string")).as("fromSt"),
      concat(lit("TO "), (col("id") % 19).cast("string")).as("toSt"),
      element_at(dirA, (col("id") % 4 + 1).cast("int")).as("Direction"))
      // exact duplicates of every 101st row (dedup P7 must collapse them)
      .union(base.filter(col("id") % 101 === 0).select(
        col("id").as("RequestID"), col("Boro"),
        year(col("ts")).as("Yr"), month(col("ts")).as("M"),
        dayofmonth(col("ts")).as("D"), hour(col("ts")).as("HH"),
        lit(0).as("MM"),
        ((col("id") * 37) % 400).cast("string").as("Vol"),
        (col("id") % 5000).as("SegmentID"),
        concat(lit("POINT ("), col("xFt"), lit(" "), col("yFt"), lit(")")).as("WktGeom"),
        concat(lit("ST "), (col("id") % 40).cast("string")).as("street"),
        concat(lit("FROM "), (col("id") % 17).cast("string")).as("fromSt"),
        concat(lit("TO "), (col("id") % 19).cast("string")).as("toSt"),
        element_at(dirA, (col("id") % 4 + 1).cast("int")).as("Direction")))
  }

  /** B2: hourly weather, 2 sample points per borough per hour (the
    * fan-out multiplier of join J2), with a deterministic heavy-snow
    * stretch and nullable snow_depth.
    */
  def weather(spark: SparkSession, nHours: Int): DataFrame = {
    val boroA = array(boroughs.map(lit): _*)
    spark.range(nHours.toLong * boroughs.size * 2)
      .withColumn("hourIdx", (col("id") / (boroughs.size * 2)).cast("long"))
      .withColumn("slot", col("id") % (boroughs.size * 2)) // borough×point
      .withColumn("date", expr("timestampadd(HOUR, hourIdx, timestamp'2024-01-01 00:00:00')"))
      .select(
        col("date"),
        (lit(40.5) + (col("slot") % 5) * 0.1 + (col("slot") / 5) * 0.01).as("latitude"),
        (lit(-74.2) + (col("slot") % 5) * 0.1).as("longitude"),
        element_at(boroA, (col("slot") % 5 + 1).cast("int")).as("borough"),
        (lit(30.0) + sin(col("hourIdx") / 24.0) * 20.0).as("temperature_2m"),
        (when(col("hourIdx") % 7 === 0, 0.2).otherwise(0.0)).as("precipitation"),
        ((col("hourIdx") % 100) / 100.0).as("cloud_cover_low"),
        // heavy-snow stretch (event mask) + nulls (null-profile P10)
        when(col("hourIdx") % 89 === 0, lit(null).cast("double"))
          .when(col("hourIdx").between(200, 230), 8.0)
          .otherwise(0.0).as("snow_depth"),
        lit(10000.0).as("visibility"),
        (col("hourIdx") % 10).cast("double").as("weather_code"),
        lit(1500.0).as("freezing_level_height"),
        (when(col("hourIdx") % 11 === 0, 0.1).otherwise(0.0)).as("rain"),
        lit(0.0).as("showers"),
        when(col("hourIdx").between(200, 230), 1.5).otherwise(0.0).as("snowfall"),
        (col("hourIdx") % 8).cast("double").as("uv_index"))
  }
}
