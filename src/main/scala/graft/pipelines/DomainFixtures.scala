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

  /** LEARNABLE hourly volume series for model-quality certification
    * (GoldenMetrics / METRICS_rN.json): one row per (hour, borough) with
    *   vol = borough base + daily double-peak harmonics
    *       + weekend dip + New-Year's-Day dip + N(0, noiseSd) noise,
    * i.e. exactly the structure the reference's published models learn
    * from the real NYC counts (hour-of-day + weekday + borough +
    * holiday; traffic_volume_models/RandomForest.py:110-115). The
    * [[traffic]] fixture's Vol is hash noise ON PURPOSE (it exercises
    * cleaning, not learnability); this one is for fitting. `noiseSd`
    * sets the irreducible error and is CALIBRATED (documented in
    * METRICS_rN.json) so the reference configs land in their published
    * R² neighborhood on data of comparable signal-to-noise — the claim
    * certified is "the same configs reach the same quality on data with
    * the same structure", which is the strongest claim a synthetic
    * fixture can carry (the real NYC CSVs are LFS pointers, FIXTURES.md).
    *
    * Noise is a deterministic hash → sum of three uniforms (Irwin–Hall,
    * near-Gaussian), so the fixture is bit-reproducible at any scale.
    */
  def trafficSeasonal(spark: SparkSession, nHours: Int,
      noiseSd: Double = 20.0): DataFrame = {
    val boroA = array(boroughs.map(lit): _*)
    // Bases keep every hour's volume well above zero: the RF baseline
    // is scored on the log1p scale, where near-zero volumes would let
    // the additive noise dominate the metric regardless of model
    // quality (real NYC hourly counts are likewise never near zero).
    val baseA = array(Seq(400.0, 330.0, 280.0, 240.0, 200.0).map(lit): _*)
    def u(mult: Long) = ((col("id") * mult) % 1048576L + 1048576L) % 1048576L / 1048576.0 - 0.5
    val noise = (u(2654435761L) + u(40503L) + u(2246822519L)) * 2.0 * noiseSd
    spark.range(nHours.toLong * boroughs.size)
      .withColumn("hourIdx", (col("id") / boroughs.size).cast("long"))
      .withColumn("date", expr("timestampadd(HOUR, hourIdx, timestamp'2024-01-01 00:00:00')"))
      .withColumn("borough", element_at(boroA, (col("id") % 5 + 1).cast("int")))
      .withColumn("__hh", hour(col("date")).cast("double"))
      .select(col("date"), col("borough"),
        greatest(lit(0.0),
          element_at(baseA, (col("id") % 5 + 1).cast("int"))
            + lit(50.0) * sin(col("__hh") * (2 * math.Pi / 24) - lit(1.5))
            + lit(25.0) * sin(col("__hh") * (4 * math.Pi / 24))
            + when(dayofweek(col("date")).isin(1, 7), -40.0).otherwise(0.0)
            + when(to_date(col("date")) === to_date(lit("2024-01-01")), -30.0)
              .otherwise(0.0)
            + noise).as("vol"))
  }

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
