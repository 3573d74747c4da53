package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lambert Conformal Conic (2SP) projection math (SURVEY.md §2.6 F16).
  *
  * The reference reprojects NYC traffic WKT points from EPSG:2263 (NAD83 /
  * New York Long Island, US survey foot) to EPSG:4326 with pyproj
  * (reference scripts/convert_traffic_csv_to_geojson_point.py:15-28). No
  * proj library exists on the zero-egress classpath, so the inverse LCC is
  * implemented from the published EPSG Guidance Note 7-2 formulas, with
  * parameters from the public EPSG registry entry for 2263.
  *
  * Spark-first: the inverse is exposed as a *pure Column expression*
  * ([[Crs.lon2263]]/[[Crs.lat2263]]) — composed entirely from built-in
  * math functions, so it stays inside whole-stage codegen (no UDF, no
  * serialization boundary), and the identical arithmetic can be rendered
  * as oracle SQL. The latitude iteration is unrolled to a fixed depth
  * ([[Lcc2sp.Iters]]) for cross-engine determinism.
  *
  * NAD83→WGS84 is treated as identity (sub-meter, standard practice at
  * this precision).
  */
final case class Lcc2sp(
    a: Double, invf: Double,
    phi1Deg: Double, phi2Deg: Double, phiFDeg: Double, lamFDeg: Double,
    falseEastingM: Double, falseNorthingM: Double) {

  import math._

  val f: Double = 1.0 / invf
  val e2: Double = 2 * f - f * f
  val e: Double = sqrt(e2)

  private def mOf(phi: Double): Double = cos(phi) / sqrt(1 - e2 * sin(phi) * sin(phi))
  private def tOf(phi: Double): Double =
    tan(Pi / 4 - phi / 2) / pow((1 - e * sin(phi)) / (1 + e * sin(phi)), e / 2)

  private val phi1 = toRadians(phi1Deg)
  private val phi2 = toRadians(phi2Deg)
  private val phiF = toRadians(phiFDeg)

  /** Cone constant. */
  val n: Double = (log(mOf(phi1)) - log(mOf(phi2))) / (log(tOf(phi1)) - log(tOf(phi2)))
  val bigF: Double = mOf(phi1) / (n * pow(tOf(phi1), n))
  /** Radius of the parallel through the false origin. */
  val rF: Double = a * bigF * pow(tOf(phiF), n)

  /** Inverse: projected meters → (lonDeg, latDeg). Fixed-depth iteration. */
  def inverse(eastM: Double, northM: Double): (Double, Double) = {
    val ep = eastM - falseEastingM
    val np = northM - falseNorthingM
    val rfn = rF - np
    val rp = signum(n) * sqrt(ep * ep + rfn * rfn)
    val tp = pow(rp / (a * bigF), 1 / n)
    val theta = atan2(ep, rfn)
    val lon = toDegrees(theta / n) + lamFDeg
    var phi = Pi / 2 - 2 * atan(tp)
    var i = 0
    while (i < Lcc2sp.Iters) {
      phi = Pi / 2 - 2 * atan(tp * pow((1 - e * sin(phi)) / (1 + e * sin(phi)), e / 2))
      i += 1
    }
    (lon, toDegrees(phi))
  }

  /** Forward: (lonDeg, latDeg) → projected meters (for roundtrip tests
    * and fixture generation; the reference only needs the inverse).
    */
  def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val phi = toRadians(latDeg)
    val r = a * bigF * pow(tOf(phi), n)
    val theta = n * toRadians(lonDeg - lamFDeg)
    (falseEastingM + r * sin(theta),
      falseNorthingM + rF - r * cos(theta))
  }
}

object Lcc2sp {
  /** Latitude-iteration depth — fixed (not convergence-tested) so Spark,
    * the Scala reference impl, and the DuckDB oracle SQL agree bit-for-bit
    * in structure. 7 iterations converges to «1e-12 rad for |φ|<80°.
    */
  val Iters = 7
}

object Crs {

  /** US survey foot in meters (exact ratio 1200/3937). */
  val FtUs: Double = 1200.0 / 3937.0

  /** EPSG:2263 — NAD83 / New York Long Island (ftUS); parameters from the
    * public EPSG registry (GRS80; lat of false origin 40°10'N, lon 74°W,
    * standard parallels 41°02'N / 40°40'N, false easting 984250 ftUS).
    */
  val Epsg2263: Lcc2sp = Lcc2sp(
    a = 6378137.0, invf = 298.257222101,
    phi1Deg = 41.0 + 2.0 / 60.0, phi2Deg = 40.0 + 40.0 / 60.0,
    phiFDeg = 40.0 + 10.0 / 60.0, lamFDeg = -74.0,
    falseEastingM = 984250.0 * FtUs, falseNorthingM = 0.0)

  // -- Column-expression inverse (codegen-friendly, oracle-renderable) ----

  private def lit17(d: Double): Column = lit(d)

  /** Shared inverse sub-expressions for a (ftUS easting, ftUS northing)
    * pair under projection `p`.
    */
  private def inv(p: Lcc2sp, xFt: Column, yFt: Column): (Column, Column) = {
    val ep = xFt * lit(FtUs) - lit17(p.falseEastingM)
    val rfn = lit17(p.rF) - (yFt * lit(FtUs) - lit17(p.falseNorthingM))
    val rp = sqrt(ep * ep + rfn * rfn) // n > 0 in the northern hemisphere
    val tp = pow(rp / lit17(p.a * p.bigF), lit(1.0 / p.n))
    val lon = degrees(atan2(ep, rfn) / lit17(p.n)) + lit(p.lamFDeg)
    val half = lit(math.Pi / 2)
    var phi: Column = half - lit(2.0) * atan(tp)
    for (_ <- 0 until Lcc2sp.Iters)
      phi = half - lit(2.0) * atan(
        tp * pow((lit(1.0) - lit17(p.e) * sin(phi)) / (lit(1.0) + lit17(p.e) * sin(phi)),
          lit(p.e / 2)))
    (lon, degrees(phi))
  }

  /** Longitude (EPSG:4326) of an EPSG:2263 (ftUS) point. */
  def lon2263(xFt: Column, yFt: Column): Column = inv(Epsg2263, xFt, yFt)._1
  /** Latitude (EPSG:4326) of an EPSG:2263 (ftUS) point. */
  def lat2263(xFt: Column, yFt: Column): Column = inv(Epsg2263, xFt, yFt)._2

  /** Attach `lonName`/`latName` columns for an EPSG:2263 (ftUS) point.
    *
    * Preferred over separate [[lon2263]]/[[lat2263]] calls on wide scans:
    * the shared inverse core (E', rF−N', t') is materialized into
    * intermediate columns, so it evaluates once per row and the generated
    * code stays small — two independent column expressions each embed the
    * full unrolled iteration (~2× the flops and a Janino compilation
    * measured in seconds). Same arithmetic, bit-identical results.
    *
    * CALLER WARNING: do not FILTER on the output columns' nullity —
    * PushPredicateThroughProject alias-substitutes the predicate through
    * every staged layer, doubling the iteration tree per layer (~2^Iters
    * copies of xFt/yFt + trig in one predicate; measured 33× on the E3
    * geo build). lon/lat are null exactly when xFt/yFt are null, so
    * filter the INPUTS before calling (GeoPipeline.buildFeatures shows
    * the shape).
    */
  def withLonLat(df: org.apache.spark.sql.DataFrame, xFt: Column, yFt: Column,
      lonName: String = "lon", latName: String = "lat",
      p: Lcc2sp = Epsg2263): org.apache.spark.sql.DataFrame = {
    val staged = df
      .withColumn("__crs_ep", xFt * lit(FtUs) - lit17(p.falseEastingM))
      .withColumn("__crs_rfn",
        lit17(p.rF) - (yFt * lit(FtUs) - lit17(p.falseNorthingM)))
      .withColumn("__crs_tp",
        pow(sqrt(col("__crs_ep") * col("__crs_ep") + col("__crs_rfn") * col("__crs_rfn"))
          / lit17(p.a * p.bigF), lit(1.0 / p.n)))
    val lon = degrees(atan2(col("__crs_ep"), col("__crs_rfn")) / lit17(p.n)) +
      lit(p.lamFDeg)
    val half = lit(math.Pi / 2)
    val tp = col("__crs_tp")
    // Each iteration's sin(φ) is staged as ITS OWN column: φ_{k+1}
    // references sin(φ_k) twice, so a nested Column expression doubles per
    // iteration (2^Iters copies). A multiply-referenced non-cheap alias
    // blocks CollapseProject, so the plan keeps a projection boundary per
    // iteration and the expression stays LINEAR in Iters — this is what
    // makes the inverse cheap even when a downstream CodegenFallback
    // consumer (e.g. to_json) would otherwise interpret the inlined tree
    // per row with no subexpression elimination (measured 5.1 s → sub-s on
    // the GeoJSON assembly query at sf0.1).
    var cur = staged.withColumn("__crs_phi", half - lit(2.0) * atan(tp))
    for (_ <- 0 until Lcc2sp.Iters) {
      cur = cur
        .withColumn("__crs_s", lit17(p.e) * sin(col("__crs_phi")))
        .withColumn("__crs_phi", half - lit(2.0) * atan(
          tp * pow((lit(1.0) - col("__crs_s")) / (lit(1.0) + col("__crs_s")),
            lit(p.e / 2))))
    }
    cur.withColumn(lonName, lon).withColumn(latName, degrees(col("__crs_phi")))
      .drop("__crs_ep", "__crs_rfn", "__crs_tp", "__crs_s", "__crs_phi")
  }

  // -- DuckDB oracle rendering (same constants, same unrolled arithmetic) --

  private def d(x: Double): String = {
    val s = java.lang.Double.toString(x) // shortest roundtrip repr
    if (s.contains("E")) s.replace("E", "e") else s
  }

  /** Oracle SQL for [[lon2263]]/[[lat2263]] over ftUS column exprs. */
  def inverseSql(p: Lcc2sp, xFt: String, yFt: String): (String, String) = {
    val ep = s"(($xFt) * ${d(FtUs)} - ${d(p.falseEastingM)})"
    val rfn = s"(${d(p.rF)} - (($yFt) * ${d(FtUs)} - ${d(p.falseNorthingM)}))"
    val rp = s"sqrt($ep * $ep + $rfn * $rfn)"
    val tp = s"pow($rp / ${d(p.a * p.bigF)}, ${d(1.0 / p.n)})"
    val lon = s"(degrees(atan2($ep, $rfn) / ${d(p.n)}) + ${d(p.lamFDeg)})"
    var phi = s"(pi() / 2 - 2 * atan($tp))"
    for (_ <- 0 until Lcc2sp.Iters)
      phi = s"(pi() / 2 - 2 * atan($tp * pow((1 - ${d(p.e)} * sin($phi)) / (1 + ${d(p.e)} * sin($phi)), ${d(p.e / 2)})))"
    (lon, s"degrees($phi)")
  }
}
