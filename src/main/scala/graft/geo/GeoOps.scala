package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial scalar kit (SURVEY.md §2.6 F1/F2/F19/F20).
  *
  * All pure built-in expressions — no UDFs, everything codegen'd.
  */
object GeoOps {

  /** F1/F2: parse `"POINT (x y)"` WKT into its two coordinates (the
    * reference strips the literal text then splits,
    * backend/raw_merge.py:15-17). regexp_extract keeps it null-safe: a
    * malformed WKT yields an empty capture → null after cast.
    */
  private val WktPoint = "POINT \\(([-0-9.Ee+]+) ([-0-9.Ee+]+)\\)"
  def wktPointX(wkt: Column): Column =
    nullif(regexp_extract(wkt, WktPoint, 1), lit("")).cast("double")
  def wktPointY(wkt: Column): Column =
    nullif(regexp_extract(wkt, WktPoint, 2), lit("")).cast("double")

  /** F19: GeoJSON Point Feature assembly (reference
    * convert_traffic_csv_to_geojson_point.py:29-46). Coordinates are
    * pre-formatted to 6 dp strings→double so serialization is
    * cross-engine stable; `props` supplies the properties struct.
    */
  def pointFeature(lon: Column, lat: Column, props: Column): Column =
    to_json(struct(
      lit("Feature").as("type"),
      struct(
        lit("Point").as("type"),
        array(lon, lat).as("coordinates")).as("geometry"),
      props.as("properties")))

  /** Even-odd (ray casting) point-in-polygon test against a FIXED
    * polygon, unrolled to pure column math: one straddle-and-crossing
    * boolean per edge, XOR-folded — odd crossing count ⇔ inside. No
    * UDF, no geometry library; the whole predicate is one codegen'd
    * expression whose constants are embedded literals, so any engine
    * given the same literals computes the identical boolean (concave
    * polygons included — that's what even-odd buys over winding-number
    * shortcuts).
    *
    * The `(y1 > y) ≠ (y2 > y)` straddle guard also makes the
    * horizontal-edge division-by-zero benign: the crossing term is only
    * REACHED when y1 ≠ y2, and when it isn't, IEEE ±inf falls out of a
    * `&& false` — no ANSI error (double division never throws).
    *
    * For polygon SETS (many zones), replicate points into a zone-grid
    * join first (the [[SpatialJoin]] cell pattern) and apply this
    * per-zone predicate on the matched candidates.
    */
  def pointInPolygon(x: Column, y: Column,
      poly: Seq[(Double, Double)]): Column = {
    require(poly.size >= 3, "polygon needs at least 3 vertices")
    val edges = poly.zip(poly.tail :+ poly.head)
    edges.map { case ((x1, y1), (x2, y2)) =>
      ((lit(y1) > y) =!= (lit(y2) > y)) &&
        (x < lit(x2 - x1) * (y - lit(y1)) / lit(y2 - y1) + lit(x1))
    }.reduce(_ =!= _)
  }

  /** SQL rendering of [[pointInPolygon]] for an oracle — generated from
    * the SAME vertex Seq so the two engines consume identical
    * shortest-roundtrip double literals and the identical XOR fold.
    */
  def pointInPolygonSql(x: String, y: String,
      poly: Seq[(Double, Double)]): String = {
    val edges = poly.zip(poly.tail :+ poly.head)
    edges.map { case ((x1, y1), (x2, y2)) =>
      s"((($y1 > $y) <> ($y2 > $y)) AND ($x < ${x2 - x1} * ($y - $y1) / ${y2 - y1} + $x1))"
    }.reduce((a, b) => s"($a <> $b)")
  }

  /** Great-circle (haversine) distance in meters — pure trig column
    * math, codegen'd; cross-engine agreement is ulp-level (Java Math vs
    * libm), far inside a 6-dp round.
    */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val rad = math.Pi / 180.0
    val dLat = (lat2 - lat1) * lit(rad)
    val dLon = (lon2 - lon1) * lit(rad)
    val a = pow(sin(dLat / 2), 2) +
      cos(lat1 * lit(rad)) * cos(lat2 * lit(rad)) * pow(sin(dLon / 2), 2)
    lit(2.0 * 6371000.0) * asin(sqrt(a))
  }

  /** F19b: GeoJSON LineString Feature assembly (reference
    * point_to_linestring.py:67-75 — emits a LineString Feature from the
    * matched edge's coordinate list, properties carried through).
    * `coords` is an array<array<double>> column of [lon, lat] pairs;
    * callers pre-round coordinates (6 dp convention) so serialization is
    * cross-engine stable.
    */
  def lineFeature(coords: Column, props: Column): Column =
    to_json(struct(
      lit("Feature").as("type"),
      struct(
        lit("LineString").as("type"),
        coords.as("coordinates")).as("geometry"),
      props.as("properties")))

  /** F20: parse a stringified python tuple key `"('A', 'B', 'C')"` into
    * its three parts (the reference `eval`s these map keys,
    * point_to_linestring.py:34 — we parse, never eval).
    */
  private val Tup3 = "\\('([^']*)',\\s*'([^']*)',\\s*'([^']*)'\\)"
  def tupleKeyPart(key: Column, i: Int): Column = {
    require(i >= 1 && i <= 3)
    regexp_extract(key, Tup3, i)
  }
}
