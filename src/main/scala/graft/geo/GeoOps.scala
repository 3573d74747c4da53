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
