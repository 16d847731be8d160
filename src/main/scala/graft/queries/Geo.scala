package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Engine, Q}

/** Geospatial surface (presto-geospatial/GeoFunctions.java +
  * SpatialJoinOperator.java:1 / TransformSpatialPredicates.java).
  *
  * g01 exercises the scalar ST_* core; g02 is the spatial-join shape: a
  * small polygon side broadcast against a large point side with an
  * ST_Contains predicate — Spark plans it as BroadcastNestedLoopJoin, the
  * same replicated distribution the reference's SpatialJoinOperator uses
  * (build R-tree replicated, probe streamed). At 100 TB the polygon side
  * stays broadcast-sized (zones/regions are small by nature); a grid-cell
  * pre-join (assign points + polygons to cells, equi-join on cell, then
  * exact predicate) is the shuffle-based scale path and composes from the
  * same predicates.
  */
object Geo {

  private def presto(text: String): (SparkSession, String) => DataFrame =
    (s, d) => Engine.cached(s, d).sql(text)

  val queries: Map[String, Q] = Map(

    // Scalar ST_* functions over synthesized points (deterministic integer
    // coordinates — exact in both engines).
    "g01_geo_scalar" -> Q(
      presto("""
        WITH pts AS (
          SELECT c_custkey,
            st_point(CAST(c_custkey % 100 AS DOUBLE),
                     CAST(c_nationkey * 4 AS DOUBLE)) AS p
          FROM customer WHERE c_custkey <= 500)
        SELECT c_custkey,
          st_x(p) AS x, st_y(p) AS y,
          round(st_distance(p, st_point(50.0, 50.0)), 6) AS d_center,
          st_contains(
            st_geometry_from_text('POLYGON ((0 0, 60 0, 60 60, 0 60, 0 0))'),
            p) AS in_box,
          st_astext(st_centroid(
            st_geometry_from_text('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')))
            AS box_centroid,
          round(st_area(
            st_geometry_from_text('POLYGON ((0 0, 7 0, 7 3, 0 3, 0 0))')), 6)
            AS rect_area,
          round(st_length(
            st_geometry_from_text('LINESTRING (0 0, 3 4, 3 8)')), 6) AS line_len
        FROM pts ORDER BY c_custkey"""),
      Some("""
        WITH pts AS (
          SELECT c_custkey,
            CAST(c_custkey % 100 AS DOUBLE) AS x,
            CAST(c_nationkey * 4 AS DOUBLE) AS y
          FROM customer WHERE c_custkey <= 500)
        SELECT c_custkey, x, y,
          round(sqrt((x - 50) * (x - 50) + (y - 50) * (y - 50)), 6) AS d_center,
          x BETWEEN 0 AND 60 AND y BETWEEN 0 AND 60 AS in_box,
          'POINT (5 5)' AS box_centroid,
          21.0 AS rect_area,
          9.0 AS line_len
        FROM pts ORDER BY c_custkey""")),

    // Spatial join: customers-as-points against 5 broadcast zone polygons
    // via ST_Contains (SpatialJoinOperator's replicated build side).
    // Structural accessors over per-row constructed linestrings: dimension,
    // point count, start/Nth vertex extraction, length, emptiness,
    // disjointness. The oracle recomputes every value closed-form from the
    // source columns (dimension/count are constants of the construction,
    // vertices echo the inputs, length is the two-segment hypotenuse sum).
    "g03_geo_accessors" -> Q(
      presto("""
        WITH g AS (
          SELECT c_custkey,
            st_geometry_from_text(concat('LINESTRING (0 0, ',
              CAST(c_custkey % 7 + 1 AS STRING), ' ',
              CAST(c_nationkey + 1 AS STRING), ', 10 5)')) AS line
          FROM customer WHERE c_custkey <= 300)
        SELECT c_custkey,
          st_dimension(line) AS dim,
          st_numpoints(line) AS np,
          st_astext(st_startpoint(line)) AS sp,
          st_astext(st_pointn(line, 2)) AS p2,
          st_pointn(line, 9) IS NULL AS oor_null,
          round(st_length(line), 6) AS len,
          st_isempty(line) AS empty,
          st_disjoint(line, st_point(-5.0, -5.0)) AS far_disjoint
        FROM g ORDER BY c_custkey"""),
      Some("""
        WITH g AS (
          SELECT c_custkey,
            CAST(c_custkey % 7 + 1 AS DOUBLE) AS x,
            CAST(c_nationkey + 1 AS DOUBLE) AS y
          FROM customer WHERE c_custkey <= 300)
        SELECT c_custkey,
          CAST(1 AS INT) AS dim,
          CAST(3 AS INT) AS np,
          'POINT (0 0)' AS sp,
          'POINT (' || CAST(CAST(x AS BIGINT) AS VARCHAR) || ' ' ||
            CAST(CAST(y AS BIGINT) AS VARCHAR) || ')' AS p2,
          true AS oor_null,
          round(sqrt(x * x + y * y) +
            sqrt((10 - x) * (10 - x) + (5 - y) * (5 - y)), 6) AS len,
          false AS empty,
          true AS far_disjoint
        FROM g ORDER BY c_custkey"""),
    ),

    "g02_spatial_join" -> Q(
      presto("""
        WITH zones AS (
          SELECT z, st_geometry_from_text(concat(
            'POLYGON ((', z * 20, ' 0, ', z * 20 + 20, ' 0, ',
            z * 20 + 20, ' 50, ', z * 20, ' 50, ', z * 20, ' 0))')) AS poly
          FROM VALUES (0), (1), (2), (3), (4) AS t(z)),
        pts AS (
          SELECT c_custkey,
            st_point(CAST(c_custkey % 100 AS DOUBLE),
                     CAST(c_nationkey * 2 AS DOUBLE)) AS p
          FROM customer)
        SELECT z,
          count(*) AS n_in_zone,
          sum(c_custkey) AS custkey_sum
        FROM zones JOIN pts ON st_contains(poly, p)
        GROUP BY z ORDER BY z"""),
      Some("""
        WITH pts AS (
          SELECT c_custkey,
            CAST(c_custkey % 100 AS DOUBLE) AS x,
            CAST(c_nationkey * 2 AS DOUBLE) AS y
          FROM customer)
        SELECT t.z,
          count(*) AS n_in_zone,
          CAST(sum(c_custkey) AS BIGINT) AS custkey_sum
        FROM range(0, 5) t(z) JOIN pts
          ON x >= t.z * 20 AND x <= t.z * 20 + 20 AND y BETWEEN 0 AND 50
        GROUP BY t.z ORDER BY t.z"""))
  )
}
