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

    // Verbatim reference spellings (GeoFunctions.java annotation names as
    // written: ST_GeometryFromText, ST_Contains, ST_AsText, ...) plus the
    // Bing-tile bucketing of the same synthesized points — guards the
    // casing/underscore fidelity end-to-end.
    "g06_geo_verbatim" -> Q(
      presto("""
        WITH pts AS (
          SELECT c_custkey,
            st_point(CAST(c_custkey % 60 AS DOUBLE),
                     CAST(c_nationkey * 3 AS DOUBLE)) AS p
          FROM customer WHERE c_custkey <= 400)
        SELECT c_custkey,
          ST_Contains(ST_GeometryFromText('POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0))'), p)
            AS in_box,
          ST_AsText(p) AS wkt,
          bing_tile_quadkey(bing_tile_at(ST_Y(p), ST_X(p), 6)) AS tile_q
        FROM pts ORDER BY c_custkey"""),
      Some("""
        WITH pts AS (
          SELECT c_custkey,
            CAST(c_custkey % 60 AS DOUBLE) AS x,
            CAST(c_nationkey * 3 AS DOUBLE) AS y
          FROM customer WHERE c_custkey <= 400),
        t AS (
          SELECT c_custkey, x, y,
            CAST(floor(least(greatest((x + 180) / 360 * 16384.0, 0), 16383)) AS BIGINT) // 256 AS tx,
            CAST(floor(least(greatest(
              (0.5 - ln((1 + sin(y * pi() / 180)) / (1 - sin(y * pi() / 180))) / (4 * pi())) * 16384.0,
              0), 16383)) AS BIGINT) // 256 AS ty
          FROM pts)
        SELECT c_custkey,
          x BETWEEN 0 AND 40 AND y BETWEEN 0 AND 40 AS in_box,
          'POINT (' || CAST(CAST(x AS INTEGER) AS VARCHAR) || ' ' ||
            CAST(CAST(y AS INTEGER) AS VARCHAR) || ')' AS wkt,
          list_aggregate(list_transform(range(6, 0, -1),
            i -> CAST(((tx >> (i - 1)) & 1) + 2 * ((ty >> (i - 1)) & 1) AS VARCHAR)),
            'string_agg', '') AS tile_q
        FROM t ORDER BY c_custkey""")),

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

    // Clipping constructors over per-row rectangles (ST_Intersection /
    // ST_Union / ST_Difference / ST_SymDifference — GeoFunctions.java's
    // ESRI-backed operators, reimplemented as a slab-decomposition boolean
    // in functions/GeoClip.scala). Rectangles make every clip area exact
    // interval arithmetic, so the oracle recomputes them in pure SQL; the
    // part count crosses through the MULTIPOLYGON encoding (2 parts when
    // the rectangles are disjoint or touch only at a corner, 1 when they
    // overlap or share an edge segment).
    "g04_geo_clip" -> Q(
      presto("""
        WITH r AS (
          SELECT c_custkey,
            c_custkey % 8 AS ax, c_nationkey % 5 AS ay,
            c_custkey % 11 AS bx, c_custkey % 7 AS by
          FROM customer WHERE c_custkey <= 400),
        g AS (
          SELECT c_custkey, ax, ay, bx, by,
            st_geometry_from_text(concat('POLYGON ((',
              ax, ' ', ay, ', ', ax + 5, ' ', ay, ', ',
              ax + 5, ' ', ay + 4, ', ', ax, ' ', ay + 4, '))')) AS ra,
            st_geometry_from_text(concat('POLYGON ((',
              bx, ' ', by, ', ', bx + 3, ' ', by, ', ',
              bx + 3, ' ', by + 6, ', ', bx, ' ', by + 6, '))')) AS rb
          FROM r)
        SELECT c_custkey,
          round(st_area(st_intersection(ra, rb)), 6) AS inter_area,
          round(st_area(st_union(ra, rb)), 6) AS union_area,
          round(st_area(st_difference(ra, rb)), 6) AS diff_area,
          round(st_area(st_symdifference(ra, rb)), 6) AS sym_area,
          st_numgeometries(st_union(ra, rb)) AS union_parts
        FROM g ORDER BY c_custkey"""),
      Some("""
        WITH r AS (
          SELECT c_custkey,
            CAST(c_custkey % 8 AS DOUBLE) AS ax,
            CAST(c_nationkey % 5 AS DOUBLE) AS ay,
            CAST(c_custkey % 11 AS DOUBLE) AS bx,
            CAST(c_custkey % 7 AS DOUBLE) AS by
          FROM customer WHERE c_custkey <= 400),
        m AS (
          SELECT c_custkey,
            least(ax + 5, bx + 3) - greatest(ax, bx) AS w,
            least(ay + 4, by + 6) - greatest(ay, by) AS h
          FROM r),
        a AS (
          SELECT c_custkey,
            CASE WHEN w > 0 AND h > 0 THEN w * h ELSE 0 END AS ia,
            w, h
          FROM m)
        SELECT c_custkey,
          round(ia, 6) AS inter_area,
          round(20 + 18 - ia, 6) AS union_area,
          round(20 - ia, 6) AS diff_area,
          round(20 + 18 - 2 * ia, 6) AS sym_area,
          CASE WHEN w >= 0 AND h >= 0 AND NOT (w = 0 AND h = 0)
               THEN 1 ELSE 2 END AS union_parts
        FROM a ORDER BY c_custkey""")),

    // ST_Buffer (96-gon round joins) + line-vs-box ST_Intersection length:
    // both closed-form, so the oracle is exact arithmetic. The buffer of a
    // point is a regular 96-gon of area 48·sin(π/48)·r².
    "g05_geo_buffer" -> Q(
      presto("""
        WITH r AS (
          SELECT c_custkey,
            CAST(c_custkey % 5 + 1 AS DOUBLE) AS rad,
            CAST(c_custkey % 10 AS DOUBLE) AS lx
          FROM customer WHERE c_custkey <= 300)
        SELECT c_custkey,
          round(st_area(st_buffer(st_point(2.0, 3.0), rad)), 6) AS disk_area,
          round(st_length(st_intersection(
            st_geometry_from_text('POLYGON ((0 2, 6 2, 6 8, 0 8, 0 2))'),
            st_geometry_from_text(concat('LINESTRING (', CAST(lx AS BIGINT),
              ' 0, ', CAST(lx AS BIGINT), ' 10)')))), 6) AS clip_len
        FROM r ORDER BY c_custkey"""),
      Some("""
        WITH r AS (
          SELECT c_custkey,
            CAST(c_custkey % 5 + 1 AS DOUBLE) AS rad,
            CAST(c_custkey % 10 AS DOUBLE) AS lx
          FROM customer WHERE c_custkey <= 300)
        SELECT c_custkey,
          round(48 * sin(pi() / 48) * rad * rad, 6) AS disk_area,
          round(CASE WHEN lx <= 6 THEN 6.0 ELSE 0.0 END, 6) AS clip_len
        FROM r ORDER BY c_custkey""")),

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
