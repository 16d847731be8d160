package graft

import org.scalatest.funsuite.AnyFunSuite

/** Geometry-math assertions for the geospatial core, mirroring the
  * reference's TestGeoFunctions shapes (presto-geospatial). */
class GeoSpec extends AnyFunSuite {
  import TestSession._

  private lazy val engine = Engine(spark)

  private def one(sql: String): Any = engine.sql(s"SELECT $sql AS v").head.get(0)

  test("WKT round trip: point, linestring, polygon") {
    assert(one("st_astext(st_point(1.5, -2.5))") == "POINT (1.5 -2.5)")
    assert(one("st_astext(st_geometry_from_text('LINESTRING (0 0, 1 1, 2 0)'))")
      == "LINESTRING (0 0, 1 1, 2 0)")
    assert(one("st_astext(st_geometry_from_text('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))")
      == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
  }

  test("area, length, centroid, envelope") {
    assert(one("st_area(st_geometry_from_text('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))") == 16.0)
    // concave L-shape: 4x4 square minus 2x2 notch
    assert(one("st_area(st_geometry_from_text('POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))'))") == 12.0)
    assert(one("st_length(st_geometry_from_text('LINESTRING (0 0, 3 4)'))") == 5.0)
    assert(one("st_astext(st_centroid(st_geometry_from_text('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')))")
      == "POINT (1 1)")
    assert(one("st_astext(st_envelope(st_geometry_from_text('LINESTRING (1 2, 5 7)')))")
      == "POLYGON ((1 2, 5 2, 5 7, 1 7, 1 2))")
  }

  test("contains: boundary, concave notch, nested polygons") {
    def contains(poly: String, pt: String): Boolean =
      one(s"st_contains(st_geometry_from_text('$poly'), $pt)").asInstanceOf[Boolean]
    val square = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    assert(contains(square, "st_point(2.0, 2.0)"))
    assert(contains(square, "st_point(0.0, 2.0)")) // on boundary
    assert(!contains(square, "st_point(5.0, 2.0)"))
    val lshape = "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"
    assert(contains(lshape, "st_point(1.0, 3.0)"))
    assert(!contains(lshape, "st_point(3.0, 3.0)")) // in the notch
    // polygon-in-polygon
    assert(one(s"st_contains(st_geometry_from_text('$square'), " +
      "st_geometry_from_text('POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))'))")
      == true)
    // vertices inside but edges crossing the concave notch
    assert(one(s"st_contains(st_geometry_from_text('$lshape'), " +
      "st_geometry_from_text('POLYGON ((1 1, 3.5 0.5, 1 3.5, 1 1))'))")
      == false)
  }

  test("within, intersects, distance") {
    assert(one("st_within(st_point(1.0, 1.0), " +
      "st_geometry_from_text('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'))") == true)
    assert(one("st_intersects(st_geometry_from_text('LINESTRING (0 0, 4 4)'), " +
      "st_geometry_from_text('LINESTRING (0 4, 4 0)'))") == true)
    assert(one("st_intersects(st_geometry_from_text('LINESTRING (0 0, 1 1)'), " +
      "st_geometry_from_text('LINESTRING (3 3, 4 4)'))") == false)
    assert(one("st_distance(st_point(0.0, 0.0), st_point(3.0, 4.0))") == 5.0)
    // point to polygon edge (not vertex)
    assert(one("st_distance(st_point(2.0, 6.0), " +
      "st_geometry_from_text('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))") == 2.0)
    // intersecting geometries → 0
    assert(one("st_distance(st_geometry_from_text('LINESTRING (0 2, 4 2)'), " +
      "st_geometry_from_text('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))'))") == 0.0)
  }

  test("structural accessors") {
    assert(one("st_numpoints(st_geometry_from_text('LINESTRING (0 0, 1 1, 2 0)'))") == 3)
    assert(one("st_numpoints(st_geometry_from_text('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))") == 5)
    assert(one("st_geometrytype(st_point(0.0, 0.0))") == "POINT")
    assert(one("st_isclosed(st_geometry_from_text('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))") == true)
    assert(one("st_xmin(st_geometry_from_text('LINESTRING (1 2, 5 7)'))") == 1.0)
    assert(one("st_ymax(st_geometry_from_text('LINESTRING (1 2, 5 7)'))") == 7.0)
  }

  test("dimension/empty/coorddim/interior-ring/geometry-count accessors") {
    assert(one("st_dimension(st_point(1.0, 1.0))") == 0)
    assert(one("st_dimension(st_geometry_from_text('LINESTRING (0 0, 1 1)'))") == 1)
    assert(one("st_dimension(st_geometry_from_text('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))") == 2)
    assert(one("st_isempty(st_point(1.0, 1.0))") == false)
    assert(one("st_coorddim(st_point(1.0, 1.0))") == 2)
    assert(one("st_numinteriorring(st_geometry_from_text('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))") == 0)
    assert(one("st_numinteriorring(st_point(1.0, 1.0))") == null)
    assert(one("st_numgeometries(st_point(1.0, 1.0))") == 1)
  }

  test("line vertex accessors: start/end/pointN with 1-based NULL-OOR") {
    val line = "st_geometry_from_text('LINESTRING (0 0, 1 1, 2 0)')"
    assert(one(s"st_astext(st_startpoint($line))") == "POINT (0 0)")
    assert(one(s"st_astext(st_endpoint($line))") == "POINT (2 0)")
    assert(one(s"st_astext(st_pointn($line, 2))") == "POINT (1 1)")
    assert(one(s"st_pointn($line, 4)") == null)
    assert(one(s"st_pointn($line, 0)") == null)
    assert(one(s"st_pointn($line, -1)") == null) // negatives are OOR too
  }

  test("exterior ring, equals, disjoint") {
    assert(one("st_astext(st_exteriorring(" +
      "st_geometry_from_text('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')))") ==
      "LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)")
    // same ring, rotated start vertex and reversed orientation
    assert(one("st_equals(" +
      "st_geometry_from_text('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'), " +
      "st_geometry_from_text('POLYGON ((1 1, 1 0, 0 0, 0 1, 1 1))'))") == true)
    assert(one("st_equals(" +
      "st_geometry_from_text('LINESTRING (0 0, 1 1)'), " +
      "st_geometry_from_text('LINESTRING (1 1, 0 0)'))") == true)
    assert(one("st_equals(st_point(0.0, 0.0), st_point(0.0, 1.0))") == false)
    assert(one("st_disjoint(" +
      "st_geometry_from_text('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'), " +
      "st_geometry_from_text('POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))'))") == true)
    assert(one("st_disjoint(" +
      "st_geometry_from_text('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'), " +
      "st_point(1.0, 1.0))") == false)
    assert(one("st_geometrytype(st_linefromtext('LINESTRING (0 0, 2 2)'))") ==
      "LINESTRING")
  }
}
