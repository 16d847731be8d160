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

  private def g(wkt: String): String = s"st_geometry_from_text('$wkt')"

  test("convex hull: square from scattered points, collinear, single point") {
    // hull of an L-shape ring: the notch vertex (2,2) drops, the re-entrant
    // corner closes with the (4,2)-(2,4) chord
    assert(one(s"st_astext(st_convexhull(${g("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")}))")
      == "POLYGON ((0 0, 4 0, 4 2, 2 4, 0 4, 0 0))")
    // zig-zag line: hull is the bounding triangle-ish polygon
    assert(one(s"st_astext(st_convexhull(${g("LINESTRING (0 0, 1 3, 2 0, 3 3, 4 0)")}))")
      == "POLYGON ((0 0, 4 0, 3 3, 1 3, 0 0))")
    // collinear points degrade to the extent linestring
    assert(one(s"st_astext(st_convexhull(${g("LINESTRING (0 0, 1 1, 3 3)")}))")
      == "LINESTRING (0 0, 3 3)")
    assert(one("st_astext(st_convexhull(st_point(2.0, 2.0)))") == "POINT (2 2)")
    // hull area: L-shape (12) plus the chord triangle (2)
    assert(one(s"st_area(st_convexhull(${g("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")}))")
      == 14.0)
  }

  test("boundary: polygon ring, line endpoints, closed line, point") {
    // reference renderings (TestGeoFunctions.java:482-489): polygon
    // boundary is a MULTILINESTRING, line endpoints print with inner
    // parens, a point's boundary is MULTIPOINT EMPTY
    assert(one(s"st_astext(st_boundary(${g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")}))")
      == "MULTILINESTRING ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert(one(s"st_astext(st_boundary(${g("LINESTRING (0 0, 5 5)")}))")
      == "MULTIPOINT ((0 0), (5 5))")
    assert(one(s"st_astext(st_boundary(${g("LINESTRING (0 0, 1 0, 1 1, 0 0)")}))")
      == "MULTIPOINT EMPTY")
    assert(one("st_astext(st_boundary(st_point(3.0, 4.0)))")
      == "MULTIPOINT EMPTY")
  }

  test("envelope-as-points, geometries, geometryN, interior rings") {
    assert(one(s"transform(st_envelopeaspts(${g("LINESTRING (1 7, 5 2)")}), p -> st_astext(p))")
      == Seq("POINT (1 2)", "POINT (5 7)"))
    assert(one(s"transform(st_geometries(st_point(1.0, 2.0)), p -> st_astext(p))")
      == Seq("POINT (1 2)"))
    assert(one(s"st_astext(st_geometryn(st_point(1.0, 2.0), 1))") == "POINT (1 2)")
    assert(one(s"st_geometryn(st_point(1.0, 2.0), 2)") == null)
    assert(one(s"st_geometryn(st_point(1.0, 2.0), 0)") == null)
    // single-ring model: no holes
    assert(one(s"st_interiorringn(${g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")}, 1)") == null)
    assert(one(s"st_interiorrings(${g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")})")
      == Seq.empty)
    intercept[Exception](one("st_interiorringn(st_point(1.0, 1.0), 1)"))
  }

  test("issimple / isring / isvalid") {
    assert(one(s"st_issimple(${g("LINESTRING (0 0, 1 1, 2 0)")})") == true)
    // bowtie self-intersection
    assert(one(s"st_issimple(${g("LINESTRING (0 0, 2 2, 2 0, 0 2)")})") == false)
    assert(one(s"st_issimple(${g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")})") == true)
    assert(one(s"st_issimple(${g("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")})") == false)
    assert(one("st_issimple(st_point(1.0, 1.0))") == true)
    assert(one(s"st_isring(${g("LINESTRING (0 0, 1 0, 1 1, 0 0)")})") == true)
    assert(one(s"st_isring(${g("LINESTRING (0 0, 1 0, 1 1)")})") == false) // open
    // closed but self-crossing → not a ring
    assert(one(s"st_isring(${g("LINESTRING (0 0, 2 2, 2 0, 0 2, 0 0)")})") == false)
    assert(one(s"st_isvalid(${g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")})") == true)
    assert(one(s"st_isvalid(${g("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")})") == false)
    assert(one(s"st_isvalid(${g("LINESTRING (0 0, 1 1)")})") == true)
  }

  test("touches: shared boundary without interior overlap") {
    val left = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    val right = "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))" // shares the x=2 edge
    val overlapping = "POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))"
    val far = "POLYGON ((9 9, 10 9, 10 10, 9 10, 9 9))"
    assert(one(s"st_touches(${g(left)}, ${g(right)})") == true)
    assert(one(s"st_touches(${g(left)}, ${g(overlapping)})") == false)
    assert(one(s"st_touches(${g(left)}, ${g(far)})") == false)
    // corner-only contact still touches
    val corner = "POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))"
    assert(one(s"st_touches(${g(left)}, ${g(corner)})") == true)
    // point on the boundary touches; point inside does not
    assert(one(s"st_touches(${g(left)}, st_point(2.0, 1.0))") == true)
    assert(one(s"st_touches(${g(left)}, st_point(1.0, 1.0))") == false)
    // line ending on the boundary touches; line crossing into it does not
    assert(one(s"st_touches(${g(left)}, ${g("LINESTRING (2 1, 5 1)")})") == true)
    assert(one(s"st_touches(${g(left)}, ${g("LINESTRING (1 1, 5 1)")})") == false)
  }

  test("crosses: line through polygon, proper line crossing") {
    val square = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    assert(one(s"st_crosses(${g("LINESTRING (-1 1, 3 1)")}, ${g(square)})") == true)
    assert(one(s"st_crosses(${g(square)}, ${g("LINESTRING (-1 1, 3 1)")})") == true)
    // fully inside → not crosses (no exterior point)
    assert(one(s"st_crosses(${g("LINESTRING (0.5 1, 1.5 1)")}, ${g(square)})") == false)
    // along the boundary → interiors never meet
    assert(one(s"st_crosses(${g("LINESTRING (0 0, 2 0)")}, ${g(square)})") == false)
    // X-crossing lines cross; collinear overlap does not (that's overlaps)
    assert(one(s"st_crosses(${g("LINESTRING (0 0, 2 2)")}, ${g("LINESTRING (0 2, 2 0)")})") == true)
    assert(one(s"st_crosses(${g("LINESTRING (0 0, 2 0)")}, ${g("LINESTRING (1 0, 3 0)")})") == false)
    // polygon-polygon never crosses
    assert(one(s"st_crosses(${g(square)}, ${g("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")})") == false)
    // a single long segment through a thin spike: no vertex or midpoint
    // lands inside, but the proper edge crossings prove the crossing
    val spike = "POLYGON ((0 0, 10 0, 10 0.1, 0.2 0.1, 0 0))"
    assert(one(s"st_crosses(${g("LINESTRING (5 -5, 5.02 5)")}, ${g(spike)})") == true)
  }

  test("concave ring whose vertex-centroid falls outside itself") {
    // C-shape opening left: big square minus the notch [-2,2]x[-1,2]. Its
    // vertex-centroid (0.25, 0.5) lies in the NOTCH — outside the C but
    // inside the unit square below — so an unguarded centroid probe would
    // report interior overlap for two disjoint geometries.
    val c = "POLYGON ((-2 -2, 3 -2, 3 3, -2 3, -2 2, 2 2, 2 -1, -2 -1))"
    val unit = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    assert(one(s"st_overlaps(${g(c)}, ${g(unit)})") == false)
    assert(one(s"st_overlaps(${g(unit)}, ${g(c)})") == false)
    assert(one(s"st_touches(${g(c)}, ${g(unit)})") == false)
    assert(one(s"st_disjoint(${g(c)}, ${g(unit)})") == true)
    // sanity: the C really does overlap something crossing its arm
    assert(one(s"st_overlaps(${g(c)}, ${g("POLYGON ((1 -3, 4 -3, 4 0, 1 0, 1 -3))")})") == true)
  }

  test("overlaps: partial same-dimension overlap only") {
    val a = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    val b = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"
    val inner = "POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))"
    assert(one(s"st_overlaps(${g(a)}, ${g(b)})") == true)
    assert(one(s"st_overlaps(${g(a)}, ${g(a)})") == false) // equal
    assert(one(s"st_overlaps(${g(a)}, ${g(inner)})") == false) // contained
    // touching edge only → no interior overlap
    assert(one(s"st_overlaps(${g(a)}, ${g("POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))")})") == false)
    // collinear partial line overlap
    assert(one(s"st_overlaps(${g("LINESTRING (0 0, 2 0)")}, ${g("LINESTRING (1 0, 3 0)")})") == true)
    assert(one(s"st_overlaps(${g("LINESTRING (0 0, 2 0)")}, ${g("LINESTRING (0 0, 2 0)")})") == false)
    // different dimensions never overlap
    assert(one(s"st_overlaps(${g(a)}, ${g("LINESTRING (-1 1, 3 1)")})") == false)
  }
}
