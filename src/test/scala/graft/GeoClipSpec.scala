package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GeoM

/** Clipping constructors (ST_Union / ST_Intersection / ST_Difference /
  * ST_SymDifference / ST_Buffer) against the reference's own test
  * vectors (presto-geospatial/.../TestGeoFunctions.java — testSTUnion:805,
  * testSTIntersection:558, testSTDifference:524, testSTSymmetricDifference
  * :586, testSTBuffer:110). The reference's backing library (ESRI) makes
  * arbitrary choices of part order / ring rotation in its output text, so
  * assertions compare canonicalized geometry (same point set, same ring
  * multiset) rather than raw strings; a handful of cases where the
  * canonical form is the reference text byte-for-byte are pinned exactly.
  */
class GeoClipSpec extends AnyFunSuite {
  import TestSession._

  private lazy val engine = Engine(spark)

  private def one(sql: String): Any = engine.sql(s"SELECT $sql AS v").head.get(0)

  private def g(wkt: String): String = s"st_geometry_from_text('$wkt')"

  /** Canonical WKT: parse → canonical encode → render. */
  private def canon(wkt: String): String = {
    val (t, xs, ys) = GeoM.parse(wkt)
    val (ct, cxs, cys) = GeoM.encode(GeoM.decode(t, xs, ys))
    if (xs.isEmpty) GeoM.render(t, xs, ys) else GeoM.render(ct, cxs, cys)
  }

  private def assertGeom(actualSql: String, expectedWkt: String): Unit = {
    val actual = one(s"st_astext($actualSql)").asInstanceOf[String]
    assert(canon(actual) == canon(expectedWkt),
      s"\n  actual:   $actual\n  expected: $expectedWkt")
  }

  private def union(a: String, b: String, expect: String): Unit = {
    assertGeom(s"st_union(${g(a)}, ${g(b)})", expect)
    assertGeom(s"st_union(${g(b)}, ${g(a)})", expect)
  }

  test("ST_Difference: the reference's vectors") {
    assertGeom(s"st_difference(${g("POINT (50 100)")}, ${g("POINT (150 150)")})",
      "POINT (50 100)")
    assertGeom(s"st_difference(${g("MULTIPOINT (50 100, 50 200)")}, ${g("POINT (50 100)")})",
      "POINT (50 200)")
    assertGeom(s"st_difference(${g("LINESTRING (50 100, 50 200)")}, ${g("LINESTRING (50 50, 50 150)")})",
      "LINESTRING (50 150, 50 200)")
    assertGeom(
      s"st_difference(${g("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))")}, ${g("MULTILINESTRING ((2 1, 4 1), (3 3, 7 3))")})",
      "MULTILINESTRING ((1 1, 2 1), (4 1, 5 1), (2 4, 4 4))")
    assertGeom(
      s"st_difference(${g("POLYGON ((1 1, 1 4, 4 4, 4 1))")}, ${g("POLYGON ((2 2, 2 5, 5 5, 5 2))")})",
      "POLYGON ((1 1, 4 1, 4 2, 2 2, 2 4, 1 4, 1 1))")
    // overlapping multipolygon parts cancel even-odd before the op
    assertGeom(
      s"st_difference(${g("MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1)), ((0 0, 0 2, 2 2, 2 0)))")}, ${g("POLYGON ((0 1, 3 1, 3 3, 0 3, 0 1))")})",
      "POLYGON ((1 1, 0 1, 0 0, 2 0, 2 1, 1 1))")
  }

  test("ST_Intersection: the reference's vectors") {
    assertGeom(s"st_intersection(${g("POINT (50 100)")}, ${g("POINT (150 150)")})",
      "MULTIPOLYGON EMPTY")
    assertGeom(s"st_intersection(${g("MULTIPOINT (50 100, 50 200)")}, ${g("POINT (50 100)")})",
      "POINT (50 100)")
    assertGeom(s"st_intersection(${g("LINESTRING (50 100, 50 200)")}, ${g("LINESTRING (20 150, 100 150)")})",
      "POINT (50 150)")
    assertGeom(
      s"st_intersection(${g("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))")}, ${g("MULTILINESTRING ((3 4, 6 4), (5 0, 5 4))")})",
      "GEOMETRYCOLLECTION (POINT (5 1), LINESTRING (3 4, 4 4))")
    assertGeom(
      s"st_intersection(${g("POLYGON ((1 1, 1 3, 3 3, 3 1))")}, ${g("POLYGON ((4 4, 4 5, 5 5, 5 4))")})",
      "MULTIPOLYGON EMPTY")
    // overlapping input parts leave an even-odd hole; its boundary inside
    // the clip region surfaces as a 1-D residue
    assertGeom(
      s"st_intersection(${g("MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1)), ((0 0, 0 2, 2 2, 2 0)))")}, ${g("POLYGON ((0 1, 3 1, 3 3, 0 3))")})",
      "GEOMETRYCOLLECTION (LINESTRING (1 1, 2 1), MULTIPOLYGON (((0 1, 1 1, 1 2, 0 2, 0 1)), ((2 1, 3 1, 3 3, 1 3, 1 2, 2 2, 2 1))))")
    assertGeom(
      s"st_intersection(${g("POLYGON ((1 1, 1 4, 4 4, 4 1))")}, ${g("LINESTRING (2 0, 2 3)")})",
      "LINESTRING (2 1, 2 3)")
    assertGeom(
      s"st_intersection(${g("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))")}, ${g("LINESTRING (0 0, 1 -1, 1 2)")})",
      "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (1 0, 1 1))")
  }

  test("ST_SymDifference: the reference's vectors") {
    assertGeom(s"st_symdifference(${g("POINT (50 100)")}, ${g("POINT (50 150)")})",
      "MULTIPOINT ((50 100), (50 150))")
    assertGeom(s"st_symdifference(${g("MULTIPOINT (50 100, 60 200)")}, ${g("MULTIPOINT (60 200, 70 150)")})",
      "MULTIPOINT ((50 100), (70 150))")
    assertGeom(s"st_symdifference(${g("LINESTRING (50 100, 50 200)")}, ${g("LINESTRING (50 50, 50 150)")})",
      "MULTILINESTRING ((50 50, 50 100), (50 150, 50 200))")
    assertGeom(
      s"st_symdifference(${g("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))")}, ${g("MULTILINESTRING ((3 4, 6 4), (5 0, 5 4))")})",
      "MULTILINESTRING ((5 0, 5 1), (1 1, 5 1), (5 1, 5 4), (2 4, 3 4), (4 4, 5 4), (5 4, 6 4))")
    assertGeom(
      s"st_symdifference(${g("POLYGON ((1 1, 1 4, 4 4, 4 1))")}, ${g("POLYGON ((2 2, 2 5, 5 5, 5 2))")})",
      "MULTIPOLYGON (((1 1, 4 1, 4 2, 2 2, 2 4, 1 4, 1 1)), ((4 2, 5 2, 5 5, 2 5, 2 4, 4 4, 4 2)))")
    assertGeom(
      s"st_symdifference(${g("MULTIPOLYGON (((0 0 , 0 2, 2 2, 2 0)), ((2 2, 2 4, 4 4, 4 2)))")}, ${g("POLYGON ((0 0, 0 3, 3 3, 3 0))")})",
      "MULTIPOLYGON (((2 0, 3 0, 3 2, 2 2, 2 0)), ((0 2, 2 2, 2 3, 0 3, 0 2)), ((3 2, 4 2, 4 4, 2 4, 2 3, 3 3, 3 2)))")
  }

  test("ST_Union: the reference's vectors") {
    // empty ∪ x = x, self ∪ self = self
    val simples = Seq(
      "POINT (1 2)",
      "MULTIPOINT ((1 2), (3 4))",
      "LINESTRING (0 0, 2 2, 4 4)",
      "MULTILINESTRING ((0 0, 2 2, 4 4), (5 5, 7 7, 9 9))",
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
      "MULTIPOLYGON (((1 1, 3 1, 3 3, 1 3, 1 1)), ((2 4, 6 4, 6 6, 2 6, 2 4)))")
    simples.foreach { s =>
      union("POINT EMPTY", s, s)
      union("MULTIPOLYGON EMPTY", s, s)
      union(s, s, s)
    }
    // touching
    union("POINT (1 2)", "MULTIPOINT ((1 2), (3 4))", "MULTIPOINT ((1 2), (3 4))")
    union("LINESTRING (0 1, 1 2)", "LINESTRING (1 2, 3 4)", "LINESTRING (0 1, 1 2, 3 4)")
    union("MULTILINESTRING ((0 0, 2 2, 4 4), (5 5, 7 7, 9 9))",
      "MULTILINESTRING ((5 5, 7 7, 9 9), (11 11, 13 13, 15 15))",
      "MULTILINESTRING ((0 0, 2 2, 4 4), (5 5, 7 7, 9 9), (11 11, 13 13, 15 15))")
    union("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))",
      "POLYGON ((0 0, 1 0, 2 0, 2 1, 1 1, 0 1, 0 0))")
    union("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)))", "MULTIPOLYGON (((1 0, 2 0, 2 1, 1 1, 1 0)))",
      "POLYGON ((0 0, 1 0, 2 0, 2 1, 1 1, 0 1, 0 0))")
    // within
    union("MULTIPOINT ((20 20), (25 25))", "POINT (25 25)", "MULTIPOINT ((20 20), (25 25))")
    union("LINESTRING (20 20, 30 30)", "POINT (25 25)", "LINESTRING (20 20, 30 30)")
    union("LINESTRING (20 20, 30 30)", "LINESTRING (25 25, 27 27)",
      "LINESTRING (20 20, 25 25, 27 27, 30 30)")
    union("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "POLYGON ((1 1, 1 2, 2 2, 2 1, 1 1))",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    union("MULTIPOLYGON (((0 0 , 0 2, 2 2, 2 0)), ((2 2, 2 4, 4 4, 4 2)))",
      "POLYGON ((2 2, 2 3, 3 3, 3 2))",
      "MULTIPOLYGON (((2 2, 3 2, 4 2, 4 4, 2 4, 2 3, 2 2)), ((0 0, 2 0, 2 2, 0 2, 0 0)))")
    // overlap
    union("LINESTRING (1 1, 3 1)", "LINESTRING (2 1, 4 1)", "LINESTRING (1 1, 2 1, 3 1, 4 1)")
    union("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))",
      "POLYGON ((1 1, 3 1, 3 2, 4 2, 4 4, 2 4, 2 3, 1 3, 1 1))")
  }

  test("ST_Union rejects geometry collections with the reference message") {
    val ex = intercept[Exception] {
      one(s"st_union(${g("GEOMETRYCOLLECTION (POINT (2 3))")}, ${g("POINT (1 2)")})")
    }
    assert(ex.getMessage.contains("ST_Union only applies to POINT or MULTI_POINT"))
  }

  test("canonical output text matches the reference exactly on pinned cases") {
    // cases where canonical (min-vertex CCW, parts by min-y/min-x) equals
    // the reference's printed text byte-for-byte
    assert(one(s"st_astext(st_difference(${g("POLYGON ((1 1, 1 4, 4 4, 4 1))")}, ${g("POLYGON ((2 2, 2 5, 5 5, 5 2))")}))")
      == "POLYGON ((1 1, 4 1, 4 2, 2 2, 2 4, 1 4, 1 1))")
    assert(one(s"st_astext(st_intersection(${g("LINESTRING (50 100, 50 200)")}, ${g("LINESTRING (20 150, 100 150)")}))")
      == "POINT (50 150)")
    assert(one(s"st_astext(st_intersection(${g("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))")}, ${g("MULTILINESTRING ((3 4, 6 4), (5 0, 5 4))")}))")
      == "GEOMETRYCOLLECTION (POINT (5 1), LINESTRING (3 4, 4 4))")
    assert(one(s"st_astext(st_symdifference(${g("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))")}, ${g("MULTILINESTRING ((3 4, 6 4), (5 0, 5 4))")}))")
      == "MULTILINESTRING ((5 0, 5 1), (1 1, 5 1), (5 1, 5 4), (2 4, 3 4), (4 4, 5 4), (5 4, 6 4))")
    assert(one(s"st_astext(st_symdifference(${g("MULTIPOLYGON (((0 0 , 0 2, 2 2, 2 0)), ((2 2, 2 4, 4 4, 4 2)))")}, ${g("POLYGON ((0 0, 0 3, 3 3, 3 0))")}))")
      == "MULTIPOLYGON (((2 0, 3 0, 3 2, 2 2, 2 0)), ((0 2, 2 2, 2 3, 0 3, 0 2)), ((3 2, 4 2, 4 4, 2 4, 2 3, 3 3, 3 2)))")
  }

  test("ST_Buffer: semantics and edge cases") {
    // disk area: 96-gon inscribed in radius r — within 0.2% of πr²
    val a = one(s"st_area(st_buffer(st_point(0.0, 0.0), 2.0))").asInstanceOf[Double]
    assert(math.abs(a - math.Pi * 4) / (math.Pi * 4) < 0.002, s"area $a")
    // line capsule: 2r·len + πr² within 1%
    val b = one(s"st_area(st_buffer(${g("LINESTRING (0 0, 10 0)")}, 1.0))").asInstanceOf[Double]
    assert(math.abs(b - (20 + math.Pi)) / (20 + math.Pi) < 0.01, s"area $b")
    // polygon buffer: area grows by perimeter·d + πd²
    val c = one(s"st_area(st_buffer(${g("POLYGON ((0 0, 0 5, 5 5, 5 0, 0 0))")}, 1.2))").asInstanceOf[Double]
    val expectC = 25 + 20 * 1.2 + math.Pi * 1.44
    assert(math.abs(c - expectC) / expectC < 0.01, s"area $c")
    // zero distance: identity (reference: TestGeoFunctions.java:122-124)
    assert(one(s"st_astext(st_buffer(st_point(0.0, 0.0), 0))") == "POINT (0 0)")
    assert(one(s"st_astext(st_buffer(${g("LINESTRING (0 0, 1 1, 2 0.5)")}, 0))")
      == "LINESTRING (0 0, 1 1, 2 0.5)")
    // empty input → NULL (:130); +inf → empty (:137)
    assert(one(s"st_buffer(${g("POINT EMPTY")}, 1)") == null)
    assert(one(s"st_astext(st_buffer(st_point(0.0, 0.0), double('Infinity')))")
      == "MULTIPOLYGON EMPTY")
    // negative / NaN rejected (:133, :138)
    val neg = intercept[Exception] { one(s"st_buffer(st_point(0.0, 0.0), -1.2)") }
    assert(neg.getMessage.contains("distance is negative"))
    val nan = intercept[Exception] { one(s"st_buffer(st_point(0.0, 0.0), double('NaN'))") }
    assert(nan.getMessage.contains("distance is NaN"))
  }

  test("buffered intersection of multilinestrings (reference :127 shape)") {
    // ST_Buffer over a GEOMETRYCOLLECTION (point + line) → two disjoint
    // polygons: a disk around the point, a capsule around the line
    val sql = s"st_buffer(st_intersection(${g("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))")}, ${g("MULTILINESTRING ((3 4, 6 4), (5 0, 5 4))")}), 0.2)"
    assert(one(s"st_numgeometries($sql)") == 2)
    val area = one(s"st_area($sql)").asInstanceOf[Double]
    // disk πr² + capsule (2r·1 + πr²)
    val expect = math.Pi * 0.04 + (0.4 + math.Pi * 0.04)
    assert(math.abs(area - expect) / expect < 0.01, s"area $area")
  }

  test("multi-geometry accessors, measures, WKT round trips") {
    // ST_NumGeometries (reference testSTNumGeometries)
    assert(one(s"st_numgeometries(${g("POINT EMPTY")})") == 0)
    assert(one(s"st_numgeometries(${g("GEOMETRYCOLLECTION EMPTY")})") == 0)
    assert(one(s"st_numgeometries(${g("MULTIPOINT (1 2, 2 4, 3 6, 4 8)")})") == 4)
    assert(one(s"st_numgeometries(${g("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))")})") == 2)
    assert(one(s"st_numgeometries(${g("MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1)), ((2 4, 2 6, 6 6, 6 4)))")})") == 2)
    assert(one(s"st_numgeometries(${g("GEOMETRYCOLLECTION (POINT (2 3), LINESTRING (2 3, 3 4))")})") == 2)
    // ST_GeometryN
    assert(one(s"st_astext(st_geometryn(${g("MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1)), ((2 4, 2 6, 6 6, 6 4)))")}, 2))")
      == "POLYGON ((2 4, 6 4, 6 6, 2 6, 2 4))")
    assert(one(s"st_astext(st_geometryn(${g("GEOMETRYCOLLECTION (POINT (2 3), LINESTRING (2 3, 3 4))")}, 1))")
      == "POINT (2 3)")
    // measures over multis
    assert(one(s"st_area(${g("MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1)), ((2 4, 2 6, 6 6, 6 4)))")})") == 12.0)
    assert(one(s"st_length(${g("MULTILINESTRING ((0 0, 3 4), (10 0, 13 4))")})") == 10.0)
    assert(one(s"st_xmax(${g("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))")})") == 5.0)
    // polygon with a hole: area subtracts, interior rings surface
    val holed = "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"
    assert(one(s"st_area(${g(holed)})") == 32.0)
    assert(one(s"st_numinteriorring(${g(holed)})") == 1)
    assert(one(s"st_astext(st_interiorringn(${g(holed)}, 1))").asInstanceOf[String]
      .startsWith("LINESTRING"))
    // WKT round trips for the new forms
    assert(one(s"st_astext(${g("MULTIPOINT ((1 2), (3 4))")})") == "MULTIPOINT ((1 2), (3 4))")
    assert(one(s"st_astext(${g("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))")})")
      == "MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))")
    assert(one(s"st_astext(${g("GEOMETRYCOLLECTION (POINT (2 3), LINESTRING (2 3, 3 4))")})")
      == "GEOMETRYCOLLECTION (POINT (2 3), LINESTRING (2 3, 3 4))")
    // boundary per the reference (:482-489)
    assert(one(s"st_astext(st_boundary(st_point(1.0, 2.0)))") == "MULTIPOINT EMPTY")
    assert(one(s"st_astext(st_boundary(${g("LINESTRING (8 4, 5 7)")}))")
      == "MULTIPOINT ((8 4), (5 7))")
    assert(one(s"st_astext(st_boundary(${g("POLYGON ((1 1, 4 1, 1 4))")}))")
      == "MULTILINESTRING ((1 1, 4 1, 1 4, 1 1))")
    assert(one(s"st_astext(st_boundary(${g("MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1)), ((0 0, 0 2, 2 2, 2 0)))")}))")
      == "MULTILINESTRING ((1 1, 3 1, 3 3, 1 3, 1 1), (0 0, 2 0, 2 2, 0 2, 0 0))")
  }

  test("ST_Relate: DE-9IM pattern match (reference testSTRelate)") {
    assert(one(s"st_relate(${g("LINESTRING (0 0, 3 3)")}, ${g("LINESTRING (1 1, 4 1)")}, '****T****')") == false)
    assert(one(s"st_relate(${g("POLYGON ((2 0, 2 1, 3 1))")}, ${g("POLYGON ((1 1, 1 4, 4 4, 4 1))")}, '****T****')") == true)
    assert(one(s"st_relate(${g("POLYGON ((2 0, 2 1, 3 1))")}, ${g("POLYGON ((1 1, 1 4, 4 4, 4 1))")}, 'T********')") == false)
    // standard named relations expressed as DE-9IM patterns
    val sq1 = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    val sq2 = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"
    val sq3 = "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"
    assert(one(s"st_relate(${g(sq1)}, ${g(sq2)}, 'T*T***T**')") == true) // overlaps
    assert(one(s"st_relate(${g(sq1)}, ${g(sq3)}, 'FF*FF****')") == true) // disjoint
    assert(one(s"st_relate(${g(sq1)}, ${g("POINT (1 1)")}, 'T*****FF*')") == true) // contains
    // equality pattern on the same ring written two ways
    assert(one(s"st_relate(${g(sq1)}, ${g("POLYGON ((2 0, 2 2, 0 2, 0 0, 2 0))")}, 'T*F**FFF*')") == true)
  }

  test("line_locate_point, simplify_geometry, geometry_invalid_reason") {
    assert(one(s"line_locate_point(${g("LINESTRING (0 0, 10 0)")}, st_point(3.0, 5.0))") == 0.3)
    assert(one(s"line_locate_point(${g("LINESTRING EMPTY")}, st_point(3.0, 5.0))") == null)
    val wrongType = intercept[Exception] {
      one(s"line_locate_point(${g("POINT (1 1)")}, st_point(3.0, 5.0))") }
    assert(wrongType.getMessage.contains("must be a LineString"))
    // Douglas-Peucker drops the near-collinear vertex
    assert(one(s"st_astext(simplify_geometry(${g("LINESTRING (0 0, 5 0.01, 10 0)")}, 1.0))")
      == "LINESTRING (0 0, 10 0)")
    val badTol = intercept[Exception] {
      one(s"simplify_geometry(${g("LINESTRING (0 0, 10 0)")}, -1.0)") }
    assert(badTol.getMessage.contains("distanceTolerance is negative"))
    // validity reasons (reference wording; vertices are engine-specific)
    assert(one(s"geometry_invalid_reason(${g("POINT (1 2)")})") == null)
    assert(one(s"geometry_invalid_reason(${g("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))")})") == null)
    assert(one(s"geometry_invalid_reason(${g("MULTIPOINT ((0 0), (0 1), (1 1), (0 1))")})")
      .asInstanceOf[String].startsWith("Repeated points"))
    assert(one(s"geometry_invalid_reason(${g("POLYGON ((0 0, 1 1, 0 1, 1 0, 0 0))")})")
      .asInstanceOf[String].startsWith("Intersecting or overlapping segments"))
  }
}
