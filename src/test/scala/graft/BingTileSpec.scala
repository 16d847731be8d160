package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bing tile family — vectors from the reference's
  * TestBingTileFunctions.java (presto-geospatial). Tiles are packed
  * BIGINTs (BingTile.java encode), so expected tile values are computed
  * with the same packing. */
class BingTileSpec extends AnyFunSuite {
  import TestSession._

  private lazy val engine = Engine(spark).loadCatalog(sf)

  private def one(exprSql: String): Any =
    engine.sql(s"SELECT $exprSql AS v").head.get(0)

  private def enc(x: Int, y: Int, zoom: Int): Long =
    graft.functions.BingTiles.encode(x, y, zoom)

  test("bing_tile round-trips: xy/zoom, quadkey, coordinates, zoom level") {
    // TestBingTileFunctions testBingTile / testPointToBingTile
    assert(one("bing_tile_quadkey(bing_tile('213'))") == "213")
    assert(one("bing_tile_quadkey(bing_tile('123030123010121'))") == "123030123010121")
    assert(one("bing_tile_quadkey(bing_tile(3, 5, 3))") == "213")
    assert(one("bing_tile_quadkey(bing_tile(21845, 13506, 15))") == "123030123010121")
    assert(one("bing_tile_coordinates(bing_tile('213')).x") == 3)
    assert(one("bing_tile_coordinates(bing_tile('213')).y") == 5)
    assert(one("bing_tile_coordinates(bing_tile('123030123010121')).x") == 21845)
    assert(one("bing_tile_coordinates(bing_tile('123030123010121')).y") == 13506)
    assert(one("bing_tile_zoom_level(bing_tile('213'))") == 3.toByte)
    assert(one("bing_tile_zoom_level(bing_tile('123030123010121'))") == 15.toByte)
  }

  test("bing_tile_at hits the reference tiles, including borders") {
    assert(one("bing_tile_at(30.12, 60, 15)") == enc(21845, 13506, 15))
    assert(one("bing_tile_at(0, -0.002, 1)") == enc(0, 1, 1))
    assert(one("bing_tile_at(1e0/512, 0, 1)") == enc(1, 0, 1))
    assert(one("bing_tile_at(1e0/512, 0, 9)") == enc(256, 255, 9))
  }

  test("bing_tile validation errors carry the reference messages") {
    def err(sql: String): String =
      intercept[Exception](one(sql)).getMessage
    assert(err("bing_tile(0, 1, 0)").contains("Zoom level must be > 0"))
    assert(err("bing_tile(0, 1, 24)").contains("Zoom level must be <= 23"))
    assert(err("bing_tile(10, 1, 2)").contains(
      "XY coordinates for a Bing tile at zoom level 2 must be within [0, 4) range"))
    assert(err("bing_tile('')").contains("QuadKey must not be empty string"))
    assert(err("bing_tile('a')").contains("Invalid QuadKey digit sequence: a"))
    assert(err("bing_tile_at(91, 60, 15)").contains(
      "Latitude must be between -85.05112878 and 85.05112878"))
    assert(err("bing_tile_at(30, 600, 15)").contains(
      "Longitude must be between -180.0 and 180.0"))
  }

  test("bing_tiles_around: interior and corner/edge clipping") {
    def quads(sql: String): Seq[String] =
      one(s"transform($sql, x -> bing_tile_quadkey(x))")
        .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(quads("bing_tiles_around(-85.05112878, -180, 2)") ==
      Seq("20", "22", "21", "23"))
    assert(quads("bing_tiles_around(-85.05112878, 180, 2)") ==
      Seq("30", "32", "31", "33"))
    assert(quads("bing_tiles_around(85.05112878, -180, 2)") ==
      Seq("00", "02", "01", "03"))
    assert(quads("bing_tiles_around(-85.05112878, 0, 1)") ==
      Seq("0", "2", "1", "3"))
    assert(quads("bing_tiles_around(-85.05112878, 0, 3)") ==
      Seq("231", "233", "320", "322", "321", "323"))
    assert(quads("bing_tiles_around(-85.05112878, 0, 2)") ==
      Seq("21", "23", "30", "32", "31", "33"))
    assert(quads("bing_tiles_around(0, 180, 2)") ==
      Seq("12", "30", "32", "13", "31", "33"))
    assert(quads("bing_tiles_around(30.12, 60, 1)").size == 4)
  }

  test("bing_tile_polygon matches the reference WKT and corners") {
    assert(one("ST_AsText(bing_tile_polygon(bing_tile('123030123010121')))") ==
      "POLYGON ((59.996337890625 30.11662158281937, 60.00732421875 30.11662158281937, " +
        "60.00732421875 30.12612436422458, 59.996337890625 30.12612436422458, " +
        "59.996337890625 30.11662158281937))")
    assert(one("ST_AsText(ST_Point(ST_XMax(bing_tile_polygon(bing_tile(1, 1, 1))), " +
      "ST_YMin(bing_tile_polygon(bing_tile(1, 1, 1)))))") ==
      "POINT (180 -85.05112877980659)")
    assert(one("ST_AsText(ST_Point(ST_XMin(bing_tile_polygon(bing_tile(0, 0, 1))), " +
      "ST_YMax(bing_tile_polygon(bing_tile(0, 0, 1)))))") ==
      "POINT (-180 85.05112877980659)")
  }

  test("geometry_to_bing_tiles: points, polygons, collections, rectangles") {
    def quads(sql: String): Seq[String] =
      one(s"transform(geometry_to_bing_tiles($sql), x -> bing_tile_quadkey(x))")
        .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(quads("ST_GeometryFromText('POINT (60 30.12)'), 10") == Seq("1230301230"))
    assert(quads("ST_GeometryFromText('POINT (60 30.12)'), 15") == Seq("123030123010121"))
    assert(quads("ST_GeometryFromText('POINT (60 30.12)'), 16") == Seq("1230301230101212"))
    assert(quads("ST_GeometryFromText('POLYGON ((0 0, 0 10, 10 10, 10 0))'), 6") ==
      Seq("122220", "122222", "122221", "122223"))
    assert(quads("ST_GeometryFromText('POLYGON ((0 0, 0 10, 10 10))'), 6").toSet ==
      Set("122220", "122222", "122221"))
    assert(quads("ST_GeometryFromText('POLYGON ((10 10, -10 10, -20 -15, 10 10))'), 3").toSet ==
      Set("033", "211", "122"))
    // zoom > 10 goes through the supertile-subdivision branch
    assert(quads("bing_tile_polygon(bing_tile('12303012301230123')), 17").toSet
      .contains("12303012301230123"))
    assert(quads("bing_tile_polygon(bing_tile('1230301230')), 10") == Seq("1230301230"))
    assert(quads("bing_tile_polygon(bing_tile('1230301230')), 11").toSet ==
      Set("12303012300", "12303012302", "12303012301", "12303012303"))
    assert(quads("ST_Envelope(ST_GeometryFromText(" +
      "'LINESTRING (59.765625 29.84064389983442, 60.2 30.14512718337612)')), 10") ==
      Seq("1230301230", "1230301231"))
    assert(one("cardinality(geometry_to_bing_tiles(ST_Envelope(" +
      "ST_GeometryFromText('LINESTRING (0 0, 80 80)')), 5))") == 104)
    // empty geometry → empty array
    assert(one("cardinality(geometry_to_bing_tiles(" +
      "ST_GeometryFromText('POLYGON EMPTY'), 10))") == 0)
  }

  test("geometry_to_bing_tiles validation") {
    def err(sql: String): String = intercept[Exception](one(sql)).getMessage
    assert(err("geometry_to_bing_tiles(ST_Point(600, 30.12), 10)")
      .contains("Longitude span for the geometry must be in [-180.00, 180.00] range"))
    assert(err("geometry_to_bing_tiles(ST_Point(60, 300.12), 10)")
      .contains("Latitude span for the geometry must be in [-85.05, 85.05] range"))
    assert(err("geometry_to_bing_tiles(ST_Point(60, 30.12), 0)")
      .contains("Zoom level must be > 0"))
    assert(err("geometry_to_bing_tiles(ST_Point(60, 30.12), 40)")
      .contains("Zoom level must be <= 23"))
    assert(err("geometry_to_bing_tiles(ST_Envelope(" +
      "ST_GeometryFromText('LINESTRING (0 0, 80 80)')), 16)")
      .contains("The number of input tiles is too large"))
  }

  test("great_circle_distance matches the reference formula") {
    // TestGeoFunctions.java:733 vector
    val d = one("great_circle_distance(36.12, -86.67, 33.94, -118.40)")
      .asInstanceOf[Double]
    assert(math.abs(d - 2886.448973436703) < 1e-6)
    assert(one("great_circle_distance(0, 0, 0, 0)") == 0.0)
    val m = intercept[Exception](one("great_circle_distance(100, 20, 30, 40)"))
    assert(m.getMessage.contains("Latitude must be between -90 and 90"))
  }

  test("verbatim ST_GeometryFromText spelling resolves") {
    assert(one("ST_AsText(ST_GeometryFromText('POINT (1 2)'))") == "POINT (1 2)")
    assert(one("st_geometryfromtext('POINT (1 2)')") != null)
  }
}
