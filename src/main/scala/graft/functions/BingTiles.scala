package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bing tile functions
  * (presto-geospatial/.../BingTileFunctions.java:1-492 and BingTile.java).
  *
  * Spark-first re-expression: the reference's BingTileType is a packed
  * BIGINT `(x << 28) + (y << 5) + zoom` (BingTile.java encode/decode) —
  * here the tile IS that bigint, so tiles group/join/sort as plain longs
  * (the property that matters at 100 TB: a groupBy on tile is a native
  * long hash-shuffle, and the encoding is replayable in any engine for
  * oracling). The web-mercator math is the published Bing quadkey scheme
  * (BingTileFunctions.java cites msdn bb259689).
  */
object BingTiles {
  final val MaxZoom = 23
  private final val TilePixels = 256
  private final val MinLatitude = -85.05112878
  private final val MaxLatitude = 85.05112878
  private final val MinLongitude = -180d
  private final val MaxLongitude = 180d
  private final val OptimizedTilingMinZoom = 10

  private def check(cond: Boolean, msg: => String): Unit =
    if (!cond) throw new IllegalArgumentException(msg)

  def checkZoom(zoom: Long): Unit = {
    check(zoom > 0, "Zoom level must be > 0")
    check(zoom <= MaxZoom, s"Zoom level must be <= $MaxZoom")
  }

  private def checkCoordinate(c: Long, zoom: Long): Unit =
    check(c >= 0 && c < (1L << zoom),
      s"XY coordinates for a Bing tile at zoom level $zoom must be within [0, ${1L << zoom}) range")

  private def checkLatitude(lat: Double, msg: String): Unit =
    check(lat >= MinLatitude && lat <= MaxLatitude && !lat.isNaN, msg)

  private def checkLongitude(lon: Double, msg: String): Unit =
    check(lon >= MinLongitude && lon <= MaxLongitude && !lon.isNaN, msg)

  private val LatOutOfRange =
    s"Latitude must be between $MinLatitude and $MaxLatitude"
  private val LonOutOfRange =
    s"Longitude must be between $MinLongitude and $MaxLongitude"

  // --- packing (BingTile.java encode/decode) ---
  def encode(x: Int, y: Int, zoom: Int): Long =
    (x.toLong << 28) + (y.toLong << 5) + zoom
  def tileX(t: Long): Int = (t >> 28).toInt
  def tileY(t: Long): Int = ((t % (1L << 28)) >> 5).toInt
  def tileZoom(t: Long): Int = (t % (1L << 5)).toInt

  // --- constructors ---
  def bingTile(x: Long, y: Long, zoom: Long): Long = {
    checkZoom(zoom)
    checkCoordinate(x, zoom)
    checkCoordinate(y, zoom)
    encode(x.toInt, y.toInt, zoom.toInt)
  }

  def fromQuadKey(quadKey: String): Long = {
    check(quadKey.nonEmpty, "QuadKey must not be empty string")
    check(quadKey.length <= MaxZoom, s"QuadKey must be $MaxZoom characters or less")
    val zoom = quadKey.length
    var x = 0; var y = 0
    var i = zoom
    while (i > 0) {
      val mask = 1 << (i - 1)
      quadKey.charAt(zoom - i) match {
        case '0' =>
        case '1' => x |= mask
        case '2' => y |= mask
        case '3' => x |= mask; y |= mask
        case _ => check(cond = false, "Invalid QuadKey digit sequence: " + quadKey)
      }
      i -= 1
    }
    encode(x, y, zoom)
  }

  def toQuadKey(tile: Long): String = {
    val x = tileX(tile); val y = tileY(tile); val zoom = tileZoom(tile)
    val out = new Array[Char](zoom)
    var i = zoom
    while (i > 0) {
      var digit = '0'
      val mask = 1 << (i - 1)
      if ((x & mask) != 0) digit = (digit + 1).toChar
      if ((y & mask) != 0) digit = (digit + 2).toChar
      out(zoom - i) = digit
      i -= 1
    }
    new String(out)
  }

  // --- web-mercator projection (BingTileFunctions.java:408-447) ---
  private def mapSize(zoom: Int): Long = 256L << zoom

  private def clip(n: Double, min: Double, max: Double): Double =
    math.min(math.max(n, min), max)

  private def axisToCoordinates(axis: Double, mapSize: Long): Int = {
    val tileAxis = clip(axis * mapSize, 0, mapSize - 1).toInt
    tileAxis / TilePixels
  }

  private def longitudeToTileX(lon: Double, mapSize: Long): Int =
    axisToCoordinates((lon + 180) / 360, mapSize)

  private def latitudeToTileY(lat: Double, mapSize: Long): Int = {
    val sinLat = math.sin(lat * math.Pi / 180)
    val y = 0.5 - math.log((1 + sinLat) / (1 - sinLat)) / (4 * math.Pi)
    axisToCoordinates(y, mapSize)
  }

  def latLonToTile(lat: Double, lon: Double, zoom: Int): Long = {
    val ms = mapSize(zoom)
    encode(longitudeToTileX(lon, ms), latitudeToTileY(lat, ms), zoom)
  }

  /** Upper-left corner (lon, lat) of tile (x, y) at zoom
    * (BingTileFunctions.tileXYToLatitudeLongitude). */
  def tileUpperLeft(x: Int, y: Int, zoom: Int): (Double, Double) = {
    val ms = mapSize(zoom)
    val fx = (clip(x.toDouble * TilePixels, 0, ms.toDouble) / ms) - 0.5
    val fy = 0.5 - (clip(y.toDouble * TilePixels, 0, ms.toDouble) / ms)
    val lat = 90 - 360 * math.atan(math.exp(-fy * 2 * math.Pi)) / math.Pi
    (360 * fx, lat)
  }

  /** (xmin, ymin, xmax, ymax) of the tile's envelope. */
  def tileEnvelope(tile: Long): (Double, Double, Double, Double) = {
    val x = tileX(tile); val y = tileY(tile); val z = tileZoom(tile)
    val (ulx, uly) = tileUpperLeft(x, y, z)
    val (lrx, lry) = tileUpperLeft(x + 1, y + 1, z)
    (ulx, lry, lrx, uly)
  }

  def bingTileAt(lat: Double, lon: Double, zoom: Long): Long = {
    checkLatitude(lat, LatOutOfRange)
    checkLongitude(lon, LonOutOfRange)
    checkZoom(zoom)
    latLonToTile(lat, lon, zoom.toInt)
  }

  def bingTilesAround(lat: Double, lon: Double, zoom: Long): Array[Long] = {
    checkLatitude(lat, LatOutOfRange)
    checkLongitude(lon, LonOutOfRange)
    checkZoom(zoom)
    val z = zoom.toInt
    val ms = mapSize(z)
    val maxIndex = (ms / TilePixels) - 1
    val tx = longitudeToTileX(lon, ms)
    val ty = latitudeToTileY(lat, ms)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    // reference iterates i (x offset) outer, j (y offset) inner
    var i = -1
    while (i <= 1) {
      var j = -1
      while (j <= 1) {
        val x = tx + i; val y = ty + j
        if (x >= 0 && x <= maxIndex && y >= 0 && y <= maxIndex)
          out += encode(x, y, z)
        j += 1
      }
      i += 1
    }
    out.toArray
  }

  // --- geometry interplay (geometry_to_bing_tiles) ---

  private type Triple = (String, Array[Double], Array[Double])

  private def rectTriple(xmin: Double, ymin: Double, xmax: Double,
      ymax: Double): Triple =
    ("POLYGON", Array(xmin, xmax, xmax, xmin), Array(ymin, ymin, ymax, ymax))

  private def disjointG(a: Triple, b: Triple): Boolean =
    if (Geo.isMulti(a._1, a._2) || Geo.isMulti(b._1, b._2))
      GeoClip.setOp(GeoM.decode(a._1, a._2, a._3),
        GeoM.decode(b._1, b._2, b._3), "intersection").isEmpty
    else !(Geo.intersects(a, b) || Geo.contains(a, b) || Geo.contains(b, a))

  private def containsG(a: Triple, b: Triple): Boolean =
    if (Geo.isMulti(a._1, a._2) || Geo.isMulti(b._1, b._2)) {
      val ga = GeoM.decode(a._1, a._2, a._3)
      val gb = GeoM.decode(b._1, b._2, b._3)
      GeoClip.setOp(gb, ga, "difference").isEmpty &&
        !GeoClip.setOp(ga, gb, "intersection").isEmpty
    } else Geo.contains(a, b)

  private def tileEnvTriple(tile: Long): Triple = {
    val (xmin, ymin, xmax, ymax) = tileEnvelope(tile)
    rectTriple(xmin, ymin, xmax, ymax)
  }

  /** Minimum set of tiles at `zoomLevel` covering the geometry
    * (BingTileFunctions.geometryToBingTiles, incl. the >zoom-10
    * subdivide-and-bulk-emit optimization). */
  def geometryToBingTiles(g: Triple, zoomLevel: Long): Array[Long] = {
    checkZoom(zoomLevel)
    val zoom = zoomLevel.toInt
    val finite = g._2.indices.filterNot(i => g._2(i).isNaN || g._2(i).isInfinite)
    if (finite.isEmpty) return Array.empty
    val xs = finite.map(g._2).toArray; val ys = finite.map(g._3).toArray
    val (xmin, xmax, ymin, ymax) = (xs.min, xs.max, ys.min, ys.max)
    val spanMsg = (v: String, lo: Double, hi: Double) =>
      f"$v span for the geometry must be in [$lo%.2f, $hi%.2f] range"
    checkLatitude(ymin, spanMsg("Latitude", MinLatitude, MaxLatitude))
    checkLatitude(ymax, spanMsg("Latitude", MinLatitude, MaxLatitude))
    checkLongitude(xmin, spanMsg("Longitude", MinLongitude, MaxLongitude))
    checkLongitude(xmax, spanMsg("Longitude", MinLongitude, MaxLongitude))

    val pointOrRectangle = g._1 == "POINT" || (g._1 == "POLYGON" && {
      // drop a closing vertex if the ring is stored closed
      val pts0 = xs.zip(ys).toVector
      val pts = if (pts0.length > 1 && pts0.head == pts0.last) pts0.dropRight(1) else pts0
      pts.length == 4 &&
        pts.toSet == Set((xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax))
    })

    val upperLeft = latLonToTile(ymax, xmin, zoom)
    // lower-right corner tile, shifted up/left when it touches only at the border
    var lr = latLonToTile(ymin, xmax, zoom)
    locally {
      val (ulx, uly) = tileUpperLeft(tileX(lr), tileY(lr), zoom)
      val dx = if (ulx == xmax) -1 else 0
      val dy = if (uly == ymin) -1 else 0
      if (dx != 0 || dy != 0)
        lr = encode(tileX(lr) + dx, tileY(lr) + dy, zoom)
    }
    val tileCount = (tileX(lr) - tileX(upperLeft) + 1).toLong *
      (tileY(lr) - tileY(upperLeft) + 1).toLong
    if (pointOrRectangle)
      check(tileCount <= 1000000,
        "The number of input tiles is too large (more than 1M) to compute a set of covering Bing tiles.")
    else
      check(tileCount == tileCount.toInt && tileCount * math.max(xs.length, 1) <= 25000000,
        "The zoom level is too high or the geometry is too complex to compute a set of covering Bing tiles. " +
          "Please use a lower zoom level or convert the geometry to its bounding box using the ST_Envelope function.")

    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    if (pointOrRectangle || zoom <= OptimizedTilingMinZoom) {
      var x = tileX(upperLeft)
      while (x <= tileX(lr)) {
        var y = tileY(upperLeft)
        while (y <= tileY(lr)) {
          val t = encode(x, y, zoom)
          if (pointOrRectangle || !disjointG(tileEnvTriple(t), g)) out += t
          y += 1
        }
        x += 1
      }
    } else {
      // identify zoom-10 supertiles, bulk-emit fully-covered ones, recurse
      // into partially-covered ones (appendIntersectingSubtiles)
      val divisor = 1 << (zoom - OptimizedTilingMinZoom)
      val minX = tileX(upperLeft) / divisor; val maxX = tileX(lr) / divisor
      val minY = tileY(upperLeft) / divisor; val maxY = tileY(lr) / divisor
      var x = minX
      while (x <= maxX) {
        var y = minY
        while (y <= maxY) {
          appendIntersectingSubtiles(g, zoom,
            encode(x, y, OptimizedTilingMinZoom), out)
          y += 1
        }
        x += 1
      }
    }
    out.toArray
  }

  private def appendIntersectingSubtiles(g: Triple, zoom: Int, tile: Long,
      out: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
    val tz = tileZoom(tile)
    val env = tileEnvTriple(tile)
    if (tz == zoom) {
      if (!disjointG(env, g)) out += tile
      return
    }
    if (containsG(g, env)) {
      val subCount = 1 << (zoom - tz)
      val minX = subCount * tileX(tile); val minY = subCount * tileY(tile)
      var x = minX
      while (x < minX + subCount) {
        var y = minY
        while (y < minY + subCount) { out += encode(x, y, zoom); y += 1 }
        x += 1
      }
      return
    }
    if (disjointG(env, g)) return
    val minX = 2 * tileX(tile); val minY = 2 * tileY(tile)
    var x = minX
    while (x < minX + 2) {
      var y = minY
      while (y < minY + 2) {
        appendIntersectingSubtiles(g, zoom, encode(x, y, tz + 1), out)
        y += 1
      }
      x += 1
    }
  }

  /** great_circle_distance(lat1, lon1, lat2, lon2) in km
    * (GeoFunctions.java greatCircleDistance — Vincenty arctan form on a
    * 6371.01 km sphere). Lives here with the other lat/lon scalars. */
  def greatCircleDistance(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    def ckLat(l: Double): Unit = check(!l.isNaN && !l.isInfinite && l >= -90 && l <= 90,
      "Latitude must be between -90 and 90")
    def ckLon(l: Double): Unit = check(!l.isNaN && !l.isInfinite && l >= -180 && l <= 180,
      "Longitude must be between -180 and 180")
    ckLat(lat1); ckLon(lon1); ckLat(lat2); ckLon(lon2)
    val r1 = math.toRadians(lat1); val r2 = math.toRadians(lat2)
    val sin1 = math.sin(r1); val cos1 = math.cos(r1)
    val sin2 = math.sin(r2); val cos2 = math.cos(r2)
    val dLon = math.toRadians(lon1) - math.toRadians(lon2)
    val cosDLon = math.cos(dLon)
    val t1 = cos2 * math.sin(dLon)
    val t2 = cos1 * sin2 - sin1 * cos2 * cosDLon
    val t3 = sin1 * sin2 + cos1 * cos2 * cosDLon
    math.atan2(math.sqrt(t1 * t1 + t2 * t2), t3) * 6371.01
  }
}

/** Scalar Bing-tile calls with primitive/array/struct results. One
  * expression class keyed by function name keeps the registry entries
  * one-liners; all math is in [[BingTiles]]. */
case class BingTileCall(name: String, children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = name match {
    case "bing_tile" | "bing_tile_at" => LongType
    case "bing_tile_quadkey" => StringType
    case "bing_tile_zoom_level" => ByteType
    case "bing_tile_coordinates" => StructType(Seq(
      StructField("x", IntegerType, nullable = false),
      StructField("y", IntegerType, nullable = false)))
    case "bing_tiles_around" => ArrayType(LongType, containsNull = false)
  }
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    def lng(i: Int) = vs(i) match {
      case l: Long => l; case n: Int => n.toLong; case s: Short => s.toLong
      case b: Byte => b.toLong
    }
    def dbl(i: Int) = vs(i) match {
      case d: Double => d; case f: Float => f.toDouble; case l: Long => l.toDouble
      case n: Int => n.toDouble
    }
    name match {
      case "bing_tile" =>
        if (children.length == 1)
          BingTiles.fromQuadKey(vs(0).asInstanceOf[UTF8String].toString)
        else BingTiles.bingTile(lng(0), lng(1), lng(2))
      case "bing_tile_at" => BingTiles.bingTileAt(dbl(0), dbl(1), lng(2))
      case "bing_tile_quadkey" =>
        UTF8String.fromString(BingTiles.toQuadKey(lng(0)))
      case "bing_tile_zoom_level" => BingTiles.tileZoom(lng(0)).toByte
      case "bing_tile_coordinates" =>
        InternalRow(BingTiles.tileX(lng(0)), BingTiles.tileY(lng(0)))
      case "bing_tiles_around" =>
        new GenericArrayData(BingTiles.bingTilesAround(dbl(0), dbl(1), lng(2)))
    }
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(children = cs)
  override def prettyName: String = name
}

/** bing_tile_polygon(tile) → the tile's envelope as a geometry
  * (BingTileFunctions.bingTilePolygon). */
case class BingTilePolygon(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = Geo.geometryType
  override protected def nullSafeEval(v: Any): Any = {
    val (xmin, ymin, xmax, ymax) = BingTiles.tileEnvelope(v.asInstanceOf[Long])
    Geo.row("POLYGON", Array(xmin, xmax, xmax, xmin), Array(ymin, ymin, ymax, ymax))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "bing_tile_polygon"
}

/** geometry_to_bing_tiles(geometry, zoom) → array of covering tiles
  * (BingTileFunctions.geometryToBingTiles). */
case class GeometryToBingTiles(geom: Expression, zoom: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = geom
  override def right: Expression = zoom
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(g: Any, z: Any): Any = {
    val t = Geo.unpack(g)
    new GenericArrayData(BingTiles.geometryToBingTiles(t, z match {
      case l: Long => l; case n: Int => n.toLong
    }))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(geom = l, zoom = r)
  override def prettyName: String = "geometry_to_bing_tiles"
}
