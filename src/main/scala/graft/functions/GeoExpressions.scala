package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Core of the reference's geospatial surface
  * (presto-geospatial/.../GeoFunctions.java — 56 ST_* scalars over an ESRI
  * geometry type). Spark-first re-expression: geometry is a plain STRUCT
  * column `(gtype STRING, xs ARRAY<DOUBLE>, ys ARRAY<DOUBLE>)` — columnar,
  * codegen-compatible, shuffle-friendly — and each ST_* function is a
  * Catalyst expression over it. POINT / LINESTRING / POLYGON (single ring)
  * cover the join + measurement core; multi-geometries are out of scope.
  */
object Geo {
  val geometryType: StructType = StructType(Seq(
    StructField("gtype", StringType, nullable = false),
    StructField("xs", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("ys", ArrayType(DoubleType, containsNull = false), nullable = false)))

  def row(gtype: String, xs: Array[Double], ys: Array[Double]): InternalRow =
    InternalRow(UTF8String.fromString(gtype),
      new GenericArrayData(xs), new GenericArrayData(ys))

  /** (gtype, xs, ys) of a geometry struct value. */
  def unpack(v: Any): (String, Array[Double], Array[Double]) = {
    val r = v.asInstanceOf[InternalRow]
    (r.getUTF8String(0).toString,
      r.getArray(1).toDoubleArray(), r.getArray(2).toDoubleArray())
  }

  /** Ray casting with boundary tolerance: true if (px,py) is inside or on
    * the single-ring polygon given by (xs, ys). */
  def pointInPolygon(px: Double, py: Double,
      xs: Array[Double], ys: Array[Double]): Boolean = {
    val n = xs.length
    if (n < 3) return false
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      if (pointOnSegment(px, py, xs(j), ys(j), xs(i), ys(i))) return true
      val intersects = (ys(i) > py) != (ys(j) > py) &&
        px < (xs(j) - xs(i)) * (py - ys(i)) / (ys(j) - ys(i)) + xs(i)
      if (intersects) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  def pointOnSegment(px: Double, py: Double,
      ax: Double, ay: Double, bx: Double, by: Double): Boolean =
    distPointSegment(px, py, ax, ay, bx, by) < 1e-12

  def distPointSegment(px: Double, py: Double,
      ax: Double, ay: Double, bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    val t = if (len2 == 0) 0.0
      else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    math.hypot(px - (ax + t * dx), py - (ay + t * dy))
  }

  def segmentsIntersect(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    def orient(ox: Double, oy: Double, px: Double, py: Double,
        qx: Double, qy: Double): Double =
      (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    if (((o1 > 0) != (o2 > 0)) && ((o3 > 0) != (o4 > 0))) true
    else pointOnSegment(cx, cy, ax, ay, bx, by) ||
      pointOnSegment(dx, dy, ax, ay, bx, by) ||
      pointOnSegment(ax, ay, cx, cy, dx, dy) ||
      pointOnSegment(bx, by, cx, cy, dx, dy)
  }

  /** Closed vertex rings for distance/intersection edge walks: polygons wrap
    * around, points/lines do not. */
  def edges(gtype: String, xs: Array[Double], ys: Array[Double]): Seq[(Double, Double, Double, Double)] = {
    val n = xs.length
    if (n < 2 || gtype == "POINT" || gtype == "MULTIPOINT") Seq.empty
    else {
      val base = (0 until n - 1).map(i => (xs(i), ys(i), xs(i + 1), ys(i + 1)))
      if (gtype == "POLYGON" && n >= 3)
        base :+ ((xs(n - 1), ys(n - 1), xs(0), ys(0)))
      else base
    }
  }

  def contains(a: (String, Array[Double], Array[Double]),
      b: (String, Array[Double], Array[Double])): Boolean = a._1 match {
    case "POLYGON" =>
      b._2.indices.forall(i => pointInPolygon(b._2(i), b._3(i), a._2, a._3)) &&
        // all vertices inside is insufficient for concave rings: no edge of
        // b may properly cross an edge of a
        (b._1 == "POINT" || !edges(a._1, a._2, a._3).exists { case (ax, ay, bx, by) =>
          edges(b._1, b._2, b._3).exists { case (cx, cy, dx, dy) =>
            segmentsIntersect(ax, ay, bx, by, cx, cy, dx, dy) &&
              !pointOnSegment(cx, cy, ax, ay, bx, by) &&
              !pointOnSegment(dx, dy, ax, ay, bx, by)
          }
        })
    case _ => false
  }

  def intersects(a: (String, Array[Double], Array[Double]),
      b: (String, Array[Double], Array[Double])): Boolean = {
    val ea = edges(a._1, a._2, a._3)
    val eb = edges(b._1, b._2, b._3)
    ea.exists { case (ax, ay, bx, by) =>
      eb.exists { case (cx, cy, dx, dy) =>
        segmentsIntersect(ax, ay, bx, by, cx, cy, dx, dy) } } ||
    (a._1 == "POLYGON" && b._2.indices.exists(i =>
      pointInPolygon(b._2(i), b._3(i), a._2, a._3))) ||
    (b._1 == "POLYGON" && a._2.indices.exists(i =>
      pointInPolygon(a._2(i), a._3(i), b._2, b._3)))
  }

  def distance(a: (String, Array[Double], Array[Double]),
      b: (String, Array[Double], Array[Double])): Double = {
    if (intersects(a, b) || contains(a, b) || contains(b, a)) return 0.0
    val ea = edges(a._1, a._2, a._3)
    val eb = edges(b._1, b._2, b._3)
    var min = Double.MaxValue
    // vertex-to-edge in both directions covers segment-segment minimum for
    // non-intersecting geometries
    for (i <- a._2.indices) {
      if (eb.isEmpty) min = math.min(min, b._2.indices.map(j =>
        math.hypot(a._2(i) - b._2(j), a._3(i) - b._3(j))).min)
      else eb.foreach { case (cx, cy, dx, dy) =>
        min = math.min(min, distPointSegment(a._2(i), a._3(i), cx, cy, dx, dy)) }
    }
    for (j <- b._2.indices) {
      if (ea.isEmpty) min = math.min(min, a._2.indices.map(i =>
        math.hypot(a._2(i) - b._2(j), a._3(i) - b._3(j))).min)
      else ea.foreach { case (ax, ay, bx, by) =>
        min = math.min(min, distPointSegment(b._2(j), b._3(j), ax, ay, bx, by)) }
    }
    min
  }

  // --- topology helpers for the relation predicates / constructors ---

  /** Strict segment-interior crossing (shared endpoints excluded). */
  def properlyCross(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    def orient(ox: Double, oy: Double, px: Double, py: Double,
        qx: Double, qy: Double): Double =
      (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    (o1 > 0) != (o2 > 0) && (o3 > 0) != (o4 > 0) &&
      o1 != 0 && o2 != 0 && o3 != 0 && o4 != 0
  }

  def onBoundary(px: Double, py: Double,
      g: (String, Array[Double], Array[Double])): Boolean = g._1 match {
    case "POINT" | "MULTIPOINT" =>
      g._2.indices.exists(i => g._2(i) == px && g._3(i) == py)
    case _ => edges(g._1, g._2, g._3).exists { case (ax, ay, bx, by) =>
      pointOnSegment(px, py, ax, ay, bx, by) }
  }

  def strictlyInside(px: Double, py: Double,
      poly: (String, Array[Double], Array[Double])): Boolean =
    pointInPolygon(px, py, poly._2, poly._3) && !onBoundary(px, py, poly)

  /** Sample points whose strict-containment decides interior overlap.
    * Vertices and edge midpoints are sound probes: each touches the
    * geometry's interior arbitrarily closely, so strict containment in the
    * OTHER polygon's open interior implies the interiors meet. The
    * vertex-centroid is only sound when it actually lies in the source
    * polygon's own interior (a concave ring's centroid can fall outside). */
  private def samplePoints(g: (String, Array[Double], Array[Double])): Seq[(Double, Double)] = {
    val verts = g._2.indices.map(i => (g._2(i), g._3(i)))
    val mids = edges(g._1, g._2, g._3).map { case (ax, ay, bx, by) =>
      ((ax + bx) / 2, (ay + by) / 2) }
    val centroid =
      if (g._1 == "POLYGON" && g._2.nonEmpty) {
        val c = (g._2.sum / g._2.length, g._3.sum / g._3.length)
        if (strictlyInside(c._1, c._2, g)) Seq(c) else Seq.empty
      } else Seq.empty
    verts ++ mids ++ centroid
  }

  /** Positive-length collinear overlap between two segment sets. */
  private def segmentOverlap(ea: Seq[(Double, Double, Double, Double)],
      eb: Seq[(Double, Double, Double, Double)]): Boolean =
    ea.exists { case (ax, ay, bx, by) =>
      eb.exists { case (cx, cy, dx, dy) =>
        // collinear iff both c and d lie on line ab with zero cross product
        def cross(px: Double, py: Double, qx: Double, qy: Double,
            rx: Double, ry: Double): Double =
          (qx - px) * (ry - py) - (qy - py) * (rx - px)
        cross(ax, ay, bx, by, cx, cy) == 0 && cross(ax, ay, bx, by, dx, dy) == 0 && {
          // 1-d interval overlap along the dominant axis
          val horiz = math.abs(bx - ax) >= math.abs(by - ay)
          val (a1, a2) = if (horiz) (math.min(ax, bx), math.max(ax, bx))
            else (math.min(ay, by), math.max(ay, by))
          val (b1, b2) = if (horiz) (math.min(cx, dx), math.max(cx, dx))
            else (math.min(cy, dy), math.max(cy, dy))
          math.min(a2, b2) - math.max(a1, b1) > 0
        }
      }
    }

  /** Interior-∩-interior non-empty — the discriminator between touches and
    * crosses/overlaps (DE-9IM row the reference gets from ESRI relate).
    * Decided by proper edge crossings, positive-length collinear overlap,
    * strict containment of sampled points (vertices, edge midpoints,
    * centroid), and ring equality. */
  def interiorsIntersect(a: (String, Array[Double], Array[Double]),
      b: (String, Array[Double], Array[Double])): Boolean = {
    def dim(t: String) = t match {
      case "POINT" | "MULTIPOINT" => 0; case "LINESTRING" => 1; case _ => 2 }
    val (da, db) = (dim(a._1), dim(b._1))
    if (da > db) return interiorsIntersect(b, a)
    (da, db) match {
      case (0, 0) =>
        a._2.indices.exists(i => b._2.indices.exists(j =>
          a._2(i) == b._2(j) && a._3(i) == b._3(j)))
      case (0, 1) =>
        // line interior excludes its two endpoints
        a._2.indices.exists { i =>
          val (px, py) = (a._2(i), a._3(i))
          val n = b._2.length
          onBoundary(px, py, b) &&
            !(px == b._2(0) && py == b._3(0)) &&
            !(px == b._2(n - 1) && py == b._3(n - 1))
        }
      case (0, 2) =>
        a._2.indices.exists(i => strictlyInside(a._2(i), a._3(i), b))
      case (1, 1) =>
        val ea = edges(a._1, a._2, a._3); val eb = edges(b._1, b._2, b._3)
        ea.exists { case (ax, ay, bx, by) => eb.exists { case (cx, cy, dx, dy) =>
          properlyCross(ax, ay, bx, by, cx, cy, dx, dy) } } ||
          segmentOverlap(ea, eb)
      case (1, 2) =>
        val eb = edges(b._1, b._2, b._3)
        samplePoints(a).exists { case (px, py) => strictlyInside(px, py, b) } ||
          edges(a._1, a._2, a._3).exists { case (ax, ay, bx, by) =>
            eb.exists { case (cx, cy, dx, dy) =>
              properlyCross(ax, ay, bx, by, cx, cy, dx, dy) } }
      case _ =>
        edges(a._1, a._2, a._3).exists { case (ax, ay, bx, by) =>
          edges(b._1, b._2, b._3).exists { case (cx, cy, dx, dy) =>
            properlyCross(ax, ay, bx, by, cx, cy, dx, dy) } } ||
          samplePoints(a).exists { case (px, py) => strictlyInside(px, py, b) } ||
          samplePoints(b).exists { case (px, py) => strictlyInside(px, py, a) } ||
          equalsGeom(a, b)
    }
  }

  /** Geometric equality (shared by ST_Equals / the relation predicates). */
  def equalsGeom(a: (String, Array[Double], Array[Double]),
      b: (String, Array[Double], Array[Double])): Boolean = {
    val (ta, axs, ays) = a; val (tb, bxs, bys) = b
    if (ta != tb || axs.length != bxs.length) false
    else {
      val as = axs.zip(ays).toSeq
      val bs = bxs.zip(bys).toSeq
      ta match {
        case "POINT" => as == bs
        case "MULTIPOINT" => as.sorted == bs.sorted
        case "LINESTRING" => as == bs || as == bs.reverse
        case "POLYGON" =>
          def rot(s: Seq[(Double, Double)], k: Int) = s.drop(k) ++ s.take(k)
          bs.indices.exists(k => rot(bs, k) == as) ||
            bs.indices.exists(k => rot(bs.reverse, k) == as)
        case _ => false
      }
    }
  }

  /** ST_Touches: boundaries meet, interiors don't. */
  def touches(a: (String, Array[Double], Array[Double]),
      b: (String, Array[Double], Array[Double])): Boolean =
    distance(a, b) == 0.0 && !interiorsIntersect(a, b)

  /** ST_Crosses: interiors meet in a lower-dimensional set. */
  def crosses(a: (String, Array[Double], Array[Double]),
      b: (String, Array[Double], Array[Double])): Boolean = {
    def isLine(t: String) = t == "LINESTRING"
    def isPoly(t: String) = t == "POLYGON"
    if (isLine(a._1) && isLine(b._1)) {
      val ea = edges(a._1, a._2, a._3); val eb = edges(b._1, b._2, b._3)
      ea.exists { case (ax, ay, bx, by) => eb.exists { case (cx, cy, dx, dy) =>
        properlyCross(ax, ay, bx, by, cx, cy, dx, dy) } } &&
        !segmentOverlap(ea, eb)
    } else if (isLine(a._1) && isPoly(b._1)) crossesLinePoly(a, b)
    else if (isPoly(a._1) && isLine(b._1)) crossesLinePoly(b, a)
    else false
  }

  private def crossesLinePoly(line: (String, Array[Double], Array[Double]),
      poly: (String, Array[Double], Array[Double])): Boolean = {
    // a PROPER crossing of a ring edge puts line-interior points strictly
    // on both sides of the boundary — crossing is proven without sampling
    // (sampling alone can miss a thin spike between two probe points)
    val properCrossing = edges(line._1, line._2, line._3).exists {
      case (ax, ay, bx, by) => edges(poly._1, poly._2, poly._3).exists {
        case (cx, cy, dx, dy) => properlyCross(ax, ay, bx, by, cx, cy, dx, dy)
      }
    }
    properCrossing || {
      val pts = samplePoints(line)
      pts.exists { case (px, py) => strictlyInside(px, py, poly) } &&
        pts.exists { case (px, py) => !pointInPolygon(px, py, poly._2, poly._3) }
    }
  }

  /** ST_Overlaps: same dimension, interiors meet, neither contains the
    * other, intersection of the same dimension. */
  def overlaps(a: (String, Array[Double], Array[Double]),
      b: (String, Array[Double], Array[Double])): Boolean = {
    def lineContains(outer: (String, Array[Double], Array[Double]),
        inner: (String, Array[Double], Array[Double])): Boolean =
      samplePoints(inner).forall { case (px, py) => onBoundary(px, py, outer) }
    (a._1, b._1) match {
      case ("POLYGON", "POLYGON") =>
        interiorsIntersect(a, b) && !contains(a, b) && !contains(b, a) &&
          !equalsGeom(a, b)
      case ("LINESTRING", "LINESTRING") =>
        segmentOverlap(edges(a._1, a._2, a._3), edges(b._1, b._2, b._3)) &&
          !lineContains(a, b) && !lineContains(b, a)
      case _ => false
    }
  }

  /** Monotone-chain convex hull. Degenerate inputs keep their natural type:
    * one distinct point → POINT, collinear → LINESTRING, else an open CCW
    * POLYGON ring. */
  def convexHull(xs: Array[Double], ys: Array[Double]): (String, Array[Double], Array[Double]) = {
    val pts = xs.zip(ys).distinct.sorted
    if (pts.length == 1) return ("POINT", Array(pts(0)._1), Array(pts(0)._2))
    def cross(o: (Double, Double), p: (Double, Double), q: (Double, Double)) =
      (p._1 - o._1) * (q._2 - o._2) - (p._2 - o._2) * (q._1 - o._1)
    def half(ps: Seq[(Double, Double)]): Vector[(Double, Double)] = {
      var h = Vector.empty[(Double, Double)]
      ps.foreach { p =>
        while (h.length >= 2 && cross(h(h.length - 2), h(h.length - 1), p) <= 0)
          h = h.dropRight(1)
        h = h :+ p
      }
      h
    }
    val lower = half(pts)
    val upper = half(pts.reverse)
    val hull = (lower.dropRight(1) ++ upper.dropRight(1))
    if (hull.length <= 2)
      ("LINESTRING", Array(pts.head._1, pts.last._1),
        Array(pts.head._2, pts.last._2))
    else ("POLYGON", hull.map(_._1).toArray, hull.map(_._2).toArray)
  }

  /** No self-intersection: non-adjacent segments never meet; adjacent
    * segments share exactly their common vertex. */
  def isSimple(gtype: String, xs: Array[Double], ys: Array[Double]): Boolean = {
    gtype match {
      case "POINT" => true
      case "MULTIPOINT" => xs.zip(ys).distinct.length == xs.length
      case _ =>
        val es = edges(gtype, xs, ys).toIndexedSeq
        val n = es.length
        // a closed path's first and last segments are cyclically adjacent
        val closed = gtype == "POLYGON" ||
          (xs.length > 1 && xs.head == xs.last && ys.head == ys.last)
        (0 until n).forall { i =>
          val (ax, ay, bx, by) = es(i)
          if (ax == bx && ay == by) false // degenerate zero-length segment
          else (i + 1 until n).forall { j =>
            val (cx, cy, dx, dy) = es(j)
            val adjacent = j == i + 1 || (closed && i == 0 && j == n - 1)
            if (!adjacent) !segmentsIntersect(ax, ay, bx, by, cx, cy, dx, dy)
            else {
              // shared endpoint only: no collinear spill past the joint
              !properlyCross(ax, ay, bx, by, cx, cy, dx, dy) &&
                !segmentOverlap(Seq(es(i)), Seq(es(j)))
            }
          }
        }
    }
  }

  /** Full WKT grammar (all seven types, EMPTY, holes, collections) lives
    * in [[GeoM]]; these keep the original entry points. */
  def parseWkt(wkt: String): (String, Array[Double], Array[Double]) =
    GeoM.parse(wkt)

  def toWkt(gtype: String, xs: Array[Double], ys: Array[Double]): String =
    GeoM.render(gtype, xs, ys)

  /** True when the value uses the multi-part encoding (separators in the
    * coordinate arrays or a MULTI/collection gtype). */
  def isMulti(t: String, xs: Array[Double]): Boolean = {
    val base = t.split(":")(0)
    base == "MULTILINESTRING" || base == "MULTIPOLYGON" ||
      base == "GEOMETRYCOLLECTION" || xs.exists(d => d.isNaN || d.isInfinite)
  }
}

/** ST_Point(x, y) (GeoFunctions.java stPoint). */
case class StPoint(x: Expression, y: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = x
  override def right: Expression = y
  override def dataType: DataType = Geo.geometryType
  override protected def nullSafeEval(xv: Any, yv: Any): Any =
    Geo.row("POINT", Array(xv.asInstanceOf[Double]), Array(yv.asInstanceOf[Double]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(x = l, y = r)
}

/** ST_GeometryFromText(wkt) (GeoFunctions.java stGeometryFromText). */
case class StGeometryFromText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = Geo.geometryType
  override protected def nullSafeEval(v: Any): Any = {
    val (t, xs, ys) = Geo.parseWkt(v.toString)
    Geo.row(t, xs, ys)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** ST_AsText(geometry) (GeoFunctions.java stAsText). */
case class StAsText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any = {
    val (t, xs, ys) = Geo.unpack(v)
    UTF8String.fromString(Geo.toWkt(t, xs, ys))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Scalar accessors / measures with a double result. */
case class GeoMeasure(child: Expression, measure: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any = {
    val (t, xs, ys) = Geo.unpack(v)
    if (Geo.isMulti(t, xs)) return multiEval(t, xs, ys)
    measure match {
      case "x" =>
        require(t == "POINT", s"ST_X requires POINT, got $t"); xs(0)
      case "y" =>
        require(t == "POINT", s"ST_Y requires POINT, got $t"); ys(0)
      case "xmin" => xs.min
      case "xmax" => xs.max
      case "ymin" => ys.min
      case "ymax" => ys.max
      case "area" =>
        if (t != "POLYGON" || xs.length < 3) 0.0
        else {
          // shoelace over the open ring
          var s = 0.0
          var i = 0
          val n = xs.length
          while (i < n) {
            val j = (i + 1) % n
            s += xs(i) * ys(j) - xs(j) * ys(i)
            i += 1
          }
          math.abs(s) / 2
        }
      case "length" =>
        Geo.edges(t, xs, ys).map { case (ax, ay, bx, by) =>
          math.hypot(bx - ax, by - ay) }.sum
    }
  }

  /** Part-decomposed evaluation for multi-part encodings: extrema skip the
    * separator entries; area sums outer rings minus holes; length sums
    * paths and rings. */
  private def multiEval(t: String, xs: Array[Double], ys: Array[Double]): Any = {
    val gs = GeoM.decode(t, xs, ys)
    measure match {
      case "x" | "y" =>
        throw new IllegalArgumentException(s"ST_${measure.toUpperCase} requires POINT, got $t")
      case "xmin" => xs.filterNot(d => d.isNaN || d.isInfinite).min
      case "xmax" => xs.filterNot(d => d.isNaN || d.isInfinite).max
      case "ymin" => ys.filterNot(d => d.isNaN || d.isInfinite).min
      case "ymax" => ys.filterNot(d => d.isNaN || d.isInfinite).max
      case "area" =>
        gs.polys.map(p => (math.abs(GeoM.signedArea2(p.outer)) -
          p.holes.map(h => math.abs(GeoM.signedArea2(h))).sum) / 2).sum
      case "length" =>
        def pathLen(path: Seq[(Double, Double)], closed: Boolean): Double = {
          val loop = if (closed) path :+ path.head else path
          loop.sliding(2).map { case Seq(a, b) =>
            math.hypot(b._1 - a._1, b._2 - a._2) }.sum
        }
        gs.lines.map(pathLen(_, closed = false)).sum +
          gs.rings.map(pathLen(_, closed = true)).sum
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = s"st_$measure"
}

/** ST_Centroid (GeoFunctions.java stCentroid): vertex mean for points/lines,
  * area-weighted centroid for polygons. */
case class StCentroid(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = Geo.geometryType
  override protected def nullSafeEval(v: Any): Any = {
    val (t, xs, ys) = Geo.unpack(v)
    if (Geo.isMulti(t, xs)) {
      val gs = GeoM.decode(t, xs, ys)
      val (cx, cy) =
        if (gs.polys.nonEmpty) {
          // signed-ring shoelace centroid: outers CCW (+), holes CW (−)
          var a = 0.0; var sx = 0.0; var sy = 0.0
          gs.rings.foreach { r =>
            val n = r.length
            var i = 0
            while (i < n) {
              val j = (i + 1) % n
              val cr = r(i)._1 * r(j)._2 - r(j)._1 * r(i)._2
              a += cr; sx += (r(i)._1 + r(j)._1) * cr; sy += (r(i)._2 + r(j)._2) * cr
              i += 1
            }
          }
          if (a == 0) {
            val pts = gs.rings.flatten
            (pts.map(_._1).sum / pts.length, pts.map(_._2).sum / pts.length)
          } else (sx / (3 * a), sy / (3 * a))
        } else {
          val pts = gs.points ++ gs.lines.flatten
          (pts.map(_._1).sum / pts.length, pts.map(_._2).sum / pts.length)
        }
      return Geo.row("POINT", Array(cx), Array(cy))
    }
    val (cx, cy) =
      if (t == "POLYGON" && xs.length >= 3) {
        var a = 0.0; var sx = 0.0; var sy = 0.0
        val n = xs.length
        var i = 0
        while (i < n) {
          val j = (i + 1) % n
          val cross = xs(i) * ys(j) - xs(j) * ys(i)
          a += cross; sx += (xs(i) + xs(j)) * cross; sy += (ys(i) + ys(j)) * cross
          i += 1
        }
        if (a == 0) (xs.sum / xs.length, ys.sum / ys.length)
        else (sx / (3 * a), sy / (3 * a))
      } else (xs.sum / xs.length, ys.sum / ys.length)
    Geo.row("POINT", Array(cx), Array(cy))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** ST_Envelope: bounding-box polygon. */
case class StEnvelope(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = Geo.geometryType
  override protected def nullSafeEval(v: Any): Any = {
    val (_, xs0, ys0) = Geo.unpack(v)
    val keep = xs0.indices.filterNot(i => xs0(i).isNaN || xs0(i).isInfinite)
    val xs = keep.map(xs0).toArray; val ys = keep.map(ys0).toArray
    val (x0, x1, y0, y1) = (xs.min, xs.max, ys.min, ys.max)
    Geo.row("POLYGON", Array(x0, x1, x1, x0), Array(y0, y0, y1, y1))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Boolean geometry predicates (ST_Contains / ST_Within / ST_Intersects). */
case class GeoPredicate(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = Geo.unpack(l); val b = Geo.unpack(r)
    if (Geo.isMulti(a._1, a._2) || Geo.isMulti(b._1, b._2))
      return multiEval(a, b)
    op match {
      case "contains" => Geo.contains(a, b)
      case "within" => Geo.contains(b, a)
      case "intersects" => Geo.intersects(a, b)
      case "disjoint" => !(Geo.intersects(a, b) ||
        Geo.contains(a, b) || Geo.contains(b, a))
      case "touches" => Geo.touches(a, b)
      case "crosses" => Geo.crosses(a, b)
      case "overlaps" => Geo.overlaps(a, b)
    }
  }

  /** Multi-part evaluation: the set-theoretic predicates go through the
    * clipping engine (exact under even-odd semantics); the interior-based
    * relations fall back to pairwise simple-part checks (holes
    * approximated by their outer rings). */
  private def multiEval(a: (String, Array[Double], Array[Double]),
      b: (String, Array[Double], Array[Double])): Boolean = {
    val ga = GeoM.decode(a._1, a._2, a._3)
    val gb = GeoM.decode(b._1, b._2, b._3)
    def inter = GeoClip.setOp(ga, gb, "intersection")
    def parts(gs: GeoM.GSet): Seq[(String, Array[Double], Array[Double])] =
      gs.points.map(p => ("POINT", Array(p._1), Array(p._2))) ++
        gs.lines.map(l => ("LINESTRING", l.map(_._1).toArray, l.map(_._2).toArray)) ++
        gs.polys.map(p => ("POLYGON", p.outer.map(_._1).toArray, p.outer.map(_._2).toArray))
    op match {
      case "contains" =>
        GeoClip.setOp(gb, ga, "difference").isEmpty && !inter.isEmpty
      case "within" =>
        GeoClip.setOp(ga, gb, "difference").isEmpty && !inter.isEmpty
      case "intersects" => !inter.isEmpty
      case "disjoint" => inter.isEmpty
      case "touches" =>
        val i = inter
        !i.isEmpty && i.polys.isEmpty &&
          !parts(ga).exists(pa => parts(gb).exists(pb =>
            Geo.interiorsIntersect(pa, pb)))
      case "crosses" =>
        parts(ga).exists(pa => parts(gb).exists(pb => Geo.crosses(pa, pb)))
      case "overlaps" =>
        parts(ga).exists(pa => parts(gb).exists(pb => Geo.overlaps(pa, pb)))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = s"st_$op"
}

/** ST_Distance (GeoFunctions.java stDistance): Euclidean minimum. */
case class StDistance(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = Geo.unpack(l); val b = Geo.unpack(r)
    if (Geo.isMulti(a._1, a._2) || Geo.isMulti(b._1, b._2)) {
      def parts(t: (String, Array[Double], Array[Double])) = {
        val gs = GeoM.decode(t._1, t._2, t._3)
        gs.points.map(p => ("POINT", Array(p._1), Array(p._2))) ++
          gs.lines.map(x => ("LINESTRING", x.map(_._1).toArray, x.map(_._2).toArray)) ++
          gs.polys.map(p => ("POLYGON", p.outer.map(_._1).toArray, p.outer.map(_._2).toArray))
      }
      parts(a).flatMap(pa => parts(b).map(pb => Geo.distance(pa, pb))).min
    } else Geo.distance(a, b)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Structural accessors with non-double results (ST_NumPoints,
  * ST_GeometryType, ST_IsClosed, ST_Dimension, ST_IsEmpty, ST_CoordDim,
  * ST_NumInteriorRing, ST_NumGeometries — GeoFunctions.java). */
case class GeoInfo(child: Expression, info: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = info match {
    case "numpoints" | "dimension" | "coorddim" => IntegerType
    case "numinteriorring" | "numgeometries" => IntegerType
    case "geometrytype" => StringType
    case "isclosed" | "isempty" => BooleanType
    case "issimple" | "isring" | "isvalid" => BooleanType
  }
  // numinteriorring is null off-type even for non-null input
  override def nullable: Boolean = info == "numinteriorring" || super.nullable
  override protected def nullSafeEval(v: Any): Any = {
    val (t, xs, ys) = Geo.unpack(v)
    val base = t.split(":")(0)
    val multi = Geo.isMulti(t, xs)
    info match {
      case "numpoints" =>
        if (!multi) { if (t == "POLYGON") xs.length + 1 else xs.length }
        else {
          val gs = GeoM.decode(t, xs, ys)
          gs.points.length + gs.lines.map(_.length).sum +
            gs.rings.map(_.length + 1).sum
        }
      case "geometrytype" => UTF8String.fromString(base)
      case "isclosed" =>
        base == "POLYGON" || base == "MULTIPOLYGON" || {
          base.endsWith("LINESTRING") && {
            val gs = GeoM.decode(t, xs, ys)
            gs.lines.nonEmpty && gs.lines.forall(l => l.head == l.last)
          }
        }
      case "dimension" =>
        if (!multi) base match {
          case "POINT" | "MULTIPOINT" => 0
          case "LINESTRING" => 1
          case "POLYGON" => 2
        } else {
          val gs = GeoM.decode(t, xs, ys)
          if (gs.polys.nonEmpty) 2 else if (gs.lines.nonEmpty) 1 else 0
        }
      case "isempty" => xs.isEmpty
      case "coorddim" => 2
      // null for non-polygons (the reference returns null off-type too)
      case "numinteriorring" =>
        if (base == "POLYGON")
          GeoM.decode(t, xs, ys).polys.headOption.map(_.holes.length).getOrElse(0)
        else null
      case "numgeometries" =>
        if (xs.isEmpty) 0 else GeoM.declaredParts(t, xs, ys).length
      case "issimple" =>
        if (!multi) Geo.isSimple(t, xs, ys)
        else GeoM.declaredParts(t, xs, ys).forall { case (pt, pxs, pys) =>
          Geo.isSimple(pt, pxs, pys) }
      case "isring" =>
        t == "LINESTRING" && xs.length > 1 &&
          xs.head == xs.last && ys.head == ys.last &&
          Geo.isSimple(t, xs, ys)
      case "isvalid" =>
        if (!multi && t == "POLYGON")
          xs.zip(ys).distinct.length >= 3 && Geo.isSimple(t, xs, ys)
        else if (base == "MULTIPOINT")
          GeoM.decode(t, xs, ys).points.distinct.length == xs.length
        else if (!multi) true
        else GeoM.decode(t, xs, ys).rings.forall(r =>
          r.distinct.length >= 3 &&
            Geo.isSimple("POLYGON", r.map(_._1).toArray, r.map(_._2).toArray))
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = s"st_$info"
}

/** LINESTRING vertex accessors (ST_StartPoint / ST_EndPoint / ST_PointN —
  * GeoFunctions.java): POINT result; ST_PointN is 1-based and NULL for ANY
  * out-of-range index, negatives included (reference semantics).
  * `fromEnd` is the internal flag for ST_EndPoint (index 1 = last vertex);
  * user-facing st_pointn never sets it. */
case class StLinePoint(line: Expression, n: Expression,
    fromEnd: Boolean = false)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = line
  override def right: Expression = n
  override def dataType: DataType = Geo.geometryType
  override def nullable: Boolean = true // NULL out of range
  override protected def nullSafeEval(lv: Any, nv: Any): Any = {
    val (t, xs, ys) = Geo.unpack(lv)
    require(t == "LINESTRING", s"line accessor requires LINESTRING, got $t")
    val k = nv.asInstanceOf[Int]
    val i0 = if (fromEnd) xs.length - k else k - 1 // both 1-based
    if (k < 1 || i0 < 0 || i0 >= xs.length) null
    else Geo.row("POINT", Array(xs(i0)), Array(ys(i0)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(line = l, n = r)
}

/** ST_ExteriorRing (GeoFunctions.java stExteriorRing): the polygon shell as
  * a closed LINESTRING. */
case class StExteriorRing(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = Geo.geometryType
  override protected def nullSafeEval(v: Any): Any = {
    val (t, xs, ys) = Geo.unpack(v)
    require(t == "POLYGON", s"ST_ExteriorRing requires POLYGON, got $t")
    Geo.row("LINESTRING", xs :+ xs(0), ys :+ ys(0))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** ST_Equals (GeoFunctions.java stEquals): geometric equality on the
  * single-ring model — points exact; linestrings equal forward or
  * reversed; polygon rings equal under rotation and orientation flip. */
case class StEquals(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Geo.equalsGeom(Geo.unpack(l), Geo.unpack(r))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ST_ConvexHull (GeoFunctions.java stConvexHull): monotone-chain hull;
  * degenerate inputs keep their natural type (point / collinear line). */
case class StConvexHull(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = Geo.geometryType
  override protected def nullSafeEval(v: Any): Any = {
    val (_, xs0, ys0) = Geo.unpack(v)
    val keep = xs0.indices.filterNot(i => xs0(i).isNaN || xs0(i).isInfinite)
    val (t, hx, hy) = Geo.convexHull(keep.map(xs0).toArray, keep.map(ys0).toArray)
    Geo.row(t, hx, hy)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** ST_Boundary (GeoFunctions.java stBoundary): polygon → its shell as a
  * closed LINESTRING; open linestring → MULTIPOINT of its two endpoints;
  * closed linestring → empty MULTIPOINT; point → empty collection. */
case class StBoundary(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = Geo.geometryType
  override protected def nullSafeEval(v: Any): Any = {
    val (t, xs, ys) = Geo.unpack(v)
    t.split(":")(0) match {
      // points have an empty boundary, rendered MULTIPOINT EMPTY
      // (TestGeoFunctions.java:482-483)
      case "POINT" | "MULTIPOINT" =>
        Geo.row("MULTIPOINT", Array.empty[Double], Array.empty[Double])
      case "LINESTRING" | "MULTILINESTRING" =>
        // endpoints of each open path, in path order
        // (TestGeoFunctions.java:485-487)
        val gs = GeoM.decode(t, xs, ys)
        val ends = gs.lines.filterNot(l => l.head == l.last)
          .flatMap(l => Seq(l.head, l.last))
        Geo.row("MULTIPOINT", ends.map(_._1).toArray, ends.map(_._2).toArray)
      case "POLYGON" | "MULTIPOLYGON" =>
        // rings as a MULTILINESTRING, exterior rings CCW-normalized
        // keeping their start vertex (TestGeoFunctions.java:488-489)
        val gs = GeoM.decode(t, xs, ys)
        val paths = gs.rings.map { r =>
          val ring = if (GeoM.signedArea2(r) < 0) r.head +: r.tail.reverse else r
          ring :+ ring.head
        }
        val bx = scala.collection.mutable.ArrayBuilder.make[Double]
        val by = scala.collection.mutable.ArrayBuilder.make[Double]
        paths.zipWithIndex.foreach { case (p, i) =>
          if (i > 0) { bx += Double.NaN; by += Double.NaN }
          p.foreach { q => bx += q._1; by += q._2 }
        }
        Geo.row("MULTILINESTRING", bx.result(), by.result())
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** ST_EnvelopeAsPts (GeoFunctions.java stEnvelopeAsPts): the bounding box
  * as a 2-element array [lower-left POINT, upper-right POINT]. */
case class StEnvelopeAsPts(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(Geo.geometryType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val (_, xs0, ys0) = Geo.unpack(v)
    val keep = xs0.indices.filterNot(i => xs0(i).isNaN || xs0(i).isInfinite)
    val xs = keep.map(xs0).toArray; val ys = keep.map(ys0).toArray
    new GenericArrayData(Array[Any](
      Geo.row("POINT", Array(xs.min), Array(ys.min)),
      Geo.row("POINT", Array(xs.max), Array(ys.max))))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** ST_Geometries (GeoFunctions.java stGeometries): component array — for
  * the single-geometry model, [geometry] (NULL for an empty geometry, as
  * the reference returns for empty input). */
case class StGeometries(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(Geo.geometryType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val (t, xs, ys) = Geo.unpack(v)
    if (xs.isEmpty) null
    else new GenericArrayData(GeoM.declaredParts(t, xs, ys).map {
      case (pt, pxs, pys) => Geo.row(pt, pxs, pys): Any }.toArray)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** ST_GeometryN (GeoFunctions.java stGeometryN): 1-based component access —
  * the single-geometry model has exactly one component; out of range → NULL
  * (reference semantics). */
case class StGeometryN(geom: Expression, n: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = geom
  override def right: Expression = n
  override def dataType: DataType = Geo.geometryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(gv: Any, nv: Any): Any = {
    val (t, xs, ys) = Geo.unpack(gv)
    val parts = GeoM.declaredParts(t, xs, ys)
    val k = nv.asInstanceOf[Int]
    if (k >= 1 && k <= parts.length) {
      val (pt, pxs, pys) = parts(k - 1)
      Geo.row(pt, pxs, pys)
    } else null
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(geom = l, n = r)
}

/** ST_InteriorRingN / ST_InteriorRings (GeoFunctions.java): the single-ring
  * polygon model has no holes — N-access is always out of range (NULL), the
  * ring array is empty; both still require POLYGON input like the
  * reference. */
case class StInteriorRings(child: Expression, indexed: Boolean,
    n: Option[Expression] = None)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = child +: n.toSeq
  override def dataType: DataType =
    if (indexed) Geo.geometryType
    else ArrayType(Geo.geometryType, containsNull = false)
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val (t, xs, ys) = Geo.unpack(v)
    require(t.split(":")(0) == "POLYGON",
      s"interior-ring accessor requires POLYGON, got $t")
    val holes = GeoM.decode(t, xs, ys).polys.headOption
      .map(_.holes).getOrElse(Vector.empty)
    def ringRow(h: Vector[(Double, Double)]): Any = {
      val closed = h :+ h.head
      Geo.row("LINESTRING", closed.map(_._1).toArray, closed.map(_._2).toArray)
    }
    if (indexed) {
      val k = n.map(_.eval(input)).orNull
      if (k == null) null
      else {
        val i = k.asInstanceOf[Int]
        if (i >= 1 && i <= holes.length) ringRow(holes(i - 1)) else null
      }
    } else new GenericArrayData(holes.map(ringRow).toArray)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(child = c.head, n = c.drop(1).headOption)
}
