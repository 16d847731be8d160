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
    if (n < 2) Seq.empty
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

  private val Num = """[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"""
  private val PointRe = s"""(?i)\\s*POINT\\s*\\(\\s*($Num)\\s+($Num)\\s*\\)\\s*""".r
  private val LineRe = """(?i)\s*LINESTRING\s*\((.*)\)\s*""".r
  private val PolyRe = """(?i)\s*POLYGON\s*\(\s*\((.*)\)\s*\)\s*""".r

  def parseWkt(wkt: String): (String, Array[Double], Array[Double]) = wkt match {
    case PointRe(x, y) => ("POINT", Array(x.toDouble), Array(y.toDouble))
    case LineRe(body) =>
      val (xs, ys) = parseCoords(body); ("LINESTRING", xs, ys)
    case PolyRe(body) =>
      var (xs, ys) = parseCoords(body)
      // WKT rings repeat the first vertex last; store the open ring
      if (xs.length > 1 && xs.head == xs.last && ys.head == ys.last) {
        xs = xs.dropRight(1); ys = ys.dropRight(1)
      }
      ("POLYGON", xs, ys)
    case other => throw new IllegalArgumentException(s"Cannot parse WKT: $other")
  }

  private def parseCoords(body: String): (Array[Double], Array[Double]) = {
    val pts = body.split(",").map(_.trim).filter(_.nonEmpty).map { p =>
      val parts = p.split("\\s+")
      (parts(0).toDouble, parts(1).toDouble)
    }
    (pts.map(_._1), pts.map(_._2))
  }

  def toWkt(gtype: String, xs: Array[Double], ys: Array[Double]): String = {
    def fmt(d: Double): String =
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    gtype match {
      case "POINT" => s"POINT (${fmt(xs(0))} ${fmt(ys(0))})"
      case "LINESTRING" =>
        s"LINESTRING (${xs.indices.map(i => s"${fmt(xs(i))} ${fmt(ys(i))}").mkString(", ")})"
      case "POLYGON" =>
        val ring = xs.indices.map(i => s"${fmt(xs(i))} ${fmt(ys(i))}") :+
          s"${fmt(xs(0))} ${fmt(ys(0))}"
        s"POLYGON ((${ring.mkString(", ")}))"
    }
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
    val (_, xs, ys) = Geo.unpack(v)
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
    op match {
      case "contains" => Geo.contains(a, b)
      case "within" => Geo.contains(b, a)
      case "intersects" => Geo.intersects(a, b)
      case "disjoint" => !(Geo.intersects(a, b) ||
        Geo.contains(a, b) || Geo.contains(b, a))
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
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Geo.distance(Geo.unpack(l), Geo.unpack(r))
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
  }
  // numinteriorring is null off-type even for non-null input
  override def nullable: Boolean = info == "numinteriorring" || super.nullable
  override protected def nullSafeEval(v: Any): Any = {
    val (t, xs, _) = Geo.unpack(v)
    info match {
      case "numpoints" => if (t == "POLYGON") xs.length + 1 else xs.length
      case "geometrytype" => UTF8String.fromString(t)
      case "isclosed" => t == "POLYGON"
      case "dimension" => t match {
        case "POINT" => 0; case "LINESTRING" => 1; case "POLYGON" => 2
      }
      case "isempty" => xs.isEmpty
      case "coorddim" => 2
      // single-ring model: polygons have no holes; null for non-polygons
      // (the reference returns null off-type too)
      case "numinteriorring" => if (t == "POLYGON") 0 else null
      case "numgeometries" => if (xs.isEmpty) 0 else 1
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
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (ta, axs, ays) = Geo.unpack(l)
    val (tb, bxs, bys) = Geo.unpack(r)
    if (ta != tb || axs.length != bxs.length) false
    else {
      val a = axs.zip(ays).toSeq
      val b = bxs.zip(bys).toSeq
      ta match {
        case "POINT" => a == b
        case "LINESTRING" => a == b || a == b.reverse
        case "POLYGON" =>
          def rot(s: Seq[(Double, Double)], k: Int) = s.drop(k) ++ s.take(k)
          b.indices.exists(k => rot(b, k) == a) ||
            b.indices.exists(k => rot(b.reverse, k) == a)
      }
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
