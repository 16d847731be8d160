package graft.functions

import scala.collection.mutable

/** Multi-geometry model + clipping constructors
  * (presto-geospatial/.../GeoFunctions.java:
  * stUnion:700, stIntersection:585, stDifference:545, stSymDifference:620,
  * stBuffer:200 in the reference — there backed by the ESRI geometry
  * library; here an original implementation).
  *
  * Representation stays the columnar `(gtype, xs, ys)` struct of
  * [[Geo.geometryType]]:
  *  - POINT / LINESTRING / single-ring POLYGON: as before (flat arrays).
  *  - MULTIPOINT: flat coordinate pairs (one per point).
  *  - MULTILINESTRING: paths separated by a (NaN, NaN) entry.
  *  - POLYGON with holes / MULTIPOLYGON: rings separated by (NaN, NaN);
  *    ring orientation encodes grouping — a CCW ring starts a new part,
  *    each following CW ring is a hole of that part (orientation is
  *    normalized when such geometries are constructed or parsed).
  *  - GEOMETRYCOLLECTION: top-level parts separated by (Inf, Inf); the
  *    gtype string carries the part types: "GEOMETRYCOLLECTION:T1;T2;…".
  *
  * The boolean operators work on a dimension-grouped [[GeoM.GSet]]
  * (points / paths / polygon parts). Region booleans use a slab
  * decomposition: cut the plane at every vertex and edge-crossing y, reduce
  * each slab to sorted x-intervals per input (even-odd rule, so overlapping
  * rings of one multipolygon cancel exactly like the reference's
  * simplification), combine interval sets with the boolean op, then stitch
  * trapezoids back into rings. Shared edges collapse to zero-width
  * intervals and vanish, which makes the common degenerate cases
  * (touching boxes, collinear borders) exact rather than fragile special
  * cases. Lower-dimensional residues (boundary segments / touch points
  * that survive the regularized region op) are recovered from the noded
  * edge arrangement, matching the reference's GEOMETRYCOLLECTION outputs.
  *
  * All of this is per-row scalar work (no driver-side state, no
  * collect): at scale the expressions run inside the executors like any
  * other Catalyst expression.
  */
object GeoM {
  type Pt = (Double, Double)

  final case class PolyPart(outer: Vector[Pt], holes: Vector[Vector[Pt]]) {
    def rings: Vector[Vector[Pt]] = outer +: holes
  }
  /** Dimension-grouped geometry set. */
  final case class GSet(points: Vector[Pt], lines: Vector[Vector[Pt]],
      polys: Vector[PolyPart]) {
    def isEmpty: Boolean = points.isEmpty && lines.isEmpty && polys.isEmpty
    def rings: Vector[Vector[Pt]] = polys.flatMap(_.rings)
  }
  object GSet { val empty: GSet = GSet(Vector.empty, Vector.empty, Vector.empty) }

  private val SEP = Double.NaN
  private val PARTSEP = Double.PositiveInfinity

  def isSep(x: Double): Boolean = x.isNaN
  def isPartSep(x: Double): Boolean = x.isInfinite

  /** Signed ring area ×2 (shoelace); >0 = CCW. */
  def signedArea2(ring: IndexedSeq[Pt]): Double = {
    var s = 0.0
    val n = ring.length
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += ring(i)._1 * ring(j)._2 - ring(j)._1 * ring(i)._2
      i += 1
    }
    s
  }

  private def nz(d: Double): Double = if (d == 0.0) 0.0 else d // -0.0 → 0.0

  // ---------------------------------------------------------------- codec

  /** Split a coordinate array on a separator predicate. */
  private def splitOn(xs: Array[Double], ys: Array[Double],
      sep: Double => Boolean): Vector[Vector[Pt]] = {
    val out = Vector.newBuilder[Vector[Pt]]
    var cur = Vector.newBuilder[Pt]
    var any = false
    var i = 0
    while (i < xs.length) {
      if (sep(xs(i))) { out += cur.result(); cur = Vector.newBuilder[Pt]; any = true }
      else { cur += ((xs(i), ys(i))); any = true }
      i += 1
    }
    if (any) out += cur.result()
    out.result().filter(_.nonEmpty)
  }

  /** Group NaN-separated rings into parts by orientation (CCW opens a
    * part, CW rings are holes of the open part). */
  private def ringsToParts(rings: Vector[Vector[Pt]]): Vector[PolyPart] = {
    val parts = Vector.newBuilder[PolyPart]
    var outer: Vector[Pt] = null
    var holes = Vector.newBuilder[Vector[Pt]]
    rings.foreach { r =>
      if (outer == null || signedArea2(r) >= 0) {
        if (outer != null) parts += PolyPart(outer, holes.result())
        outer = r; holes = Vector.newBuilder[Vector[Pt]]
      } else holes += r
    }
    if (outer != null) parts += PolyPart(outer, holes.result())
    parts.result()
  }

  /** Decode a (gtype, xs, ys) struct value into a [[GSet]]. */
  def decode(t: String, xs: Array[Double], ys: Array[Double]): GSet = {
    val base = t.split(":")(0)
    base match {
      case "POINT" | "MULTIPOINT" =>
        GSet(xs.indices.filterNot(i => isSep(xs(i)) || isPartSep(xs(i)))
          .map(i => (xs(i), ys(i))).toVector, Vector.empty, Vector.empty)
      case "LINESTRING" | "MULTILINESTRING" =>
        GSet(Vector.empty,
          splitOn(xs, ys, d => isSep(d) || isPartSep(d)).filter(_.length >= 2),
          Vector.empty)
      case "POLYGON" | "MULTIPOLYGON" =>
        val rings = splitOn(xs, ys, d => isSep(d) || isPartSep(d))
          .filter(_.length >= 3)
        GSet(Vector.empty, Vector.empty, ringsToParts(rings))
      case "GEOMETRYCOLLECTION" =>
        val types =
          if (t.length > "GEOMETRYCOLLECTION".length)
            t.drop("GEOMETRYCOLLECTION:".length).split(";").toVector
          else Vector.empty
        val partCoords = {
          // split on Inf part separators, keep NaN sub-separators in place
          val out = Vector.newBuilder[(Array[Double], Array[Double])]
          var cx = mutable.ArrayBuilder.make[Double]
          var cy = mutable.ArrayBuilder.make[Double]
          var i = 0
          while (i < xs.length) {
            if (isPartSep(xs(i))) {
              out += ((cx.result(), cy.result()))
              cx = mutable.ArrayBuilder.make[Double]
              cy = mutable.ArrayBuilder.make[Double]
            } else { cx += xs(i); cy += ys(i) }
            i += 1
          }
          if (types.nonEmpty) out += ((cx.result(), cy.result()))
          out.result()
        }
        types.zip(partCoords).map { case (pt, (pxs, pys)) => decode(pt, pxs, pys) }
          .foldLeft(GSet.empty)((a, b) =>
            GSet(a.points ++ b.points, a.lines ++ b.lines, a.polys ++ b.polys))
      case other => throw new IllegalArgumentException(s"Unknown geometry type: $other")
    }
  }

  /** Declared top-level parts of a geometry value, in declaration order —
    * the unit ST_NumGeometries / ST_GeometryN count. */
  def declaredParts(t: String, xs: Array[Double], ys: Array[Double])
      : Vector[(String, Array[Double], Array[Double])] = {
    val base = t.split(":")(0)
    if (xs.isEmpty) return Vector.empty
    base match {
      case "POINT" | "LINESTRING" | "POLYGON" => Vector((t, xs, ys))
      case "MULTIPOINT" =>
        xs.indices.map(i => ("POINT", Array(xs(i)), Array(ys(i)))).toVector
      case "MULTILINESTRING" =>
        splitOn(xs, ys, isSep).map(p =>
          ("LINESTRING", p.map(_._1).toArray, p.map(_._2).toArray))
      case "MULTIPOLYGON" =>
        ringsToParts(splitOn(xs, ys, isSep)).map { p =>
          val (pxs, pys) = ringCoords(p.rings)
          ("POLYGON", pxs, pys)
        }
      case "GEOMETRYCOLLECTION" =>
        val types = t.drop("GEOMETRYCOLLECTION:".length).split(";").toVector
        val coords = {
          val out = Vector.newBuilder[(Array[Double], Array[Double])]
          var cx = mutable.ArrayBuilder.make[Double]
          var cy = mutable.ArrayBuilder.make[Double]
          var i = 0
          while (i < xs.length) {
            if (isPartSep(xs(i))) {
              out += ((cx.result(), cy.result()))
              cx = mutable.ArrayBuilder.make[Double]
              cy = mutable.ArrayBuilder.make[Double]
            } else { cx += xs(i); cy += ys(i) }
            i += 1
          }
          out += ((cx.result(), cy.result()))
          out.result()
        }
        types.zip(coords).map { case (pt, (pxs, pys)) => (pt, pxs, pys) }
    }
  }

  private def ringCoords(rings: Seq[Vector[Pt]]): (Array[Double], Array[Double]) = {
    val bx = mutable.ArrayBuilder.make[Double]
    val by = mutable.ArrayBuilder.make[Double]
    rings.zipWithIndex.foreach { case (r, i) =>
      if (i > 0) { bx += SEP; by += SEP }
      r.foreach { case (x, y) => bx += x; by += y }
    }
    (bx.result(), by.result())
  }

  /** Canonical encoding of a GSet: parts sorted by (min y, min x), rings
    * rotated to start at their (min y, min x) vertex, outer rings CCW and
    * holes CW, the tightest gtype (single part downgrades to the simple
    * type, mixed dimensions become a collection, empty renders as
    * MULTIPOLYGON like the reference's operators). */
  def encode(gs: GSet): (String, Array[Double], Array[Double]) = {
    def minKey(pts: Seq[Pt]): (Double, Double) =
      pts.map { case (x, y) => (y, x) }.min
    val pts = gs.points.map { case (x, y) => (nz(x), nz(y)) }
      .sortBy { case (x, y) => (y, x) }
    val lines = gs.lines.map(canonLine).sortBy(minKey)
    val polys = gs.polys.map(canonPart).sortBy(p => minKey(p.outer))

    def coordsOf: (Array[Double], Array[Double]) = {
      val bx = mutable.ArrayBuilder.make[Double]
      val by = mutable.ArrayBuilder.make[Double]
      def sep(): Unit = { bx += SEP; by += SEP }
      var first = true
      if (pts.nonEmpty) { pts.foreach { case (x, y) => bx += x; by += y }; first = false }
      lines.foreach { l =>
        if (!first) sep(); first = false
        l.foreach { case (x, y) => bx += x; by += y }
      }
      polys.foreach { p =>
        p.rings.foreach { r =>
          if (!first) sep(); first = false
          r.foreach { case (x, y) => bx += x; by += y }
        }
      }
      (bx.result(), by.result())
    }

    val dims = Seq(pts.nonEmpty, lines.nonEmpty, polys.nonEmpty).count(identity)
    if (gs.isEmpty) ("MULTIPOLYGON", Array.empty[Double], Array.empty[Double])
    else if (dims > 1) {
      // dimension-grouped collection: points part, lines part, polys part
      val partTypes = Vector.newBuilder[String]
      val bx = mutable.ArrayBuilder.make[Double]
      val by = mutable.ArrayBuilder.make[Double]
      var first = true
      def newPart(t: String): Unit = {
        if (!first) { bx += PARTSEP; by += PARTSEP }
        first = false; partTypes += t
      }
      if (pts.nonEmpty) {
        newPart(if (pts.length == 1) "POINT" else "MULTIPOINT")
        pts.foreach { case (x, y) => bx += x; by += y }
      }
      if (lines.nonEmpty) {
        newPart(if (lines.length == 1) "LINESTRING" else "MULTILINESTRING")
        lines.zipWithIndex.foreach { case (l, i) =>
          if (i > 0) { bx += SEP; by += SEP }
          l.foreach { case (x, y) => bx += x; by += y }
        }
      }
      if (polys.nonEmpty) {
        newPart(if (polys.length == 1) "POLYGON" else "MULTIPOLYGON")
        polys.zipWithIndex.foreach { case (p, i) =>
          p.rings.zipWithIndex.foreach { case (r, j) =>
            if (i > 0 || j > 0) { bx += SEP; by += SEP }
            r.foreach { case (x, y) => bx += x; by += y }
          }
        }
      }
      (s"GEOMETRYCOLLECTION:${partTypes.result().mkString(";")}",
        bx.result(), by.result())
    } else {
      val (xs, ys) = coordsOf
      val t =
        if (pts.nonEmpty) { if (pts.length == 1) "POINT" else "MULTIPOINT" }
        else if (lines.nonEmpty) { if (lines.length == 1) "LINESTRING" else "MULTILINESTRING" }
        else if (polys.length == 1) "POLYGON"
        else "MULTIPOLYGON"
      (t, xs, ys)
    }
  }

  private def canonLine(l: Vector[Pt]): Vector[Pt] = {
    val ln = l.map { case (x, y) => (nz(x), nz(y)) }
    val closed = ln.length > 2 && ln.head == ln.last
    if (closed) {
      // rotate the closed path to start at its min (y,x) vertex
      val open = ln.dropRight(1)
      val k = open.indices.minBy(i => (open(i)._2, open(i)._1))
      val rot = open.drop(k) ++ open.take(k)
      val r = rot :+ rot.head
      // deterministic direction: second vertex smaller than second-to-last
      if (r.length > 2 && Ordering[(Double, Double)].lt(
          (r(r.length - 2)._2, r(r.length - 2)._1), (r(1)._2, r(1)._1)))
        r.reverse
      else r
    } else {
      val (hy, hx) = (ln.head._2, ln.head._1)
      val (ty, tx) = (ln.last._2, ln.last._1)
      if (Ordering[(Double, Double)].lt((ty, tx), (hy, hx))) ln.reverse else ln
    }
  }

  private def canonRing(r: Vector[Pt], ccw: Boolean): Vector[Pt] = {
    val rn = r.map { case (x, y) => (nz(x), nz(y)) }
    val oriented = if ((signedArea2(rn) > 0) == ccw) rn else rn.reverse
    val k = oriented.indices.minBy(i => (oriented(i)._2, oriented(i)._1))
    oriented.drop(k) ++ oriented.take(k)
  }

  private def canonPart(p: PolyPart): PolyPart =
    PolyPart(canonRing(p.outer, ccw = true),
      p.holes.map(canonRing(_, ccw = false)).sortBy(h =>
        h.map { case (x, y) => (y, x) }.min))

  // ----------------------------------------------------------------- WKT

  /** Full WKT parser: all seven types, EMPTY forms, optional inner parens
    * on MULTIPOINT, polygon holes, nested collection members. */
  def parse(wkt: String): (String, Array[Double], Array[Double]) = {
    val s = wkt.trim
    val upper = s.toUpperCase(java.util.Locale.ROOT)
    def body(prefix: String): String = {
      val rest = s.drop(prefix.length).trim
      if (rest.toUpperCase(java.util.Locale.ROOT) == "EMPTY") null
      else {
        if (!rest.startsWith("(") || !rest.endsWith(")"))
          throw new IllegalArgumentException(s"Cannot parse WKT: $wkt")
        rest.substring(1, rest.length - 1)
      }
    }
    def coords(str: String): Vector[Pt] =
      str.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { p =>
        val q = p.stripPrefix("(").stripSuffix(")").trim
        val parts = q.split("\\s+")
        (parts(0).toDouble, parts(1).toDouble)
      }.toVector
    /** split on top-level commas (depth 0). */
    def topSplit(str: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var depth = 0
      val cur = new StringBuilder
      str.foreach {
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; cur += ')'
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case c => cur += c
      }
      if (cur.nonEmpty) out += cur.result()
      out.result().map(_.trim).filter(_.nonEmpty)
    }
    def inner(str: String): String = {
      val t = str.trim
      if (!t.startsWith("(") || !t.endsWith(")"))
        throw new IllegalArgumentException(s"Cannot parse WKT: $wkt")
      t.substring(1, t.length - 1)
    }
    def closeRing(r: Vector[Pt]): Vector[Pt] =
      if (r.length > 1 && r.head == r.last) r.dropRight(1) else r
    def flat(pts: Seq[Vector[Pt]]): (Array[Double], Array[Double]) = {
      val bx = mutable.ArrayBuilder.make[Double]
      val by = mutable.ArrayBuilder.make[Double]
      pts.zipWithIndex.foreach { case (p, i) =>
        if (i > 0) { bx += SEP; by += SEP }
        p.foreach { case (x, y) => bx += x; by += y }
      }
      (bx.result(), by.result())
    }
    def polyRings(b: String): Vector[Vector[Pt]] = {
      val rings = topSplit(b).map(r => closeRing(coords(inner(r))))
      if (rings.isEmpty) rings
      else {
        // normalize: first ring CCW (outer), the rest CW (holes);
        // reversal keeps the start vertex (ESRI convention, visible in
        // the reference's ST_GeometryN / ST_Boundary outputs)
        def rev(r: Vector[Pt]): Vector[Pt] = r.head +: r.tail.reverse
        val outer = if (signedArea2(rings.head) < 0) rev(rings.head) else rings.head
        outer +: rings.tail.map(h => if (signedArea2(h) > 0) rev(h) else h)
      }
    }

    if (upper.startsWith("POINT")) {
      val b = body("POINT")
      if (b == null) ("POINT", Array.empty[Double], Array.empty[Double])
      else {
        val c = coords(b)
        ("POINT", Array(c.head._1), Array(c.head._2))
      }
    } else if (upper.startsWith("MULTIPOINT")) {
      val b = body("MULTIPOINT")
      if (b == null) ("MULTIPOINT", Array.empty[Double], Array.empty[Double])
      else {
        val c = coords(b)
        ("MULTIPOINT", c.map(_._1).toArray, c.map(_._2).toArray)
      }
    } else if (upper.startsWith("LINESTRING")) {
      val b = body("LINESTRING")
      if (b == null) ("LINESTRING", Array.empty[Double], Array.empty[Double])
      else {
        val c = coords(b)
        ("LINESTRING", c.map(_._1).toArray, c.map(_._2).toArray)
      }
    } else if (upper.startsWith("MULTILINESTRING")) {
      val b = body("MULTILINESTRING")
      if (b == null) ("MULTILINESTRING", Array.empty[Double], Array.empty[Double])
      else {
        val (xs, ys) = flat(topSplit(b).map(p => coords(inner(p))))
        ("MULTILINESTRING", xs, ys)
      }
    } else if (upper.startsWith("POLYGON")) {
      val b = body("POLYGON")
      if (b == null) ("POLYGON", Array.empty[Double], Array.empty[Double])
      else {
        val rings = polyRings(b)
        if (rings.length == 1)
          // single ring: keep the input orientation (legacy flat model)
          ("POLYGON", closeRing(coords(inner(b))).map(_._1).toArray,
            closeRing(coords(inner(b))).map(_._2).toArray)
        else { val (xs, ys) = flat(rings); ("POLYGON", xs, ys) }
      }
    } else if (upper.startsWith("MULTIPOLYGON")) {
      val b = body("MULTIPOLYGON")
      if (b == null) ("MULTIPOLYGON", Array.empty[Double], Array.empty[Double])
      else {
        val rings = topSplit(b).flatMap(part => polyRings(inner(part)))
        val (xs, ys) = flat(rings)
        ("MULTIPOLYGON", xs, ys)
      }
    } else if (upper.startsWith("GEOMETRYCOLLECTION")) {
      val b = body("GEOMETRYCOLLECTION")
      if (b == null)
        ("GEOMETRYCOLLECTION", Array.empty[Double], Array.empty[Double])
      else {
        val parts = topSplit(b).map(parse)
        val bx = mutable.ArrayBuilder.make[Double]
        val by = mutable.ArrayBuilder.make[Double]
        parts.zipWithIndex.foreach { case ((_, pxs, pys), i) =>
          if (i > 0) { bx += PARTSEP; by += PARTSEP }
          var j = 0
          while (j < pxs.length) { bx += pxs(j); by += pys(j); j += 1 }
        }
        (s"GEOMETRYCOLLECTION:${parts.map(_._1.split(":")(0)).mkString(";")}",
          bx.result(), by.result())
      }
    } else throw new IllegalArgumentException(s"Cannot parse WKT: $wkt")
  }

  def fmt(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** WKT renderer (ESRI output conventions: MULTIPOINT with inner parens,
    * EMPTY forms, closed rings). */
  def render(t: String, xs: Array[Double], ys: Array[Double]): String = {
    val base = t.split(":")(0)
    def pt(i: Int) = s"${fmt(xs(i))} ${fmt(ys(i))}"
    def pts(l: Seq[Pt]) = l.map { case (x, y) => s"${fmt(x)} ${fmt(y)}" }.mkString(", ")
    def ringStr(r: Vector[Pt]) = s"(${pts(r :+ r.head)})"
    base match {
      case "POINT" =>
        if (xs.isEmpty) "POINT EMPTY" else s"POINT (${pt(0)})"
      case "MULTIPOINT" =>
        if (xs.isEmpty) "MULTIPOINT EMPTY"
        else s"MULTIPOINT (${xs.indices.map(i => s"(${pt(i)})").mkString(", ")})"
      case "LINESTRING" =>
        if (xs.isEmpty) "LINESTRING EMPTY"
        else s"LINESTRING (${pts(xs.indices.map(i => (xs(i), ys(i))))})"
      case "MULTILINESTRING" =>
        if (xs.isEmpty) "MULTILINESTRING EMPTY"
        else s"MULTILINESTRING (${splitOn(xs, ys, isSep).map(l => s"(${pts(l)})").mkString(", ")})"
      case "POLYGON" =>
        if (xs.isEmpty) "POLYGON EMPTY"
        else {
          val rings = splitOn(xs, ys, isSep)
          s"POLYGON (${rings.map(ringStr).mkString(", ")})"
        }
      case "MULTIPOLYGON" =>
        if (xs.isEmpty) "MULTIPOLYGON EMPTY"
        else {
          val parts = ringsToParts(splitOn(xs, ys, isSep))
          s"MULTIPOLYGON (${parts.map(p => s"(${p.rings.map(ringStr).mkString(", ")})").mkString(", ")})"
        }
      case "GEOMETRYCOLLECTION" =>
        if (xs.isEmpty) "GEOMETRYCOLLECTION EMPTY"
        else {
          val parts = declaredParts(t, xs, ys)
          s"GEOMETRYCOLLECTION (${parts.map { case (pt2, pxs, pys) => render(pt2, pxs, pys) }.mkString(", ")})"
        }
    }
  }

  // ------------------------------------------------------- membership

  def onSegment(p: Pt, a: Pt, b: Pt): Boolean =
    Geo.distPointSegment(p._1, p._2, a._1, a._2, b._1, b._2) < 1e-9

  def onLines(p: Pt, lines: Seq[Seq[Pt]]): Boolean =
    lines.exists(l => l.indices.dropRight(1).exists(i =>
      onSegment(p, l(i), l(i + 1))))

  /** Even-odd point-in-region over a ring soup; boundary → `inclusive`. */
  def inRegion(p: Pt, rings: Seq[Vector[Pt]], inclusive: Boolean): Boolean = {
    var inside = false
    rings.foreach { r =>
      val n = r.length
      var i = 0
      var j = n - 1
      while (i < n) {
        if (onSegment(p, r(j), r(i))) return inclusive
        if ((r(i)._2 > p._2) != (r(j)._2 > p._2) &&
            p._1 < (r(j)._1 - r(i)._1) * (p._2 - r(i)._2) / (r(j)._2 - r(i)._2) + r(i)._1)
          inside = !inside
        j = i; i += 1
      }
    }
    inside
  }

  /** p ∈ closure of the geometry's point set. */
  def inClosed(p: Pt, gs: GSet): Boolean =
    gs.points.exists(q => math.hypot(q._1 - p._1, q._2 - p._2) < 1e-9) ||
      onLines(p, gs.lines) ||
      (gs.polys.nonEmpty && (inRegion(p, gs.rings, inclusive = true)))
}

/** The boolean operators over [[GeoM.GSet]]s. */
object GeoClip {
  import GeoM._

  // ------------------------------------------------ region (2-D) boolean

  private final case class Edge(x1: Double, y1: Double, x2: Double, y2: Double,
      gid: Int) {
    def xAt(y: Double): Double =
      if (y == y1) x1
      else if (y == y2) x2
      else x1 + (y - y1) * (x2 - x1) / (y2 - y1)
  }

  /** N-ary regularized region boolean: each group is an even-odd ring
    * soup; `combine` maps the per-group inside flags to result
    * membership. Returns hole-grouped polygon parts. */
  def regionNary(groups: IndexedSeq[Seq[Vector[Pt]]],
      combine: Array[Boolean] => Boolean): Vector[PolyPart] = {
    val edges = mutable.ArrayBuffer.empty[Edge]
    val nodeSet = mutable.HashSet.empty[Pt]
    val eventsB = mutable.TreeSet.empty[Double]
    groups.zipWithIndex.foreach { case (rings, gid) =>
      rings.foreach { r =>
        val n = r.length
        var i = 0
        while (i < n) {
          val (ax, ay) = r(i); val (bx, by) = r((i + 1) % n)
          nodeSet += ((ax, ay))
          eventsB += ay
          if (ay != by) { // horizontal edges carry no slab coverage
            if (ay < by) edges += Edge(ax, ay, bx, by, gid)
            else edges += Edge(bx, by, ax, ay, gid)
          }
          i += 1
        }
      }
    }
    // crossing events between any two edges (any groups — self-crossings
    // of one even-odd soup count too)
    val ne = edges.length
    var i = 0
    while (i < ne) {
      var j = i + 1
      while (j < ne) {
        val e1 = edges(i); val e2 = edges(j)
        val d1x = e1.x2 - e1.x1; val d1y = e1.y2 - e1.y1
        val d2x = e2.x2 - e2.x1; val d2y = e2.y2 - e2.y1
        val den = d1x * d2y - d1y * d2x
        if (den != 0) {
          val t = ((e2.x1 - e1.x1) * d2y - (e2.y1 - e1.y1) * d2x) / den
          val s = ((e2.x1 - e1.x1) * d1y - (e2.y1 - e1.y1) * d1x) / den
          if (t > 0 && t < 1 && s > 0 && s < 1) {
            val iy = e1.y1 + t * d1y
            val ix = e1.x1 + t * d1x
            eventsB += iy
            nodeSet += ((ix, iy))
          }
        }
        j += 1
      }
      i += 1
    }
    val events = eventsB.toIndexedSeq
    val k = groups.length

    // per slab: result trapezoid x-intervals (left/right x at y0 and y1)
    final case class Trap(var l0: Double, var l1: Double, var r0: Double, var r1: Double)
    val slabTraps = mutable.ArrayBuffer.empty[(Double, Double, Vector[Trap])]
    var si = 0
    while (si < events.length - 1) {
      val y0 = events(si); val y1 = events(si + 1)
      if (y1 > y0) {
        val mid = (y0 + y1) / 2
        val active = edges.filter(e => e.y1 <= y0 && e.y2 >= y1)
          .sortBy(e => (e.xAt(mid), e.xAt(y0), e.xAt(y1)))
        val state = new Array[Boolean](k)
        val traps = Vector.newBuilder[Trap]
        var last: Trap = null
        var insideFrom: Edge = null
        var wasIn = false
        var ai = 0
        while (ai < active.length) {
          // process coincident-position edges together
          var aj = ai
          val e0 = active(ai)
          while (aj < active.length && active(aj).xAt(y0) == e0.xAt(y0) &&
              active(aj).xAt(y1) == e0.xAt(y1)) {
            state(active(aj).gid) = !state(active(aj).gid)
            aj += 1
          }
          val nowIn = combine(state)
          if (!wasIn && nowIn) insideFrom = e0
          else if (wasIn && !nowIn) {
            val t = Trap(insideFrom.xAt(y0), insideFrom.xAt(y1),
              e0.xAt(y0), e0.xAt(y1))
            if (last != null && last.r0 == t.l0 && last.r1 == t.l1) {
              last.r0 = t.r0; last.r1 = t.r1
            } else if (!(t.l0 == t.r0 && t.l1 == t.r1)) {
              traps += t; last = t
            }
          }
          wasIn = nowIn
          ai = aj
        }
        slabTraps += ((y0, y1, traps.result().filterNot(t =>
          t.l0 == t.r0 && t.l1 == t.r1)))
      }
      si += 1
    }

    // ---- boundary edge soup (directed, interior on the left) ----
    val dEdges = mutable.ArrayBuffer.empty[(Pt, Pt)]
    def nzp(p: Pt): Pt = (if (p._1 == 0.0) 0.0 else p._1, if (p._2 == 0.0) 0.0 else p._2)
    slabTraps.foreach { case (y0, y1, traps) =>
      traps.foreach { t =>
        // left side: downward; right side: upward (interior to the left)
        if ((t.l1, y1) != ((t.l0, y0))) dEdges += ((nzp((t.l1, y1)), nzp((t.l0, y0))))
        if ((t.r0, y0) != ((t.r1, y1))) dEdges += ((nzp((t.r0, y0)), nzp((t.r1, y1))))
      }
    }
    // horizontal boundaries at each event: xor of coverage below vs above
    def intervalsAt(traps: Vector[Trap], atTop: Boolean): Vector[(Double, Double)] = {
      val raw = traps.map(t => if (atTop) (t.l1, t.r1) else (t.l0, t.r0))
        .filter(iv => iv._2 > iv._1).sortBy(_._1)
      // merge touching
      val out = mutable.ArrayBuffer.empty[(Double, Double)]
      raw.foreach { iv =>
        if (out.nonEmpty && out.last._2 >= iv._1)
          out(out.length - 1) = (out.last._1, math.max(out.last._2, iv._2))
        else out += iv
      }
      out.toVector
    }
    // nodes by y, to keep original/crossing vertices on horizontal edges
    // (the reference's outputs preserve arrangement vertices, e.g. the
    // shared corner on a merged collinear border)
    val nodesByY = nodeSet.groupBy(_._2).map { case (y, ps) =>
      (y, ps.map(_._1).toVector.sorted) }
    events.indices.foreach { ei =>
      val y = events(ei)
      val below = slabTraps.collectFirst { case (y0, y1, t) if y1 == y => t }
        .map(intervalsAt(_, atTop = true)).getOrElse(Vector.empty)
      val above = slabTraps.collectFirst { case (y0, y1, t) if y0 == y => t }
        .map(intervalsAt(_, atTop = false)).getOrElse(Vector.empty)
      // sweep the union of endpoints, plus any node x on this horizontal
      val cuts = (below.flatMap(iv => Seq(iv._1, iv._2)) ++
        above.flatMap(iv => Seq(iv._1, iv._2)) ++
        nodesByY.getOrElse(y, Vector.empty)).distinct.sorted
      var ci = 0
      while (ci < cuts.length - 1) {
        val a = cuts(ci); val b = cuts(ci + 1)
        val m = (a + b) / 2
        val inB = below.exists(iv => iv._1 <= m && m <= iv._2)
        val inA = above.exists(iv => iv._1 <= m && m <= iv._2)
        if (inB != inA) {
          if (inB) dEdges += ((nzp((b, y)), nzp((a, y)))) // interior below → leftward
          else dEdges += ((nzp((a, y)), nzp((b, y)))) // interior above → rightward
        }
        ci += 1
      }
    }

    // ---- ring assembly: smallest-CCW-turn walk ----
    val outgoing = mutable.HashMap.empty[Pt, mutable.ArrayBuffer[Int]]
    dEdges.zipWithIndex.foreach { case ((a, _), idx) =>
      outgoing.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += idx
    }
    val used = new Array[Boolean](dEdges.length)
    val rings = mutable.ArrayBuffer.empty[Vector[Pt]]
    def angle(d: Pt): Double = math.atan2(d._2, d._1)
    dEdges.indices.foreach { start =>
      if (!used(start)) {
        val ring = Vector.newBuilder[Pt]
        var cur = start
        val startPt = dEdges(start)._1
        var ok = true
        var steps = 0
        while (ok) {
          used(cur) = true
          val (a, b) = dEdges(cur)
          ring += a
          steps += 1
          if (b == startPt || steps > dEdges.length) ok = false
          else {
            val din = (b._1 - a._1, b._2 - a._2)
            val cands = outgoing.getOrElse(b, mutable.ArrayBuffer.empty)
              .filter(!used(_))
            if (cands.isEmpty) ok = false
            else {
              // smallest strictly-positive CCW turn from the incoming dir
              cur = cands.minBy { c =>
                val (_, b2) = dEdges(c)
                val dout = (b2._1 - b._1, b2._2 - b._2)
                var da = angle(dout) - angle(din)
                while (da <= 1e-12) da += 2 * math.Pi
                while (da > 2 * math.Pi) da -= 2 * math.Pi
                da
              }
            }
          }
        }
        val r = ring.result()
        if (r.length >= 3) rings += r
      }
    }

    // ---- vertex cleanup: drop slab-cut collinear vertices not in nodeSet
    def cleanup(r: Vector[Pt]): Vector[Pt] = {
      // remove consecutive duplicates
      val dedup = Vector.newBuilder[Pt]
      r.indices.foreach { i => if (r(i) != r((i + 1) % r.length)) dedup += r(i) }
      var cur = dedup.result()
      var changed = true
      while (changed) {
        changed = false
        val n = cur.length
        if (n >= 4) {
          val keep = Vector.newBuilder[Pt]
          var i = 0
          var removedAny = false
          while (i < n) {
            val p = cur((i + n - 1) % n); val q = cur(i); val r2 = cur((i + 1) % n)
            val cross = (q._1 - p._1) * (r2._2 - p._2) - (q._2 - p._2) * (r2._1 - p._1)
            val isNode = nodeSet.contains(q)
            if (math.abs(cross) < 1e-9 && !isNode && !removedAny) {
              removedAny = true; changed = true // drop q (one per pass)
            } else keep += q
            i += 1
          }
          cur = keep.result()
        }
      }
      cur
    }
    val cleaned = rings.map(cleanup).filter(r =>
      r.length >= 3 && math.abs(signedArea2(r)) > 1e-12).toVector

    // ---- group holes (CW rings) under their containing outer ----
    val outers = cleaned.filter(signedArea2(_) > 0)
    val holes = cleaned.filter(signedArea2(_) < 0)
    val assigned = outers.map(o => (o, mutable.ArrayBuffer.empty[Vector[Pt]]))
    holes.foreach { h =>
      // midpoint of the first hole edge is interior-adjacent to the hole
      val probe = ((h(0)._1 + h(1)._1) / 2, (h(0)._2 + h(1)._2) / 2)
      val containers = assigned.filter { case (o, _) =>
        Geo.pointInPolygon(probe._1, probe._2, o.map(_._1).toArray, o.map(_._2).toArray)
      }
      if (containers.nonEmpty)
        containers.minBy { case (o, _) => math.abs(signedArea2(o)) }._2 += h
    }
    assigned.map { case (o, hs) => PolyPart(o, hs.toVector) }
  }

  def regionOp(a: Seq[Vector[Pt]], b: Seq[Vector[Pt]],
      op: (Boolean, Boolean) => Boolean): Vector[PolyPart] =
    regionNary(IndexedSeq(a, b), st => op(st(0), st(1)))

  // -------------------------------------------------- 1-D arrangement

  private def segsOf(paths: Seq[Seq[Pt]]): Vector[(Pt, Pt)] =
    paths.iterator.flatMap(l => l.indices.dropRight(1).map(i => (l(i), l(i + 1))))
      .filter(s => s._1 != s._2).toVector

  private def ringSegs(rings: Seq[Vector[Pt]]): Vector[(Pt, Pt)] =
    rings.iterator.flatMap { r =>
      r.indices.map(i => (r(i), r((i + 1) % r.length)))
    }.filter(s => s._1 != s._2).toVector

  /** Cut each segment at every point where a cutter segment or point
    * touches it; returns sub-segments. */
  private def nodeSegs(segs: Seq[(Pt, Pt)], cutters: Seq[(Pt, Pt)],
      cutPts: Seq[Pt]): Vector[(Pt, Pt)] = {
    val out = Vector.newBuilder[(Pt, Pt)]
    segs.foreach { case (a, b) =>
      val dx = b._1 - a._1; val dy = b._2 - a._2
      val len2 = dx * dx + dy * dy
      def tOf(p: Pt): Double = ((p._1 - a._1) * dx + (p._2 - a._2) * dy) / len2
      val ts = mutable.TreeSet(0.0, 1.0)
      cutters.foreach { case (c, d) =>
        // endpoints of the cutter on this segment
        Seq(c, d).foreach { p => if (onSegment(p, a, b)) ts += tOf(p) }
        // proper crossing
        val d2x = d._1 - c._1; val d2y = d._2 - c._2
        val den = dx * d2y - dy * d2x
        if (den != 0) {
          val t = ((c._1 - a._1) * d2y - (c._2 - a._2) * d2x) / den
          val s = ((c._1 - a._1) * dy - (c._2 - a._2) * dx) / den
          if (t > 0 && t < 1 && s >= 0 && s <= 1) ts += t
        }
      }
      cutPts.foreach { p => if (onSegment(p, a, b)) ts += tOf(p) }
      val tsv = ts.toVector.filter(t => t >= 0 && t <= 1)
      tsv.indices.dropRight(1).foreach { i =>
        val p = (a._1 + tsv(i) * dx, a._2 + tsv(i) * dy)
        val q = (a._1 + tsv(i + 1) * dx, a._2 + tsv(i + 1) * dy)
        // snap endpoints to exact input coordinates
        def snap(p0: Pt, t: Double): Pt =
          if (t == 0.0) a else if (t == 1.0) b else p0
        val ps = snap(p, tsv(i)); val qs = snap(q, tsv(i + 1))
        if (ps != qs) out += ((ps, qs))
      }
    }
    out.result()
  }

  private def segKey(s: (Pt, Pt)): (Pt, Pt) =
    if (Ordering[(Double, Double)].lteq((s._1._2, s._1._1), (s._2._2, s._2._1))) s
    else (s._2, s._1)

  private def mid(s: (Pt, Pt)): Pt =
    ((s._1._1 + s._2._1) / 2, (s._1._2 + s._2._2) / 2)

  /** Chain kept segments into paths, merging through degree-2 vertices
    * only (reference behavior: touching results stay split at junction
    * nodes, and all noding vertices are preserved). */
  private def chain(segs: Vector[(Pt, Pt)]): Vector[Vector[Pt]] = {
    val uniq = segs.map(segKey).distinct
    val adj = mutable.HashMap.empty[Pt, mutable.ArrayBuffer[Int]]
    uniq.zipWithIndex.foreach { case ((a, b), i) =>
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += i
      adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += i
    }
    val used = new Array[Boolean](uniq.length)
    val paths = mutable.ArrayBuffer.empty[Vector[Pt]]
    def other(i: Int, p: Pt): Pt = if (uniq(i)._1 == p) uniq(i)._2 else uniq(i)._1
    // start walks from junction/terminal vertices first
    val starts = adj.keys.toVector.sortBy(p => (adj(p).length == 2, p._2, p._1))
    starts.foreach { s =>
      if (adj(s).length != 2) {
        adj(s).foreach { e0 =>
          if (!used(e0)) {
            val path = Vector.newBuilder[Pt]
            path += s
            var cur = e0
            var at = other(e0, s)
            used(e0) = true
            path += at
            var go = true
            while (go && adj(at).length == 2) {
              val nxt = adj(at).find(e => !used(e))
              nxt match {
                case Some(e) =>
                  used(e) = true; at = other(e, at); path += at
                case None => go = false
              }
            }
            paths += path.result()
          }
        }
      }
    }
    // leftover closed loops (all degree 2)
    uniq.indices.foreach { i =>
      if (!used(i)) {
        val path = Vector.newBuilder[Pt]
        val s = uniq(i)._1
        path += s
        used(i) = true
        var at = uniq(i)._2
        path += at
        var go = true
        while (go && at != s) {
          adj(at).find(e => !used(e)) match {
            case Some(e) => used(e) = true; at = other(e, at); path += at
            case None => go = false
          }
        }
        paths += path.result()
      }
    }
    paths.toVector
  }

  // --------------------------------------------------------- set ops

  /** One of union / intersection / difference / symdifference. */
  def setOp(a: GSet, b: GSet, op: String): GSet = {
    val polys: Vector[PolyPart] = op match {
      case "union" => regionOp(a.rings, b.rings, _ || _)
      case "intersection" => regionOp(a.rings, b.rings, _ && _)
      case "difference" => regionOp(a.rings, b.rings, (x, y) => x && !y)
      case "symdifference" => regionOp(a.rings, b.rings, _ ^ _)
    }
    val resRings = polys.flatMap(_.rings)
    def inResult(p: Pt): Boolean =
      resRings.nonEmpty && inRegion(p, resRings, inclusive = true)

    val allCutters = segsOf(a.lines) ++ segsOf(b.lines) ++
      ringSegs(a.rings) ++ ringSegs(b.rings)
    // POINT operands do not cut paths: a union with an on-line point
    // absorbs it without adding a vertex (reference testSTUnion)
    val allCutPts = Seq.empty[Pt]

    def pieces(paths: Seq[Seq[Pt]]): Vector[(Pt, Pt)] =
      nodeSegs(segsOf(paths), allCutters, allCutPts)
    def ringPieces(rings: Seq[Vector[Pt]]): Vector[(Pt, Pt)] =
      nodeSegs(ringSegs(rings), allCutters, allCutPts)

    val lineSegs: Vector[(Pt, Pt)] = (op match {
      case "union" =>
        nodeSegs(segsOf(a.lines ++ b.lines), allCutters, allCutPts)
          .filterNot(s => inResult(mid(s)))
      case "intersection" =>
        val fromLines =
          pieces(a.lines).filter(s => inClosed(mid(s), b)) ++
            pieces(b.lines).filter(s => inClosed(mid(s), a))
        val residues =
          ringPieces(a.rings).filter(s => inClosed(mid(s), b)) ++
            ringPieces(b.rings).filter(s => inClosed(mid(s), a))
        (fromLines ++ residues).filterNot(s => inResult(mid(s)))
      case "difference" =>
        pieces(a.lines).filterNot(s => inClosed(mid(s), b))
      case "symdifference" =>
        pieces(a.lines).filterNot(s => inClosed(mid(s), b)) ++
          pieces(b.lines).filterNot(s => inClosed(mid(s), a))
    }).map(segKey).distinct
    val lines = chain(lineSegs)
    def onResultLines(p: Pt): Boolean = onLines(p, lines)

    val points: Vector[Pt] = (op match {
      case "union" =>
        a.points ++ b.points
      case "intersection" =>
        val fromPts = a.points.filter(inClosed(_, b)) ++
          b.points.filter(inClosed(_, a))
        // crossing / touch nodes between the two arrangements
        val carA = segsOf(a.lines) ++ ringSegs(a.rings)
        val carB = segsOf(b.lines) ++ ringSegs(b.rings)
        val nodes = mutable.ArrayBuffer.empty[Pt]
        carA.foreach { case (p1, p2) =>
          carB.foreach { case (q1, q2) =>
            val d1x = p2._1 - p1._1; val d1y = p2._2 - p1._2
            val d2x = q2._1 - q1._1; val d2y = q2._2 - q1._2
            val den = d1x * d2y - d1y * d2x
            if (den != 0) {
              val t = ((q1._1 - p1._1) * d2y - (q1._2 - p1._2) * d2x) / den
              val s = ((q1._1 - p1._1) * d1y - (q1._2 - p1._2) * d1x) / den
              if (t >= 0 && t <= 1 && s >= 0 && s <= 1)
                nodes += ((p1._1 + t * d1x, p1._2 + t * d1y))
            } else {
              Seq(q1, q2).foreach(q => if (onSegment(q, p1, p2)) nodes += q)
              Seq(p1, p2).foreach(p => if (onSegment(p, q1, q2)) nodes += p)
            }
          }
        }
        fromPts ++ nodes.filter(p => inClosed(p, a) && inClosed(p, b))
      case "difference" =>
        a.points.filterNot(inClosed(_, b))
      case "symdifference" =>
        a.points.filterNot(inClosed(_, b)) ++ b.points.filterNot(inClosed(_, a))
    }).filterNot(p => inResult(p) || onResultLines(p))
    val dedupPts = {
      val out = mutable.ArrayBuffer.empty[Pt]
      points.foreach { p =>
        if (!out.exists(q => math.hypot(q._1 - p._1, q._2 - p._2) < 1e-9))
          out += p
      }
      out.toVector
    }

    GSet(dedupPts, lines, polys)
  }

  // ------------------------------------------------------------ buffer

  /** Round-join buffer: the union of per-vertex disks (96-gon),
    * per-segment rectangles, and (for polygons) the part itself. */
  def buffer(gs: GSet, d: Double): GSet = {
    val groups = mutable.ArrayBuffer.empty[Seq[Vector[Pt]]]
    val N = 96
    def disk(c: Pt): Vector[Pt] =
      (0 until N).map { i =>
        val a = 2 * math.Pi * i / N
        (c._1 + d * math.cos(a), c._2 + d * math.sin(a))
      }.toVector
    def rect(a: Pt, b: Pt): Vector[Pt] = {
      val dx = b._1 - a._1; val dy = b._2 - a._2
      val len = math.hypot(dx, dy)
      val nx = -dy / len * d; val ny = dx / len * d
      Vector((a._1 + nx, a._2 + ny), (b._1 + nx, b._2 + ny),
        (b._1 - nx, b._2 - ny), (a._1 - nx, a._2 - ny))
    }
    gs.points.foreach(p => groups += Seq(disk(p)))
    gs.lines.foreach { l =>
      l.foreach(p => groups += Seq(disk(p)))
      l.indices.dropRight(1).foreach { i =>
        if (l(i) != l(i + 1)) groups += Seq(rect(l(i), l(i + 1)))
      }
    }
    gs.polys.foreach { part =>
      groups += part.rings.map(identity)
      part.rings.foreach { r =>
        r.foreach(p => groups += Seq(disk(p)))
        r.indices.foreach { i =>
          val a = r(i); val b = r((i + 1) % r.length)
          if (a != b) groups += Seq(rect(a, b))
        }
      }
    }
    GSet(Vector.empty, Vector.empty,
      regionNary(groups.toIndexedSeq, st => st.exists(identity)))
  }
}

// ======================================================== expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ST_Union / ST_Intersection / ST_Difference / ST_SymDifference
  * (GeoFunctions.java stUnion / stIntersection / stDifference /
  * stSymDifference). */
case class StClipOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = Geo.geometryType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (ta, axs, ays) = Geo.unpack(l)
    val (tb, bxs, bys) = Geo.unpack(r)
    if (op == "union") {
      // the reference rejects collections for ST_Union with this message
      Seq(ta, tb).foreach { t =>
        if (t.split(":")(0) == "GEOMETRYCOLLECTION")
          throw new IllegalArgumentException(
            "ST_Union only applies to POINT or MULTI_POINT or LINE_STRING " +
              "or MULTI_LINE_STRING or POLYGON or MULTI_POLYGON. " +
              "Input type is: GEOMETRY_COLLECTION")
      }
    }
    val a = GeoM.decode(ta, axs, ays)
    val b = GeoM.decode(tb, bxs, bys)
    // empty operand short-circuits: set identity for union/difference
    val res =
      if (a.isEmpty && b.isEmpty) GeoM.GSet.empty
      else if (a.isEmpty) {
        if (op == "union" || op == "symdifference") return r
        else GeoM.GSet.empty
      } else if (b.isEmpty) {
        if (op == "intersection") GeoM.GSet.empty
        else return l
      } else GeoClip.setOp(a, b, op)
    val (t, xs, ys) = GeoM.encode(res)
    Geo.row(t, xs, ys)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = s"st_$op"
}

/** ST_Buffer (GeoFunctions.java stBuffer): round-join outward buffer;
  * negative/NaN distances are rejected with the reference's messages,
  * zero distance is the identity, +Infinity yields the empty geometry
  * and an empty input yields NULL — all reference behaviors. */
case class StBuffer(geom: Expression, dist: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = geom
  override def right: Expression = dist
  override def dataType: DataType = Geo.geometryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(g: Any, dv: Any): Any = {
    val d = dv.asInstanceOf[Double]
    require(!d.isNaN, "distance is NaN")
    require(d >= 0, "distance is negative")
    val (t, xs, ys) = Geo.unpack(g)
    if (xs.isEmpty) return null
    if (d == 0) return g
    if (d.isInfinite)
      return Geo.row("MULTIPOLYGON", Array.empty[Double], Array.empty[Double])
    val res = GeoClip.buffer(GeoM.decode(t, xs, ys), d)
    val (rt, rxs, rys) = GeoM.encode(res)
    Geo.row(rt, rxs, rys)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(geom = l, dist = r)
}

/** line_locate_point (GeoFunctions.java lineLocatePoint): fraction of the
  * line's length at the point closest to the given point; NULL for empty
  * inputs; type-checked like the reference. */
case class LineLocatePoint(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (tl, lxs, lys) = Geo.unpack(l)
    val (tp, pxs, pys) = Geo.unpack(r)
    if (lxs.isEmpty || pxs.isEmpty) return null
    val baseL = tl.split(":")(0)
    require(baseL == "LINESTRING" || baseL == "MULTILINESTRING",
      s"First argument to line_locate_point must be a LineString or a MultiLineString. Got: $baseL")
    require(tp.split(":")(0) == "POINT",
      s"Second argument to line_locate_point must be a Point. Got: ${tp.split(":")(0)}")
    val paths = GeoM.decode(tl, lxs, lys).lines
    val (px, py) = (pxs(0), pys(0))
    var total = 0.0
    var bestDist = Double.MaxValue
    var bestAt = 0.0
    paths.foreach { path =>
      path.indices.dropRight(1).foreach { i =>
        val (ax, ay) = path(i); val (bx, by) = path(i + 1)
        val segLen = math.hypot(bx - ax, by - ay)
        val dd = Geo.distPointSegment(px, py, ax, ay, bx, by)
        if (dd < bestDist) {
          bestDist = dd
          // parameter of the projection, clamped to the segment
          val len2 = segLen * segLen
          val t = if (len2 == 0) 0.0
            else math.max(0.0, math.min(1.0,
              ((px - ax) * (bx - ax) + (py - ay) * (by - ay)) / len2))
          bestAt = total + t * segLen
        }
        total += segLen
      }
    }
    if (total == 0) 0.0 else bestAt / total
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "line_locate_point"
}

/** simplify_geometry (GeoFunctions.java simplifyGeometry): Douglas-Peucker
  * per path/ring; tolerance is validated like the reference. */
case class SimplifyGeometry(geom: Expression, tol: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = geom
  override def right: Expression = tol
  override def dataType: DataType = Geo.geometryType

  private def dp(pts: Vector[(Double, Double)], eps: Double): Vector[(Double, Double)] = {
    if (pts.length < 3) return pts
    var maxD = 0.0
    var idx = 0
    val (a, b) = (pts.head, pts.last)
    var i = 1
    while (i < pts.length - 1) {
      val d = Geo.distPointSegment(pts(i)._1, pts(i)._2, a._1, a._2, b._1, b._2)
      if (d > maxD) { maxD = d; idx = i }
      i += 1
    }
    if (maxD <= eps) Vector(a, b)
    else dp(pts.take(idx + 1), eps) ++ dp(pts.drop(idx), eps).tail
  }

  override protected def nullSafeEval(g: Any, tv: Any): Any = {
    val eps = tv.asInstanceOf[Double]
    require(!eps.isNaN, "distanceTolerance is NaN")
    require(eps >= 0, "distanceTolerance is negative")
    if (eps == 0) return g
    val (t, xs, ys) = Geo.unpack(g)
    val gs = GeoM.decode(t, xs, ys)
    val simplified = GeoM.GSet(
      gs.points,
      gs.lines.map(dp(_, eps)).filter(_.length >= 2),
      gs.polys.flatMap { p =>
        // close the ring for DP, reopen after
        def simpRing(r: Vector[(Double, Double)]): Vector[(Double, Double)] = {
          val closed = dp(r :+ r.head, eps)
          val open = closed.dropRight(1)
          open
        }
        val outer = simpRing(p.outer)
        if (outer.length < 3) None
        else Some(GeoM.PolyPart(outer,
          p.holes.map(simpRing).filter(_.length >= 3)))
      })
    val (rt, rxs, rys) = GeoM.encode(simplified)
    Geo.row(rt, rxs, rys)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(geom = l, tol = r)
  override def prettyName: String = "simplify_geometry"
}

/** geometry_invalid_reason (GeoFunctions.java invalidReason): NULL when
  * valid; otherwise a reason string with the reference's category
  * wording (the exact highlighted vertices are an implementation detail
  * of the reference's ESRI validator — here the first offending vertex
  * pair found). */
case class GeometryInvalidReason(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  private def fmtPt(p: (Double, Double)): String = s"(${p._1} ${p._2})"

  override protected def nullSafeEval(v: Any): Any = {
    val (t, xs, ys) = Geo.unpack(v)
    if (xs.isEmpty) return null
    val gs = GeoM.decode(t, xs, ys)
    // repeated points in a multipoint
    if (t.split(":")(0) == "MULTIPOINT" || gs.points.length > 1) {
      val seen = scala.collection.mutable.HashSet.empty[(Double, Double)]
      gs.points.foreach { p =>
        if (!seen.add(p))
          return UTF8String.fromString(s"Repeated points at or near ${fmtPt(p)} and ${fmtPt(p)}")
      }
    }
    def segs(path: Vector[(Double, Double)], closed: Boolean) = {
      val n = path.length
      val lim = if (closed) n else n - 1
      (0 until lim).map(i => (path(i), path((i + 1) % n)))
    }
    // degenerate (zero-length) segments
    (gs.lines.map(l => (l, false)) ++ gs.rings.map(r => (r, true))).foreach {
      case (path, closed) =>
        segs(path, closed).foreach { case (a, b) =>
          if (a == b)
            return UTF8String.fromString(s"Degenerate segments at or near ${fmtPt(a)}")
        }
    }
    // self-intersection of rings (non-adjacent segments meeting)
    gs.rings.foreach { r =>
      val es = segs(r, closed = true).toIndexedSeq
      val n = es.length
      for (i <- 0 until n; j <- i + 1 until n) {
        val adjacent = j == i + 1 || (i == 0 && j == n - 1)
        if (!adjacent) {
          val (a, b) = es(i); val (c, d) = es(j)
          if (Geo.segmentsIntersect(a._1, a._2, b._1, b._2, c._1, c._2, d._1, d._2))
            return UTF8String.fromString(
              s"Intersecting or overlapping segments at or near ${fmtPt(a)} and ${fmtPt(c)}")
        }
      }
    }
    null
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "geometry_invalid_reason"
}

/** ST_Relate (GeoFunctions.java stRelate): DE-9IM pattern match. The
  * reference delegates to ESRI's relate operator; here the 3×3 matrix is
  * computed from the same primitives as the clipping engine — region
  * booleans give the 2-dimensional cells, noded boundary/line pieces give
  * the 1-dimensional cells, arrangement nodes give the 0-dimensional
  * cells. Pattern characters: T (non-empty), F (empty), 0/1/2 (exact
  * dimension), * (anything). */
case class StRelate(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(l: Any, r: Any, p: Any): Any = {
    val (ta, axs, ays) = Geo.unpack(l)
    val (tb, bxs, bys) = Geo.unpack(r)
    val a = GeoM.decode(ta, axs, ays)
    val b = GeoM.decode(tb, bxs, bys)
    val m = StRelate.de9im(a, b)
    val pattern = p.toString
    require(pattern.length == 9, s"Invalid DE-9IM pattern: $pattern")
    m.zip(pattern).forall {
      case (_, '*') => true
      case (d, 'T') => d >= 0
      case (d, 'F') => d < 0
      case (d, c) => d == c - '0'
    }
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "st_relate"
}

object StRelate {
  import GeoM._

  /** Classify a point against a geometry: 0=interior, 1=boundary,
    * 2=exterior. Line boundaries are odd-degree endpoints; polygon
    * boundaries are the rings; points have no boundary. */
  private def classify(p: Pt, g: GSet, lineEnds: Set[Pt]): Int = {
    if (g.polys.nonEmpty) {
      val onRing = g.rings.exists { r =>
        r.indices.exists(i => GeoM.onSegment(p, r(i), r((i + 1) % r.length))) }
      if (onRing) return 1
      if (inRegion(p, g.rings, inclusive = false)) return 0
    }
    if (g.lines.nonEmpty && onLines(p, g.lines)) {
      return if (lineEnds.exists(q => math.hypot(q._1 - p._1, q._2 - p._2) < 1e-9)) 1 else 0
    }
    if (g.points.exists(q => math.hypot(q._1 - p._1, q._2 - p._2) < 1e-9)) return 0
    2
  }

  /** Odd-degree endpoints of a line set (the topological boundary). */
  private def endpoints(lines: Seq[Seq[Pt]]): Set[Pt] = {
    val cnt = mutable.HashMap.empty[Pt, Int].withDefaultValue(0)
    lines.foreach { l =>
      cnt(l.head) += 1
      cnt(l.last) += 1
    }
    cnt.filter(_._2 % 2 == 1).keySet.toSet
  }

  /** Row-major DE-9IM dimensions [II, IB, IE, BI, BB, BE, EI, EB, EE];
    * -1 = empty. */
  def de9im(a: GSet, b: GSet): Array[Int] = {
    val m = Array.fill(9)(-1)
    def raise(row: Int, col: Int, d: Int): Unit = {
      val i = row * 3 + col
      if (d > m(i)) m(i) = d
    }
    // 2-D cells from region booleans
    if (a.polys.nonEmpty && b.polys.nonEmpty &&
        GeoClip.regionOp(a.rings, b.rings, _ && _).nonEmpty) raise(0, 0, 2)
    if (a.polys.nonEmpty &&
        (b.polys.isEmpty || GeoClip.regionOp(a.rings, b.rings, (x, y) => x && !y).nonEmpty))
      raise(0, 2, 2)
    if (b.polys.nonEmpty &&
        (a.polys.isEmpty || GeoClip.regionOp(a.rings, b.rings, (x, y) => !x && y).nonEmpty))
      raise(2, 0, 2)
    raise(2, 2, 2) // exteriors of bounded geometries always meet

    val aEnds = endpoints(a.lines)
    val bEnds = endpoints(b.lines)
    def segs(g: GSet): Vector[((Pt, Pt), Int)] = {
      // carrier segments tagged with their own class: ring segs are
      // boundary (1) for polygons; line segs interior (0)
      g.rings.flatMap(r => r.indices.map(i =>
        ((r(i), r((i + 1) % r.length)), 1))) ++
        g.lines.flatMap(l => l.indices.dropRight(1).map(i => ((l(i), l(i + 1)), 0)))
    }
    val segsA = segs(a)
    val segsB = segs(b)
    // node each side's segments at the other side's touch points
    def pieces(own: Vector[((Pt, Pt), Int)], other: Vector[((Pt, Pt), Int)])
        : Vector[((Pt, Pt), Int)] = {
      own.flatMap { case ((s1, s2), cls) =>
        val cuts = mutable.TreeSet(0.0, 1.0)
        val dx = s2._1 - s1._1; val dy = s2._2 - s1._2
        val len2 = dx * dx + dy * dy
        def tOf(p: Pt): Double = ((p._1 - s1._1) * dx + (p._2 - s1._2) * dy) / len2
        other.foreach { case ((c1, c2), _) =>
          Seq(c1, c2).foreach(p => if (GeoM.onSegment(p, s1, s2)) cuts += tOf(p))
          val d2x = c2._1 - c1._1; val d2y = c2._2 - c1._2
          val den = dx * d2y - dy * d2x
          if (den != 0) {
            val t = ((c1._1 - s1._1) * d2y - (c1._2 - s1._2) * d2x) / den
            val s = ((c1._1 - s1._1) * dy - (c1._2 - s1._2) * dx) / den
            if (t > 0 && t < 1 && s >= 0 && s <= 1) cuts += t
          }
        }
        val ts = cuts.toVector
        ts.indices.dropRight(1).map { i =>
          val p = (s1._1 + ts(i) * dx, s1._2 + ts(i) * dy)
          val q = (s1._1 + ts(i + 1) * dx, s1._2 + ts(i + 1) * dy)
          ((p, q), cls)
        }.filter { case ((p, q), _) => p != q }
      }
    }
    pieces(segsA, segsB).foreach { case ((p, q), cls) =>
      val mid = ((p._1 + q._1) / 2, (p._2 + q._2) / 2)
      raise(cls, classify(mid, b, bEnds), 1)
    }
    pieces(segsB, segsA).foreach { case ((p, q), cls) =>
      val mid = ((p._1 + q._1) / 2, (p._2 + q._2) / 2)
      raise(classify(mid, a, aEnds), cls, 1)
    }
    // 0-D: geometry points, line endpoints, vertices and crossing nodes
    val nodes = mutable.ArrayBuffer.empty[Pt]
    nodes ++= a.points ++= b.points ++= aEnds ++= bEnds
    segsA.foreach { case ((p1, p2), _) => nodes += p1 += p2 }
    segsB.foreach { case ((p1, p2), _) => nodes += p1 += p2 }
    segsA.foreach { case ((p1, p2), _) =>
      segsB.foreach { case ((q1, q2), _) =>
        val d1x = p2._1 - p1._1; val d1y = p2._2 - p1._2
        val d2x = q2._1 - q1._1; val d2y = q2._2 - q1._2
        val den = d1x * d2y - d1y * d2x
        if (den != 0) {
          val t = ((q1._1 - p1._1) * d2y - (q1._2 - p1._2) * d2x) / den
          val s = ((q1._1 - p1._1) * d1y - (q1._2 - p1._2) * d1x) / den
          if (t >= 0 && t <= 1 && s >= 0 && s <= 1)
            nodes += ((p1._1 + t * d1x, p1._2 + t * d1y))
        }
      }
    }
    def classA(p: Pt): Int =
      if (a.points.exists(q => math.hypot(q._1 - p._1, q._2 - p._2) < 1e-9)) 0
      else classify(p, a, aEnds)
    def classB(p: Pt): Int =
      if (b.points.exists(q => math.hypot(q._1 - p._1, q._2 - p._2) < 1e-9)) 0
      else classify(p, b, bEnds)
    nodes.foreach { p => raise(classA(p), classB(p), 0) }
    m
  }
}
