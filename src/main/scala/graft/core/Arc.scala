package graft.core

import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing}
import scala.collection.mutable.ArrayBuffer

/** Circular-arc linearization and curve-WKT ingest — the engine's analog
  * of the reference's curve-geometry support (reference:
  * ogr/ogrgeometry.h :: OGRCircularString/OGRCompoundCurve/
  * OGRCurvePolygon [late-SVN] and ogr/ogrgeometryfactory.cpp ::
  * curveToLineString). JTS/GEOS has no native arcs, so curves LINEARIZE
  * ON INGEST (the reference's own OGR_G_GetLinearGeometry route) with a
  * fixed 4° max angle step.
  *
  * Determinism contract (what makes the q89 oracle possible): the
  * circumcenter comes from the exact rational Cramer formula — for the
  * dyadic test lattice every sum/product is exact, so center, radius and
  * the axis-crossing angles are BIT-exact (atan2(±0, x) is exact in
  * every IEEE libm) — and the segment count guards its ceil with a 1e-9
  * nudge so a 1-ulp atan2/π gap can never flip an exactly-integer
  * sweep/step ratio. Interior vertices differ from another IEEE
  * implementation only by cos/sin ULPs, absorbed by output quantization.
  */
object Arc {

  /** GDAL's default max angle step (4°) in radians: π/45. */
  val stepRad: Double = math.Pi / 45.0

  /** Linearize the arc through (ax,ay)→(bx,by)→(cx,cy). Returns the
    * vertex list INCLUDING both endpoints (recomputed from center+angle,
    * like the reference's linearizer). Collinear inputs degrade to the
    * 3-point polyline (infinite radius — reference behavior). */
  def linearize(ax: Double, ay: Double, bx: Double, by: Double,
                cx: Double, cy: Double, step: Double = stepRad): Array[Coordinate] = {
    val d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if (d == 0.0) return Array(new Coordinate(ax, ay), new Coordinate(bx, by), new Coordinate(cx, cy))
    val aa = ax * ax + ay * ay
    val bb = bx * bx + by * by
    val cc = cx * cx + cy * cy
    val ux = (aa * (by - cy) + bb * (cy - ay) + cc * (ay - by)) / d
    val uy = (aa * (cx - bx) + bb * (ax - cx) + cc * (bx - ax)) / d
    val dxa = ax - ux; val dya = ay - uy
    val r = math.sqrt(dxa * dxa + dya * dya)
    val a0 = math.atan2(ay - uy, ax - ux)
    val a1 = math.atan2(by - uy, bx - ux)
    val a2 = math.atan2(cy - uy, cx - ux)
    val twoPi = 2.0 * math.Pi
    def mod2pi(x: Double): Double = x - twoPi * math.floor(x / twoPi)
    val ccw1 = mod2pi(a1 - a0)
    val ccw2 = mod2pi(a2 - a0)
    val ccw = ccw1 < ccw2
    val sweep = if (ccw) ccw2 else mod2pi(a0 - a2)
    // 1e-9 nudge: sweep/step can land EXACTLY on an integer (half/quarter
    // circles); without the nudge a 1-ulp transcendental gap between the
    // engine and the SQL oracle could flip ceil by one
    val n = math.max(1L, math.ceil(sweep / step - 1.0E-9).toLong)
    val out = new Array[Coordinate]((n + 1).toInt)
    var k = 0L
    while (k <= n) {
      val ang =
        if (ccw) a0 + sweep * k.toDouble / n.toDouble
        else a0 - sweep * k.toDouble / n.toDouble
      out(k.toInt) = new Coordinate(ux + r * math.cos(ang), uy + r * math.sin(ang))
      k += 1
    }
    out
  }

  /** Linearize a CIRCULARSTRING vertex list (odd count ≥ 3; chained arc
    * triplets sharing endpoints) into one polyline. */
  def linearizeChain(pts: IndexedSeq[Coordinate]): Array[Coordinate] = {
    require(pts.length >= 3 && pts.length % 2 == 1,
      s"CIRCULARSTRING needs an odd vertex count >= 3, got ${pts.length}")
    val out = new ArrayBuffer[Coordinate]()
    var i = 0
    while (i + 2 < pts.length + 1) {
      val seg = linearize(pts(i).x, pts(i).y, pts(i + 1).x, pts(i + 1).y,
        pts(i + 2).x, pts(i + 2).y)
      val from = if (out.isEmpty) 0 else 1 // drop duplicated join vertex
      var j = from
      while (j < seg.length) { out += seg(j); j += 1 }
      i += 2
    }
    out.toArray
  }

  // ---- curve WKT parsing (CIRCULARSTRING / COMPOUNDCURVE /
  // ---- CURVEPOLYGON / MULTICURVE), linearized to JTS on ingest ----

  def isCurveWkt(wkt: String): Boolean = {
    val t = wkt.trim.toUpperCase
    t.startsWith("CIRCULARSTRING") || t.startsWith("COMPOUNDCURVE") ||
      t.startsWith("CURVEPOLYGON") || t.startsWith("MULTICURVE")
  }

  def fromCurveWkt(wkt: String): Geometry = {
    val p = new P(wkt)
    val g = parseGeom(p)
    p.skipWs()
    require(p.eof, s"trailing content in curve WKT at ${p.pos}")
    g
  }

  private final class P(val s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    def peek: Char = { skipWs(); s.charAt(pos) }
    def expect(c: Char): Unit = {
      skipWs()
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos in curve WKT")
      pos += 1
    }
    def tryWord(w: String): Boolean = {
      skipWs()
      if (s.regionMatches(true, pos, w, 0, w.length)) { pos += w.length; true } else false
    }
    def number(): Double = {
      skipWs()
      val st = pos
      while (!eof && "+-.0123456789eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      require(pos > st, s"expected number at $st in curve WKT")
      java.lang.Double.parseDouble(s.substring(st, pos))
    }
  }

  private def parsePointList(p: P): IndexedSeq[Coordinate] = {
    p.expect('(')
    val out = new ArrayBuffer[Coordinate]()
    var more = true
    while (more) {
      val x = p.number(); val y = p.number()
      out += new Coordinate(x, y)
      p.skipWs()
      if (p.peek == ',') { p.expect(',') } else { p.expect(')'); more = false }
    }
    out.toIndexedSeq
  }

  /** One curve member: CIRCULARSTRING(...), a bare (x y, ...) linestring
    * (inside COMPOUNDCURVE/CURVEPOLYGON), or LINESTRING(...). Returns the
    * linearized vertex list. */
  private def parseCurveMember(p: P): Array[Coordinate] = {
    if (p.tryWord("CIRCULARSTRING")) linearizeChain(parsePointList(p))
    else if (p.tryWord("COMPOUNDCURVE")) parseCompound(p)
    else if (p.tryWord("LINESTRING")) parsePointList(p).toArray
    else parsePointList(p).toArray
  }

  private def parseCompound(p: P): Array[Coordinate] = {
    p.expect('(')
    val out = new ArrayBuffer[Coordinate]()
    var more = true
    while (more) {
      val seg = parseCurveMember(p)
      val from = if (out.isEmpty) 0 else 1
      var j = from
      while (j < seg.length) { out += seg(j); j += 1 }
      p.skipWs()
      if (p.peek == ',') p.expect(',') else { p.expect(')'); more = false }
    }
    out.toArray
  }

  private def closeRing(pts: Array[Coordinate]): LinearRing = {
    val closed =
      if (pts.head.equals2D(pts.last)) pts
      else pts :+ new Coordinate(pts.head.x, pts.head.y)
    GeomIO.factory.createLinearRing(closed)
  }

  private def parseGeom(p: P): Geometry = {
    if (p.tryWord("CIRCULARSTRING"))
      GeomIO.factory.createLineString(linearizeChain(parsePointList(p)))
    else if (p.tryWord("COMPOUNDCURVE"))
      GeomIO.factory.createLineString(parseCompound(p))
    else if (p.tryWord("CURVEPOLYGON")) {
      p.expect('(')
      val rings = new ArrayBuffer[LinearRing]()
      var more = true
      while (more) {
        rings += closeRing(parseCurveMember(p))
        p.skipWs()
        if (p.peek == ',') p.expect(',') else { p.expect(')'); more = false }
      }
      GeomIO.factory.createPolygon(rings.head, rings.tail.toArray)
    } else if (p.tryWord("MULTICURVE")) {
      p.expect('(')
      val lines = new ArrayBuffer[Geometry]()
      var more = true
      while (more) {
        lines += GeomIO.factory.createLineString(parseCurveMember(p))
        p.skipWs()
        if (p.peek == ',') p.expect(',') else { p.expect(')'); more = false }
      }
      GeomIO.factory.createMultiLineString(
        lines.map(_.asInstanceOf[org.locationtech.jts.geom.LineString]).toArray)
    } else throw new IllegalArgumentException(
      s"unsupported curve WKT near position ${p.pos}")
  }
}
