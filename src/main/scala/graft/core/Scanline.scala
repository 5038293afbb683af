package graft.core

import org.locationtech.jts.geom.{Geometry, Polygon, LineString}

/** Scanline even-odd polygon fill on pixel centers — the reference's
  * rasterization core re-expressed in pure Scala (reference:
  * alg/llrasterize.cpp :: GDALdllImageFilledPolygon,
  * alg/gdalrasterize.cpp :: gv_rasterize_one_shape).
  *
  * Boundary rule (documented, pinned by tests — SURVEY.md §7.3-5): a pixel
  * is burned iff its CENTER (px+0.5, py+0.5) is inside the polygon under
  * even-odd parity; spans are half-open [xStart, xEnd) so an edge passing
  * exactly through a center column burns on the left span only. Horizontal
  * edges are skipped; vertices count via the half-open y test
  * (yMin <= yc < yMax), matching the reference's dllImage parity walk.
  *
  * This single implementation serves both the distributed rasterize
  * operator and the scalar golden oracle (single source of truth, no
  * engine/oracle drift).
  */
object Scanline {

  /** Fill one polygon (with holes) into pixel runs within a w×h grid whose
    * pixel (0,0) spans geo [gx0, gx0+pw) × (gy0-ph, gy0] — i.e. top-left
    * origin, y decreasing. Returns packed runs (py, xStart, xEnd exclusive).
    */
  def fillPolygon(poly: Polygon, gx0: Double, gy0: Double, pw: Double, ph: Double,
                  w: Int, h: Int): Array[(Int, Int, Int)] = {
    // collect edges from shell + holes in PIXEL coordinates
    val rings = (0 until poly.getNumInteriorRing).map(poly.getInteriorRingN) :+ poly.getExteriorRing
    val edges = Array.newBuilder[(Double, Double, Double, Double)] // x0,y0,x1,y1 pixel coords
    rings.foreach { r =>
      val cs = r.getCoordinateSequence
      var i = 0
      while (i < cs.size() - 1) {
        val x0 = (cs.getX(i) - gx0) / pw
        val y0 = (gy0 - cs.getY(i)) / ph
        val x1 = (cs.getX(i + 1) - gx0) / pw
        val y1 = (gy0 - cs.getY(i + 1)) / ph
        if (y0 != y1) edges += ((x0, y0, x1, y1)) // skip horizontal edges
        i += 1
      }
    }
    val es = edges.result()
    val out = Array.newBuilder[(Int, Int, Int)]
    var py = 0
    while (py < h) {
      val yc = py + 0.5
      // gather x intersections of edges whose half-open y-range covers yc
      var xs = List.empty[Double]
      var k = 0
      while (k < es.length) {
        val (x0, y0, x1, y1) = es(k)
        val yMin = math.min(y0, y1); val yMax = math.max(y0, y1)
        if (yc >= yMin && yc < yMax) {
          val t = (yc - y0) / (y1 - y0)
          xs = (x0 + t * (x1 - x0)) :: xs
        }
        k += 1
      }
      if (xs.nonEmpty) {
        val sorted = xs.sorted.toArray
        var i = 0
        while (i + 1 < sorted.length) {
          // centers in [x0, x1): px+0.5 >= x0 && px+0.5 < x1
          var s = math.ceil(sorted(i) - 0.5).toInt
          var e = math.ceil(sorted(i + 1) - 0.5).toInt // exclusive
          if (s < 0) s = 0
          if (e > w) e = w
          if (e > s) out += ((py, s, e))
          i += 2
        }
      }
      py += 1
    }
    out.result()
  }

  /** Burn all polygons of a (multi)geometry; returns (py, xs, xe) runs. */
  def fillGeometry(g: Geometry, gx0: Double, gy0: Double, pw: Double, ph: Double,
                   w: Int, h: Int): Array[(Int, Int, Int)] = {
    val out = Array.newBuilder[(Int, Int, Int)]
    var i = 0
    while (i < g.getNumGeometries) {
      g.getGeometryN(i) match {
        case p: Polygon => out ++= fillPolygon(p, gx0, gy0, pw, ph, w, h)
        case _          => // lines/points handled by rasterizeLine below
      }
      i += 1
    }
    out.result()
  }

  /** ALL_TOUCHED-style line burn: every pixel the segment passes through
    * (reference: alg/llrasterize.cpp :: GDALdllImageLineAllTouched), via a
    * conservative DDA walk. Returns (px, py) pairs. */
  def rasterizeLine(line: LineString, gx0: Double, gy0: Double, pw: Double, ph: Double,
                    w: Int, h: Int): Array[(Int, Int)] = {
    val cs = line.getCoordinateSequence
    val out = scala.collection.mutable.LinkedHashSet.empty[(Int, Int)]
    var i = 0
    while (i < cs.size() - 1) {
      var x0 = (cs.getX(i) - gx0) / pw; var y0 = (gy0 - cs.getY(i)) / ph
      val x1 = (cs.getX(i + 1) - gx0) / pw; val y1 = (gy0 - cs.getY(i + 1)) / ph
      val steps = math.max(1, math.ceil(math.max(math.abs(x1 - x0), math.abs(y1 - y0)) * 2).toInt)
      val dx = (x1 - x0) / steps; val dy = (y1 - y0) / steps
      var s = 0
      while (s <= steps) {
        val px = math.floor(x0).toInt; val py = math.floor(y0).toInt
        if (px >= 0 && px < w && py >= 0 && py < h) out += ((px, py))
        x0 += dx; y0 += dy
        s += 1
      }
      i += 1
    }
    out.toArray
  }
}
