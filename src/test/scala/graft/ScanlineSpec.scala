package graft

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.Coordinate
import graft.core.{GeomIO, Scanline}

/** Pins the rasterize boundary rule (SURVEY.md §7.3-5): center-in,
  * even-odd parity, half-open spans — cross-checked against JTS point
  * containment on pixel centers (GEOS/JTS interior == even-odd interior
  * for valid polygons). */
class ScanlineSpec extends AnyFunSuite {

  private def filledSet(runs: Array[(Int, Int, Int)]): Set[(Int, Int)] =
    runs.flatMap { case (py, xs, xe) => (xs until xe).map(x => (x, py)) }.toSet

  test("unit box fills exactly interior pixel centers") {
    // grid: 10x10 px over [0,10]x[0,10], box (2.0, 2.0)-(5.0, 5.0)
    val poly = GeomIO.box(2.0, 2.0, 5.0, 5.0).asInstanceOf[org.locationtech.jts.geom.Polygon]
    val runs = Scanline.fillPolygon(poly, 0.0, 10.0, 1.0, 1.0, 10, 10)
    val got = filledSet(runs)
    // centers at x+0.5: inside iff 2.0 <= x+0.5 < 5.0 -> x in {2,3,4}
    // y: gy0=10, ph=1 -> py = 10 - cy - 0.5; cy in [2,5) -> py in {5,6,7}
    val want = (for (x <- 2 to 4; y <- 5 to 7) yield (x, y)).toSet
    assert(got == want)
  }

  test("edge exactly on pixel center column: half-open (left span burns)") {
    // box x in [2.5, 4.5): centers 2.5<=c<4.5 -> x in {2,3} (center 2.5 IN, 4.5 OUT)
    val poly = GeomIO.box(2.5, 0.0, 4.5, 10.0).asInstanceOf[org.locationtech.jts.geom.Polygon]
    val runs = Scanline.fillPolygon(poly, 0.0, 10.0, 1.0, 1.0, 10, 10)
    val xs = filledSet(runs).map(_._1)
    // centers x+0.5 in [2.5, 4.5): x=2 (center 2.5 IN) and x=3; center 4.5 OUT
    assert(xs == Set(2, 3), s"got $xs")
  }

  test("polygon with hole: hole pixels not burned (even-odd)") {
    val shell = GeomIO.factory.createLinearRing(Array(
      new Coordinate(1, 1), new Coordinate(9, 1), new Coordinate(9, 9),
      new Coordinate(1, 9), new Coordinate(1, 1)))
    val hole = GeomIO.factory.createLinearRing(Array(
      new Coordinate(4, 4), new Coordinate(6, 4), new Coordinate(6, 6),
      new Coordinate(4, 6), new Coordinate(4, 4)))
    val poly = GeomIO.factory.createPolygon(shell, Array(hole))
    val got = filledSet(Scanline.fillPolygon(poly, 0.0, 10.0, 1.0, 1.0, 10, 10))
    assert(got.contains((2, 2)) && got.contains((7, 7)))
    assert(!got.contains((4, 4)) && !got.contains((5, 5))) // centers (4.5,5.5),(5.5,4.5) in hole
  }

  test("random triangles agree with JTS containment of pixel centers") {
    val rng = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val pts = Array.fill(3)(new Coordinate(rng.nextDouble() * 20, rng.nextDouble() * 20))
      val tri = try GeomIO.factory.createPolygon(pts :+ pts(0)) catch { case _: Throwable => null }
      if (tri != null && tri.isValid && tri.getArea > 0.5) {
        val got = filledSet(Scanline.fillPolygon(tri, 0.0, 20.0, 1.0, 1.0, 20, 20))
        for (x <- 0 until 20; y <- 0 until 20) {
          val cx = x + 0.5; val cy = 20.0 - y - 0.5
          val p = GeomIO.point(cx, cy)
          val onBoundary = tri.getBoundary.distance(p) < 1e-9
          if (!onBoundary) {
            val inside = tri.contains(p)
            assert(got.contains((x, y)) == inside,
              s"pixel ($x,$y) center ($cx,$cy): fill=${got.contains((x, y))} jts=$inside tri=$tri")
          }
        }
      }
    }
  }

  test("concave L-shape fills both arms") {
    val l = GeomIO.fromWkt("POLYGON((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))")
      .asInstanceOf[org.locationtech.jts.geom.Polygon]
    val got = filledSet(Scanline.fillPolygon(l, 0.0, 10.0, 1.0, 1.0, 10, 10))
    assert(got.contains((0, 9)) && got.contains((5, 9))) // bottom arm (y=9 is cy=0.5)
    assert(got.contains((0, 5)))                         // vertical arm (cy=4.5)
    assert(!got.contains((5, 5)))                        // notch (5.5, 4.5) outside
  }

  private def runSet(runs: Array[(Int, Int, Int)]): Set[(Int, Int)] =
    runs.flatMap { case (py, xs, xe) => (xs until xe).map(x => (x, py)) }.toSet

  test("allTouched rectangle: burned set == every pixel the box intersects") {
    // edges strictly between pixel bounds: box (2.25, 1.75)-(5.5, 4.25)
    // over 10x10 unit pixels -> x block 2..5, y block: gy in (1.75, 4.25)
    // -> py = 10-1-ceil? brute force below settles it
    val poly = GeomIO.box(2.25, 1.75, 5.5, 4.25).asInstanceOf[org.locationtech.jts.geom.Polygon]
    val got = runSet(Scanline.burnRuns(poly, 0.0, 10.0, 1.0, 1.0, 10, 10, allTouched = true))
    val want = (for {
      x <- 0 until 10; y <- 0 until 10
      // pixel (x,y) spans geo [x, x+1) x (10-y-1, 10-y]
      if x + 1 > 2.25 && x < 5.5 && (10.0 - y) > 1.75 && (10.0 - y - 1) < 4.25
    } yield (x, y)).toSet
    assert(got == want)
    // strictly larger than the parity fill (boundary ring pixels added)
    val fill = runSet(Scanline.burnRuns(poly, 0.0, 10.0, 1.0, 1.0, 10, 10))
    assert(fill.subsetOf(got) && fill != got)
  }

  test("allTouched polygon with hole: hole boundary burned, hole interior not") {
    val holed = GeomIO.fromWkt(
      "POLYGON((1.25 1.25, 8.75 1.25, 8.75 8.75, 1.25 8.75, 1.25 1.25)," +
      "(3.25 3.25, 6.75 3.25, 6.75 6.75, 3.25 6.75, 3.25 3.25))")
      .asInstanceOf[org.locationtech.jts.geom.Polygon]
    val got = runSet(Scanline.burnRuns(holed, 0.0, 10.0, 1.0, 1.0, 10, 10, allTouched = true))
    // shell block minus pixels fully inside the hole: hole (3.25,3.25)-(6.75,6.75);
    // fully-inside pixels are x in {4,5}, y rows where (10-y-1, 10-y) within -> y in {4,5}
    val shellBlock = (for (x <- 1 to 8; y <- 1 to 8) yield (x, y)).toSet
    val holeInner = (for (x <- 4 to 5; y <- 4 to 5) yield (x, y)).toSet
    assert(got == shellBlock -- holeInner)
  }
}
