package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Viewshed

/** Viewshed (exact R3 line-of-sight) against hand cases and a driver-side
  * brute-force replica of the same DDA law. */
class ViewshedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def demOf(w: Int, h: Int)(f: (Long, Long) => Long) =
    (for (y <- 0L until h; x <- 0L until w) yield (x, y, f(x, y)))
      .toDF("x", "y", "elev")

  test("flat terrain with raised observer: everything visible") {
    val dem = demOf(21, 21)((_, _) => 100L)
    val out = Viewshed.viewshed(dem, 10, 10, obsH = 5, maxDist = 10).collect()
    assert(out.length == 21 * 21 - 1)
    assert(out.forall(_.getInt(2) == 255))
  }

  test("wall blocks cells behind it, not in front; adjacent always visible") {
    // flat 0 terrain, wall of height 50 at x = 13 (full column)
    val dem = demOf(21, 21)((x, _) => if (x == 13) 50L else 0L)
    val vis = Viewshed.viewshed(dem, 10, 10, obsH = 2, maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(vis((11, 10)) == 255) // front of wall
    assert(vis((12, 10)) == 255)
    assert(vis((13, 10)) == 255) // wall top itself: nothing intervenes above LOS
    assert(vis((14, 10)) == 0)   // shadow of the wall
    assert(vis((20, 10)) == 0)
    assert(vis((9, 10)) == 255)  // other side unaffected
    assert(vis((10, 20)) == 255)
  }

  test("matches a driver-side brute-force R3 replica on a rough DEM") {
    val f = (x: Long, y: Long) => (x * 7 + y * 11 + (x * y) % 13) % 31
    val (ox, oy, oh, md) = (8L, 8L, 3L, 7)
    val dem = demOf(17, 17)(f)
    val got = Viewshed.viewshed(dem, ox, oy, oh, md)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val eObs = f(ox, oy) + oh
    var n = 0
    for (y <- 0L until 17; x <- 0L until 17) {
      val cheb = math.max(math.abs(x - ox), math.abs(y - oy))
      if (cheb >= 1 && cheb <= md) {
        n += 1
        val eT = f(x, y)
        val blocked = (1L until cheb).exists { k =>
          val xs = ox + math.signum(x - ox) * ((2 * k * math.abs(x - ox) + cheb) / (2 * cheb))
          val ys = oy + math.signum(y - oy) * ((2 * k * math.abs(y - oy) + cheb) / (2 * cheb))
          (eT - eObs) * k - (f(xs, ys) - eObs) * cheb < 0
        }
        assert(got((x, y)) == (if (blocked) 0 else 255), s"cell ($x,$y)")
      }
    }
    assert(got.size == n)
  }
}
