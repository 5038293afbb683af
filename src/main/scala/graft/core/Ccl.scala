package graft.core

import org.locationtech.jts.geom.{Coordinate, GeometryFactory, LinearRing, Polygon}

/** Connected-component labeling + boundary ring assembly — the scalar core
  * of polygonize (reference: alg/polygonize.cpp :: GDALPolygonize /
  * GDALRasterPolygonEnumeratorT::ProcessLine + the ring-assembly RPolygonize
  * helpers). Pure Scala, no Spark: used per-tile inside the distributed
  * operator AND as the whole-grid scalar oracle in tests (single source of
  * truth, FIXTURES.md).
  *
  * Semantics match the reference: components are maximal 4-connected sets
  * of equal pixel value (DN) among masked-in pixels; the component label is
  * the row-major index of its first (smallest-index) pixel, which makes
  * labels deterministic and order-independent — required for distributed
  * merging and idempotent resume.
  */
object Ccl {

  /** Union-find label pass over a w×h grid (row-major `dn` values).
    * Returns label(i) = min pixel index of i's component, or -1 where
    * mask(i) is false. Two-row scan + union-by-min with path compression —
    * the same equivalence-merge structure as the reference's two-row
    * enumerator, collapsed to one pass since the tile is in memory. */
  def labelLocal(dn: Array[Double], mask: Array[Boolean], w: Int, h: Int,
                 conn8: Boolean = false): Array[Int] = {
    val n = w * h
    val parent = Array.tabulate(n)(identity)
    def find(i0: Int): Int = {
      var i = i0
      while (parent(i) != i) { parent(i) = parent(parent(i)); i = parent(i) }
      i
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        if (mask(i)) {
          if (x > 0 && mask(i - 1) && dn(i - 1) == dn(i)) union(i, i - 1)
          if (y > 0 && mask(i - w) && dn(i - w) == dn(i)) union(i, i - w)
          // 8-connectivity (the reference's GDALPolygonize/-8 / sieve
          // -8 option): the two upper diagonals complete the stencil
          if (conn8 && y > 0) {
            if (x > 0 && mask(i - w - 1) && dn(i - w - 1) == dn(i)) union(i, i - w - 1)
            if (x < w - 1 && mask(i - w + 1) && dn(i - w + 1) == dn(i)) union(i, i - w + 1)
          }
        }
        x += 1
      }
      y += 1
    }
    Array.tabulate(n)(i => if (mask(i)) find(i) else -1)
  }

  /** One ring of lattice vertices (closed: first == last element omitted;
    * collinear runs compressed) plus its shoelace signed area. */
  final case class Ring(vertices: Array[(Long, Long)], signedArea: Double)

  /** Trace the boundary rings of ONE 4-connected pixel set (global (gx,gy)
    * coords, y down). Exactly one shell (largest |area|) plus holes.
    *
    * Edge convention (interior kept on the RIGHT while walking, y-down):
    * for each pixel with a missing 4-neighbor, emit the directed lattice
    * edge along that side; at pinch vertices (two components of boundary
    * touching at a corner) the walk takes the rightmost turn relative to
    * the incoming direction, which keeps distinct rings separate — the
    * same disambiguation the reference's arc assembly performs. */
  def traceRings(pixels: Array[(Long, Long)]): Array[Ring] = {
    val set = new java.util.HashSet[(Long, Long)](pixels.length * 2)
    pixels.foreach(set.add)
    // directions: 0=+x, 1=+y, 2=-x, 3=-y (y down)
    val dx = Array(1L, 0L, -1L, 0L)
    val dy = Array(0L, 1L, 0L, -1L)
    // outgoing edge set keyed (vertex, dir)
    val out = new java.util.HashMap[(Long, Long), Array[Boolean]]()
    def addEdge(vx: Long, vy: Long, dir: Int): Unit = {
      val k = (vx, vy)
      var dirs = out.get(k)
      if (dirs == null) { dirs = new Array[Boolean](4); out.put(k, dirs) }
      dirs(dir) = true
    }
    pixels.foreach { case (x, y) =>
      if (!set.contains((x, y - 1))) addEdge(x, y, 0)         // N side → +x
      if (!set.contains((x + 1, y))) addEdge(x + 1, y, 1)     // E side → +y
      if (!set.contains((x, y + 1))) addEdge(x + 1, y + 1, 2) // S side → -x
      if (!set.contains((x - 1, y))) addEdge(x, y + 1, 3)     // W side → -y
    }
    val rings = Array.newBuilder[Ring]
    val it = out.entrySet().iterator()
    val starts = scala.collection.mutable.ArrayBuffer.empty[((Long, Long), Int)]
    while (it.hasNext) {
      val e = it.next()
      var d = 0
      while (d < 4) { if (e.getValue()(d)) starts += ((e.getKey, d)); d += 1 }
    }
    // deterministic start order
    val ordered = starts.sortBy { case ((vx, vy), d) => (vy, vx, d) }
    ordered.foreach { case (v0, d0) =>
      if (out.get(v0)(d0)) { // not yet consumed
        val verts = Array.newBuilder[(Long, Long)]
        var area2 = 0L // 2×signed shoelace area
        var v = v0
        var d = d0
        var lastDir = -1
        var continue = true
        while (continue) {
          out.get(v)(d) = false
          if (d != lastDir) verts += v // compress collinear runs
          val nvx = v._1 + dx(d); val nvy = v._2 + dy(d)
          area2 += v._1 * nvy - nvx * v._2
          lastDir = d
          v = (nvx, nvy)
          if (v == v0) {
            // ring closed iff the next edge would be the starting edge
            val dirs = out.get(v)
            var next = -1
            var t = 1
            while (t <= 4 && next == -1) { // rightmost turn first: (d+1)%4, straight, left, back
              val cand = (d + t) % 4
              if (dirs != null && dirs(cand)) next = cand
              t += 1
            }
            if (next == d0 || next == -1) continue = false else d = next
          } else {
            val dirs = out.get(v)
            var next = -1
            var t = 1
            while (t <= 4 && next == -1) {
              val cand = (d + t) % 4
              if (dirs != null && dirs(cand)) next = cand
              t += 1
            }
            require(next != -1, s"ring walk dead-ends at $v")
            d = next
          }
        }
        rings += Ring(verts.result(), area2 / 2.0)
      }
    }
    rings.result()
  }

  private val gf = new GeometryFactory()

  /** Assemble one component's pixels into a JTS Polygon (shell + holes) in
    * global pixel-lattice coordinates. */
  /** The polygon's ring vertex sequences as integer lattice rows — shell
    * first (largest |signed area|, ties to trace order exactly like
    * toPolygon's maxBy), then holes in trace order. Same rings as
    * toPolygon, WITHOUT the float/WKT formatting: this is the
    * oracle-hashable row surface (each ring open — first vertex not
    * repeated at the end). */
  def ringVertices(pixels: Array[(Long, Long)]): Array[Array[(Long, Long)]] = {
    val rings = traceRings(pixels)
    val shell = rings.maxBy(r => math.abs(r.signedArea))
    (shell +: rings.filter(_ ne shell).toSeq).map(_.vertices).toArray
  }

  def toPolygon(pixels: Array[(Long, Long)]): Polygon = {
    val rings = traceRings(pixels)
    def linear(r: Ring): LinearRing = {
      val cs = new Array[Coordinate](r.vertices.length + 1)
      var i = 0
      while (i < r.vertices.length) {
        cs(i) = new Coordinate(r.vertices(i)._1.toDouble, r.vertices(i)._2.toDouble); i += 1
      }
      cs(r.vertices.length) = cs(0)
      gf.createLinearRing(cs)
    }
    val shell = rings.maxBy(r => math.abs(r.signedArea))
    val holes = rings.filter(_ ne shell).map(linear)
    gf.createPolygon(linear(shell), holes)
  }
}
