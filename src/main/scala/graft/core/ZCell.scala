package graft.core

/** Z-order (Morton) quadtree cell index over a global tile grid.
  *
  * A cell is a (zoom, tx, ty) tile of the pyramid, packed into one Long:
  * bits 63..58 = zoom (0..30), bits 57..0 = Morton interleave of (tx, ty).
  * This fills the "H3/S2-style hierarchical cell index" role of the north
  * star with the quadkey scheme of the reference's tiling utility
  * (reference: swig/python/scripts/gdal2tiles.py :: GlobalGeodetic /
  * GlobalMercator.QuadTree) and its generic quadtree
  * (port/cpl_quad_tree.cpp :: CPLQuadTree).
  *
  * Z-order keys at a fixed zoom sort so that spatially-near cells are
  * usually key-near, which makes Parquet/Iceberg min-max row-group pruning
  * on the cell column effective at scale (SURVEY.md §2.4).
  */
object ZCell {
  final val MaxZoom = 29

  /** Interleave the low 29 bits of x into even bit positions. */
  private[core] def part1by1(v: Long): Long = {
    var x = v & 0x1fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  private[core] def compact1by1(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1))  & 0x3333333333333333L
    x = (x | (x >> 2))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >> 4))  & 0x00ff00ff00ff00ffL
    x = (x | (x >> 8))  & 0x0000ffff0000ffffL
    x = (x | (x >> 16)) & 0x0000ffff0000ffffL
    (x | (x >> 16)) & 0x1fffffffL
  }

  /** Pack (zoom, tx, ty) into a single Long cell id. */
  def pack(zoom: Int, tx: Long, ty: Long): Long = {
    require(zoom >= 0 && zoom <= MaxZoom, s"zoom $zoom out of [0,$MaxZoom]")
    (zoom.toLong << 58) | (part1by1(tx) << 1) | part1by1(ty)
  }

  def zoom(cell: Long): Int = ((cell >>> 58) & 0x3f).toInt
  def tx(cell: Long): Long = compact1by1(cell >>> 1)
  def ty(cell: Long): Long = compact1by1(cell)

  def unpack(cell: Long): (Int, Long, Long) = (zoom(cell), tx(cell), ty(cell))

  /** Parent cell one zoom up. */
  def parent(cell: Long): Long = {
    val z = zoom(cell)
    require(z > 0, "zoom-0 cell has no parent")
    pack(z - 1, tx(cell) >> 1, ty(cell) >> 1)
  }

  /** Ancestor of `cell` at zoom `z` (identity when z >= the cell's zoom). */
  def ancestorAt(cell: Long, z: Int): Long = {
    val cz = zoom(cell)
    if (z >= cz) cell
    else { val d = cz - z; pack(z, tx(cell) >> d, ty(cell) >> d) }
  }

  /** The 4 children one zoom down. */
  def children(cell: Long): Array[Long] = {
    val z = zoom(cell); val x = tx(cell) << 1; val y = ty(cell) << 1
    Array(pack(z + 1, x, y), pack(z + 1, x + 1, y),
          pack(z + 1, x, y + 1), pack(z + 1, x + 1, y + 1))
  }

  /** Chebyshev ring r around a cell: the shell of cells at exactly
    * chess-distance r (r=0 → the cell itself). Clamped to grid bounds;
    * x wraps around the antimeridian, y is clamped.
    * Mirrors the neighborhood walks of the reference's grid/proximity
    * passes (alg/gdalgrid.cpp, alg/gdalproximity.cpp). */
  def ring(cell: Long, r: Int, colsShift: Int = 0, wrapX: Boolean = true): Array[Long] = {
    val z = zoom(cell); val cx = tx(cell); val cy = ty(cell)
    val ny = 1L << z            // rows
    val nx = 1L << (z + colsShift) // columns: 2^z mercator, 2^(z+1) geodetic
    if (r == 0) return Array(cell)
    val out = Array.newBuilder[Long]
    var dx = -r
    while (dx <= r) {
      var dy = -r
      while (dy <= r) {
        if (math.max(math.abs(dx), math.abs(dy)) == r) {
          val y = cy + dy
          if (y >= 0 && y < ny) {
            var x = cx + dx
            if (wrapX) x = ((x % nx) + nx) % nx
            if (x >= 0 && x < nx) out += pack(z, x, y)
          }
        }
        dy += 1
      }
      dx += 1
    }
    out.result().distinct
  }

  /** All cells (as packed ids) in the inclusive tile-rectangle. */
  def range(zoom: Int, tx0: Long, ty0: Long, tx1: Long, ty1: Long): Array[Long] = {
    val out = new Array[Long](((tx1 - tx0 + 1) * (ty1 - ty0 + 1)).toInt)
    var i = 0
    var y = ty0
    while (y <= ty1) {
      var x = tx0
      while (x <= tx1) { out(i) = pack(zoom, x, y); i += 1; x += 1 }
      y += 1
    }
    out
  }
}
