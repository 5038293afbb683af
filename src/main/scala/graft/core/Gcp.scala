package graft.core

/** Ground-control-point transformer fit (reference: alg/gdal_crs.c ::
  * GDALCreateGCPTransformer, order-1 polynomial — the gdalwarp path for
  * rasters georeferenced by GCPs instead of a geotransform).
  *
  * The order-1 (affine) fit from EXACTLY three non-collinear integer GCPs
  * is solved by Cramer's rule in Long arithmetic, so the coefficients are
  * EXACT RATIONALS (numerators over one shared determinant denominator)
  * and the per-pixel transform is pure integer math — floorDiv of a Long
  * dot product — that a SQL oracle replays bit-for-bit. Higher orders
  * (2/3) and TPS/RPC keep the same plan shape (driver-side fit, exact or
  * double coefficients broadcast into a per-tile kernel) and stay
  * documented non-goals this round.
  */
object Gcp {

  /** dst→src affine: sx = (a0 + a1·dx + a2·dy)/den, sy = (b0 + b1·dx +
    * b2·dy)/den, den > 0. */
  final case class Affine(a0: Long, a1: Long, a2: Long,
                          b0: Long, b1: Long, b2: Long, den: Long) {
    def srcX(dx: Long, dy: Long): Long = Math.floorDiv(a0 + a1 * dx + a2 * dy, den)
    def srcY(dx: Long, dy: Long): Long = Math.floorDiv(b0 + b1 * dx + b2 * dy, den)
    /** Forward (src→dst) in doubles — SUPERSET selector use only (chunk
      * routing pads its bounding boxes); the kernel never uses it. */
    def fwd(sx: Double, sy: Double): (Double, Double) = {
      val d = den.toDouble
      val det2 = (a1 * b2 - a2 * b1).toDouble // linear part det · den
      val rx = sx * d - a0; val ry = sy * d - b0
      ((b2 * rx - a2 * ry) / det2 * 1.0, (a1 * ry - b1 * rx) / det2 * 1.0)
    }
  }

  /** Exactly-determined order-1 fit from 3 GCPs
    * ((dstX, dstY, srcX, srcY) integer quadruples) via Cramer. */
  def affineFromGcps(gcps: Seq[(Long, Long, Long, Long)]): Affine = {
    require(gcps.length == 3, s"order-1 fit needs exactly 3 GCPs, got ${gcps.length}")
    val Seq((x1, y1, u1, v1), (x2, y2, u2, v2), (x3, y3, u3, v3)) = gcps
    def det3(m00: Long, m01: Long, m02: Long,
             m10: Long, m11: Long, m12: Long,
             m20: Long, m21: Long, m22: Long): Long =
      m00 * (m11 * m22 - m12 * m21) -
        m01 * (m10 * m22 - m12 * m20) +
        m02 * (m10 * m21 - m11 * m20)
    val d = det3(1, x1, y1, 1, x2, y2, 1, x3, y3)
    require(d != 0, "GCPs are collinear")
    val s = if (d < 0) -1L else 1L // normalize den > 0 (floorDiv semantics)
    Affine(
      a0 = s * det3(u1, x1, y1, u2, x2, y2, u3, x3, y3),
      a1 = s * det3(1, u1, y1, 1, u2, y2, 1, u3, y3),
      a2 = s * det3(1, x1, u1, 1, x2, u2, 1, x3, u3),
      b0 = s * det3(v1, x1, y1, v2, x2, y2, v3, x3, y3),
      b1 = s * det3(1, v1, y1, 1, v2, y2, 1, v3, y3),
      b2 = s * det3(1, x1, v1, 1, x2, v2, 1, x3, v3),
      den = s * d)
  }
}
