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

  // ---------------------------------------------------------------------
  // Least-squares polynomial fit, orders 1-3 (reference: alg/gdal_crs.c ::
  // GDALCreateGCPTransformer / CRS_compute_georef_equations — the GRASS
  // CRS code GDAL embeds: with more GCPs than coefficients it solves the
  // NORMAL EQUATIONS AᵀA·c = Aᵀb per target dimension). The exact-rational
  // 3-GCP Cramer path above stays the q79 oracle; this is the general
  // N-GCP path a real gdalwarp user with 10+ GCPs takes.
  // ---------------------------------------------------------------------

  /** Monomial basis in FIXED evaluation order (the printed-SQL contract):
    * order 1 → [1, x, y]; order 2 adds [x², x·y, y²]; order 3 adds
    * [x³, x²·y, x·y², y³] (gdal_crs.c :: CRS_georef's term set). */
  def polyTermCount(order: Int): Int = (order + 1) * (order + 2) / 2

  /** dst→src polynomial: sx = Σ cx(t)·T_t(x,y), sy likewise, evaluated in
    * the one fixed left-assoc op order [[evalPoly]]/[[polySql]] share. */
  final case class Poly(order: Int, cx: Array[Double], cy: Array[Double]) {
    require(order >= 1 && order <= 3, s"GCP polynomial order must be 1-3, got $order")
    require(cx.length == polyTermCount(order) && cy.length == cx.length)
  }

  private def termValues(order: Int, x: Double, y: Double): Array[Double] = {
    val t = new Array[Double](polyTermCount(order))
    t(0) = 1.0; t(1) = x; t(2) = y
    if (order >= 2) { t(3) = x * x; t(4) = x * y; t(5) = y * y }
    if (order >= 3) { t(6) = x * x * x; t(7) = x * x * y; t(8) = x * y * y; t(9) = y * y * y }
    t
  }

  /** Least-squares fit of both target dimensions: builds AᵀA / Aᵀu / Aᵀv
    * with one pass over the GCPs in input order, then one deterministic
    * Gaussian elimination with partial pivoting (ties keep the first
    * maximal row) — pure IEEE double arithmetic in a pinned op order, so
    * the solved coefficients are bit-identical on any JVM and embed as
    * exact literals in a SQL oracle (Double.toString round-trips).
    * Requires N ≥ termCount (≥ 3/6/10 for orders 1/2/3) — gdal_crs.c's
    * own minimum (it refuses the under-determined case the same way). */
  def fitPoly(order: Int, gcps: Seq[(Long, Long, Long, Long)]): Poly = {
    val m = polyTermCount(order)
    require(gcps.length >= m,
      s"order-$order fit needs >= $m GCPs, got ${gcps.length}")
    // augmented normal system [AᵀA | Aᵀu Aᵀv]
    val a = Array.ofDim[Double](m, m + 2)
    gcps.foreach { case (x, y, u, v) =>
      val t = termValues(order, x.toDouble, y.toDouble)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < m) { a(i)(j) += t(i) * t(j); j += 1 }
        a(i)(m) += t(i) * u.toDouble
        a(i)(m + 1) += t(i) * v.toDouble
        i += 1
      }
    }
    var col = 0
    while (col < m) {
      var piv = col
      var best = math.abs(a(col)(col))
      var r = col + 1
      while (r < m) {
        val w = math.abs(a(r)(col))
        if (w > best) { best = w; piv = r }
        r += 1
      }
      require(best > 0.0, s"degenerate GCP configuration at column $col")
      if (piv != col) { val t = a(piv); a(piv) = a(col); a(col) = t }
      r = col + 1
      while (r < m) {
        val f = a(r)(col) / a(col)(col)
        if (f != 0.0) {
          var c = col
          while (c < m + 2) { a(r)(c) -= f * a(col)(c); c += 1 }
        }
        r += 1
      }
      col += 1
    }
    val cx = new Array[Double](m); val cy = new Array[Double](m)
    var rr = m - 1
    while (rr >= 0) {
      var sx = a(rr)(m); var sy = a(rr)(m + 1)
      var c = rr + 1
      while (c < m) { sx -= a(rr)(c) * cx(c); sy -= a(rr)(c) * cy(c); c += 1 }
      cx(rr) = sx / a(rr)(rr); cy(rr) = sy / a(rr)(rr)
      rr -= 1
    }
    Poly(order, cx, cy)
  }

  /** (x,y) → (sx,sy) in the pinned op order: ((c0 + c1·x) + c2·y), then
    * += c_t·(monomial) term by term — the same left-assoc chain
    * [[polySql]] prints, so a SQL engine replays it bit-for-bit (pure
    * +,· — no transcendentals, no rounding-mode freedom). */
  def evalPoly(p: Poly, x: Double, y: Double): (Double, Double) = {
    var sx = (p.cx(0) + p.cx(1) * x) + p.cx(2) * y
    var sy = (p.cy(0) + p.cy(1) * x) + p.cy(2) * y
    if (p.order >= 2) {
      val xx = x * x; val xy = x * y; val yy = y * y
      sx += p.cx(3) * xx; sy += p.cy(3) * xx
      sx += p.cx(4) * xy; sy += p.cy(4) * xy
      sx += p.cx(5) * yy; sy += p.cy(5) * yy
      if (p.order >= 3) {
        val x3 = xx * x; val x2y = xx * y; val xy2 = x * yy; val y3 = yy * y
        sx += p.cx(6) * x3; sy += p.cy(6) * x3
        sx += p.cx(7) * x2y; sy += p.cy(7) * x2y
        sx += p.cx(8) * xy2; sy += p.cy(8) * xy2
        sx += p.cx(9) * y3; sy += p.cy(9) * y3
      }
    }
    (sx, sy)
  }

  /** The exact [[evalPoly]] op sequence as SQL text over column exprs
    * xSql/ySql (dim 'x' or 'y') — engine-vs-oracle op-sequence identity
    * by construction, coefficients embedded as runtime doubles. */
  def polySql(p: Poly, xSql: String, ySql: String, dim: Char): String = {
    val c = if (dim == 'x') p.cx else p.cy
    def d(v: Double): String = java.lang.Double.toString(v)
    val base = s"((${d(c(0))} + ${d(c(1))} * $xSql) + ${d(c(2))} * $ySql)"
    val mono = Seq(
      s"($xSql * $xSql)", s"($xSql * $ySql)", s"($ySql * $ySql)",
      s"(($xSql * $xSql) * $xSql)", s"(($xSql * $xSql) * $ySql)",
      s"($xSql * ($ySql * $ySql))", s"(($ySql * $ySql) * $ySql)")
    val terms = (3 until polyTermCount(p.order)).map(t => s"${d(c(t))} * ${mono(t - 3)}")
    (base +: terms).mkString(" + ")
  }

  /** q163's synthetic control set: 12 GCPs on a 4×3 grid over the
    * 1024×512 dst domain, src = a mild integer quadratic plus ±2 px
    * per-point noise — genuinely over-determined (12 obs, 6 coeffs), so
    * the LS fit has nonzero residuals like a real survey (the exactly-
    * interpolating case would not exercise the normal equations). */
  lazy val demoGcps: Seq[(Long, Long, Long, Long)] =
    for (xi <- Seq(0L, 341L, 682L, 1023L); yi <- Seq(0L, 255L, 511L)) yield {
      val nu = (xi * 7 + yi * 11) % 5 - 2
      val nv = (xi * 13 + yi * 5) % 5 - 2
      val u = xi + 3 + Math.floorDiv(xi * xi, 32768) - Math.floorDiv(xi * yi, 65536) + nu
      val v = yi - 2 + Math.floorDiv(yi * yi, 16384) + Math.floorDiv(xi * yi, 131072) + nv
      (xi, yi, u, v)
    }

  /** The order-2 model q163 warps with — fit once, read by both the
    * engine query and the oracle generator (coefficients embed as exact
    * runtime doubles on both sides). */
  lazy val demo2: Poly = fitPoly(2, demoGcps)

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
