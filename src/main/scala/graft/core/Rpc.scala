package graft.core

/** Rational Polynomial Coefficient (RPC00B) ground→image transformer —
  * the engine's analog of the reference's RPC warp path (reference:
  * alg/gdal_rpc.cpp :: GDALCreateRPCTransformer; term order per the
  * public RPC00B specification used by that file).
  *
  * image = (Σ numᵢ·ρᵢ(L,P,H) / Σ denᵢ·ρᵢ(L,P,H)) · scale + offset over
  * normalized ground coordinates L=(lon−off)/scale etc. Every operation
  * is +,·,/ on doubles — NO transcendentals — so with a fixed evaluation
  * order (terms summed in basis order, monomial factors multiplied
  * left-assoc L…P…H) the whole transform is bit-for-bit reproducible by
  * a SQL oracle: IEEE +,·,/ are exactly rounded and order-determined.
  *
  * Pure scalar math, no allocation beyond the coefficient arrays: safe
  * per-pixel on the executor hot path.
  */
object Rpc {

  /** RPC00B 20-term basis as (i,j,k) exponents of (L,P,H), spec order:
    * 1, L, P, H, LP, LH, PH, L², P², H², LPH, L³, LP², LH², L²P, P³,
    * PH², L²H, P²H, H³. */
  val basis: Array[(Int, Int, Int)] = Array(
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0),
    (1, 0, 1), (0, 1, 1), (2, 0, 0), (0, 2, 0), (0, 0, 2),
    (1, 1, 1), (3, 0, 0), (1, 2, 0), (1, 0, 2), (2, 1, 0),
    (0, 3, 0), (0, 1, 2), (2, 0, 1), (0, 2, 1), (0, 0, 3))

  final case class Model(lonOff: Double, lonScale: Double,
                         latOff: Double, latScale: Double,
                         hOff: Double, hScale: Double,
                         sampOff: Double, sampScale: Double,
                         lineOff: Double, lineScale: Double,
                         sampNum: Array[Double], sampDen: Array[Double],
                         lineNum: Array[Double], lineDen: Array[Double])

  /** Monomial L^i·P^j·H^k multiplied left-assoc starting from 1.0
    * (1.0·x == x exactly, so the seed adds no rounding) — the SQL oracle
    * writes the same factor chain. */
  private def mono(l: Double, p: Double, h: Double, i: Int, j: Int, k: Int): Double = {
    var m = 1.0
    var c = 0
    while (c < i) { m = m * l; c += 1 }
    c = 0
    while (c < j) { m = m * p; c += 1 }
    c = 0
    while (c < k) { m = m * h; c += 1 }
    m
  }

  /** Σ cᵢ·ρᵢ in basis order, left-assoc from 0.0 (0.0+x == x exactly). */
  def poly(cs: Array[Double], l: Double, p: Double, h: Double): Double = {
    var s = 0.0
    var i = 0
    while (i < 20) {
      val (bi, bj, bk) = basis(i)
      s += cs(i) * mono(l, p, h, bi, bj, bk)
      i += 1
    }
    s
  }

  /** (lon°, lat°, h m) → (samp px, line px). */
  def sampLine(m: Model, lon: Double, lat: Double, h: Double): (Double, Double) = {
    val l = (lon - m.lonOff) / m.lonScale
    val p = (lat - m.latOff) / m.latScale
    val hh = (h - m.hOff) / m.hScale
    val samp = poly(m.sampNum, l, p, hh) / poly(m.sampDen, l, p, hh) * m.sampScale + m.sampOff
    val line = poly(m.lineNum, l, p, hh) / poly(m.lineDen, l, p, hh) * m.lineScale + m.lineOff
    (samp, line)
  }

  private def coeffs(pairs: (Int, Double)*): Array[Double] = {
    val a = new Array[Double](20)
    pairs.foreach { case (i, v) => a(i - 1) = v } // 1-based spec indices
    a
  }

  /** The q82 synthetic model (real RPC00B coefficients ship with imagery,
    * which this sandbox has none of — the spec explains the shape, this
    * instance exercises it): a dominant affine with mild quadratic/cubic
    * distortion and a near-1 denominator, mapping the whole geodetic
    * window into the 1024×512 source grid. Denominator ≥ 0.99 over the
    * normalized domain — no pole. Shared by the engine query and the
    * oracle generator so both sides embed the same runtime doubles. */
  val demo: Model = Model(
    lonOff = 0.0, lonScale = 180.0,
    latOff = 0.0, latScale = 90.0,
    hOff = 0.0, hScale = 500.0,
    sampOff = 512.0, sampScale = 512.0,
    lineOff = 256.0, lineScale = 256.0,
    sampNum = coeffs(2 -> 0.97, 3 -> 0.015, 5 -> 0.011, 8 -> 0.006,
      12 -> 0.0023, 13 -> 0.0017, 4 -> 0.002, 6 -> 0.001),
    sampDen = coeffs(1 -> 1.0, 2 -> 0.0013, 3 -> 0.0007, 5 -> 0.0003),
    lineNum = coeffs(3 -> 0.96, 2 -> 0.013, 5 -> 0.009, 9 -> 0.007,
      16 -> 0.0021, 15 -> 0.0015, 4 -> 0.0015, 7 -> 0.0009),
    lineDen = coeffs(1 -> 1.0, 3 -> 0.0011, 2 -> 0.0005, 9 -> 0.0004))
}
