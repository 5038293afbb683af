package graft.core

/** Albers Equal-Area conic on the GRS80 ellipsoid — the equal-area conic
  * sibling of the LCC 2SP family (reference: ogr/ogr_spatialref.cpp ::
  * OGRSpatialReference::SetACEA dispatching through ogr/ogrct.cpp to
  * PROJ's aea; public formulas: Snyder, "Map Projections — A Working
  * Manual", USGS PP 1395 pp. 98–103 / EPSG Guidance Note 7-2 method
  * 9822).
  *
  * Supported CRS (parameters from the public EPSG registry):
  *   - EPSG:5070  NAD83 / Conus Albers       (φ1=29.5, φ2=45.5, φ0=23,
  *                                            λ0=−96, FE=0, FN=0)
  *   - EPSG:3577  GDA94 / Australian Albers  (φ1=−18, φ2=−36, φ0=0,
  *                                            λ0=132, FE=0, FN=0) — the
  *     southern-parallel case with cone constant n < 0, exercising the
  *     Snyder sign-reversal rule in the inverse's atan2.
  *
  * Op-order discipline (the core/Lcc.scala contract): trig/ln/exp/sqrt
  * only — ops DuckDB has — so the oracle replays the exact IEEE sequence
  * and only libm-vs-JVM transcendental ULPs remain, absorbed by the
  * cm / 1e-6-deg output quanta. Derived constants (n, C, ρ0) are computed
  * once here and exposed as exact runtime doubles for the oracle
  * generator to embed as decimal literals.
  *
  * Both supported CRS keep C − n·q(φ) > 0 over the entire |φ| ≤ 90°
  * globe (checked in CoreSpec), so the forward never takes √ of a
  * negative anywhere in the synth input domain (lat ∈ [−80, 80)).
  *
  * Pure scalar math, no allocation: safe per-coordinate on the executor
  * hot path (CodegenFallback expression eval).
  */
object Albers {
  private val aGrs80 = 6378137.0
  private val fGrs80 = 1.0 / 298.257222101

  /** One Albers equal-area CRS with its derived projection constants. */
  final class Crs(val epsg: Int, lat1: Double, lat2: Double, lat0: Double,
                  val lon0Deg: Double, val fe: Double, val fn: Double) {
    private val f = fGrs80
    val e2: Double = f * (2.0 - f)
    val e: Double = math.sqrt(e2)

    /** Snyder 3-12: q(φ) = (1−e²)·(sinφ/(1−e²sin²φ)
      *                      − (1/(2e))·ln((1−e·sinφ)/(1+e·sinφ))). */
    private[graft] def qf(phi: Double): Double = {
      val s = math.sin(phi)
      (1.0 - e2) * (s / (1.0 - e2 * s * s)
        - (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
    }
    private def m(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1.0 - e2 * s * s)
    }

    private val phi1 = math.toRadians(lat1)
    private val phi2 = math.toRadians(lat2)
    private val phi0 = math.toRadians(lat0)
    private val m1 = m(phi1); private val m2 = m(phi2)
    private val q1 = qf(phi1); private val q2 = qf(phi2)

    /** Cone constant n = (m1² − m2²)/(q2 − q1) (Snyder 14-14); negative
      * for southern standard parallels (EPSG:3577). */
    val n: Double = (m1 * m1 - m2 * m2) / (q2 - q1)
    /** C = m1² + n·q1 (Snyder 14-13). */
    val bigC: Double = m1 * m1 + n * q1
    /** ρ0 = a·√(C − n·q0)/n (Snyder 14-12a) — carries the sign of n. */
    val rho0: Double = aGrs80 * math.sqrt(bigC - n * qf(phi0)) / n
    /** sign(n) as ±1.0 — the inverse's atan2 flips both args by it
      * (Snyder p. 102: "if n is negative, reverse the signs of x, y and
      * ρ0" — folding the ρ0 flip into θ′ is algebraically identical). */
    val sgn: Double = if (n < 0.0) -1.0 else 1.0
  }

  val crs5070 = new Crs(5070, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0)
  val crs3577 = new Crs(3577, -18.0, -36.0, 0.0, 132.0, 0.0, 0.0)

  def byEpsg(epsg: Int): Crs = epsg match {
    case 5070 => crs5070
    case 3577 => crs3577
    case other => throw new IllegalArgumentException(s"not a supported Albers EPSG: $other")
  }

  def isAlbers(epsg: Int): Boolean = epsg == 5070 || epsg == 3577

  /** (lon°, lat°) → (easting m, northing m). λ−λ0 wraps once into
    * (−180, 180] in DEGREES (exact arithmetic, the core/Lcc.forward
    * contract). */
  def forward(lon: Double, lat: Double, c: Crs): (Double, Double) = {
    var lamd = lon - c.lon0Deg
    if (lamd > 180.0) lamd -= 360.0
    if (lamd < -180.0) lamd += 360.0
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lamd)
    val q = c.qf(phi)
    val rho = aGrs80 * math.sqrt(c.bigC - c.n * q) / c.n
    val th = c.n * lam
    (c.fe + rho * math.sin(th), c.fn + c.rho0 - rho * math.cos(th))
  }

  /** (easting m, northing m) → (lon°, lat°). φ by Snyder 3-16 Newton
    * iteration seeded at asin(q′/2), UNROLLED to exactly 6 steps
    * (converges to <1e-12 rad in ≤4 for e≈0.0818 over the supported
    * domain) so the SQL oracle replays the same fixed chain. The output
    * longitude wraps once into (−180, 180] — the forward wraps its input
    * the same way, so a far-from-λ0 round trip returns the canonical
    * branch, not lon+360 (cases like lon=−104.99 under the Australian
    * CRS otherwise come back as 255.01). */
  def inverse(easting: Double, northing: Double, c: Crs): (Double, Double) = {
    val dx = easting - c.fe
    val dy = c.rho0 - (northing - c.fn)
    val rhop = math.sqrt(dx * dx + dy * dy)
    // q′ = (C − ρ′²·n²/a²)/n (Snyder 14-19; ρ′ enters squared, so the
    // n<0 sign reversal only affects θ′ below)
    val qp = (c.bigC - (rhop * rhop) * (c.n * c.n) / (aGrs80 * aGrs80)) / c.n
    val thp = math.atan2(c.sgn * dx, c.sgn * dy)
    val lam = thp / c.n
    var phi = math.asin(qp / 2.0)
    var k = 0
    while (k < 6) {
      val s = math.sin(phi)
      val om = 1.0 - c.e2 * s * s
      phi += (om * om) / (2.0 * math.cos(phi)) *
        (qp / (1.0 - c.e2) - s / om
          + (1.0 / (2.0 * c.e)) * math.log((1.0 - c.e * s) / (1.0 + c.e * s)))
      k += 1
    }
    var lon = c.lon0Deg + math.toDegrees(lam)
    if (lon > 180.0) lon -= 360.0
    if (lon < -180.0) lon += 360.0
    (lon, math.toDegrees(phi))
  }
}
