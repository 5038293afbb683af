package graft.core

/** Lambert Conformal Conic (2SP) on the GRS80 ellipsoid — the engine's
  * second general-SRS family beyond UTM (reference: ogr/ogrct.cpp ::
  * OGRProj4CT dispatching to PROJ's lcc; public formulas: Snyder, "Map
  * Projections — A Working Manual", USGS PP 1395 pp. 104–110 / EPSG
  * Guidance Note 7-2 method 9802).
  *
  * Supported CRS (parameters from the public EPSG registry; the RGF93 /
  * NAD83 → WGS84 datum shift is identity at this engine's precision, the
  * reference's own no-towgs84 default):
  *   - EPSG:2154  RGF93 / Lambert-93      (φ1=49, φ2=44, φ0=46.5, λ0=3,
  *                                         FE=700000, FN=6600000)
  *   - EPSG:3978  NAD83 / Canada Atlas    (φ1=49, φ2=77, φ0=49, λ0=−95,
  *                                         FE=0, FN=0)
  *
  * Op-order discipline (same contract as core/Utm.scala): every power is
  * written exp(k·ln x), trig/ln/exp only — ops DuckDB has — so the oracle
  * replays the exact IEEE sequence and only libm-vs-JVM transcendental
  * ULPs remain, absorbed by the cm / 1e-6-deg output quanta. Derived
  * constants (n, a·F, ρ0) are computed once here and exposed as exact
  * runtime doubles for the oracle generator to embed as decimal literals.
  *
  * Pure scalar math, no allocation: safe per-coordinate on the executor
  * hot path (CodegenFallback expression eval).
  */
object Lcc {
  private val aGrs80 = 6378137.0
  private val fGrs80 = 1.0 / 298.257222101

  /** One LCC 2SP CRS with its derived projection constants. */
  final class Crs(val epsg: Int, lat1: Double, lat2: Double, lat0: Double,
                  val lon0Deg: Double, val fe: Double, val fn: Double) {
    private val f = fGrs80
    val e2: Double = f * (2.0 - f)
    val e: Double = math.sqrt(e2)
    val halfE: Double = 0.5 * e

    private def m(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1.0 - e2 * s * s)
    }
    // t(φ) = tan(π/4 − φ/2) / ((1 − e·sinφ)/(1 + e·sinφ))^(e/2), the
    // divide folded into a positive exp: × exp((e/2)·ln((1+es)/(1−es)))
    private def tIso(phi: Double): Double = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4.0 - phi / 2.0) *
        math.exp(halfE * math.log((1.0 + e * s) / (1.0 - e * s)))
    }

    private val phi1 = math.toRadians(lat1)
    private val phi2 = math.toRadians(lat2)
    private val phi0 = math.toRadians(lat0)
    private val m1 = m(phi1); private val m2 = m(phi2)
    private val t1 = tIso(phi1); private val t2 = tIso(phi2)
    private val t0 = tIso(phi0)

    /** Cone constant n = (ln m1 − ln m2)/(ln t1 − ln t2); > 0 for both
      * supported CRS (northern standard parallels). */
    val n: Double = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    private val bigF = m1 / (n * math.exp(n * math.log(t1)))
    /** a·F as ONE runtime double — ρ(φ) = aF · t^n uses this product, so
      * the oracle embeds the same single constant. */
    val aF: Double = aGrs80 * bigF
    val rho0: Double = aF * math.exp(n * math.log(t0))

    /** Point scale factor k(φ) = n·ρ(φ)/(a·m(φ)) — 1 exactly at the
      * standard parallels; exposed for the spec's structural check. */
    def scaleFactor(lat: Double): Double = {
      val phi = math.toRadians(lat)
      n * (aF * math.exp(n * math.log(tIso(phi)))) / (aGrs80 * m(phi))
    }
  }

  val crs2154 = new Crs(2154, 49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0)
  val crs3978 = new Crs(3978, 49.0, 77.0, 49.0, -95.0, 0.0, 0.0)

  def byEpsg(epsg: Int): Crs = epsg match {
    case 2154 => crs2154
    case 3978 => crs3978
    case other => throw new IllegalArgumentException(s"not a supported LCC EPSG: $other")
  }

  def isLcc(epsg: Int): Boolean = epsg == 2154 || epsg == 3978

  /** (lon°, lat°) → (easting m, northing m). λ−λ0 wraps once into
    * (−180, 180] in DEGREES (exact arithmetic — 360 is a power-of-2-free
    * exact double and the subtraction cancels exactly). */
  def forward(lon: Double, lat: Double, c: Crs): (Double, Double) = {
    var lamd = lon - c.lon0Deg
    if (lamd > 180.0) lamd -= 360.0
    if (lamd < -180.0) lamd += 360.0
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lamd)
    val sphi = math.sin(phi)
    val tt = math.tan(math.Pi / 4.0 - phi / 2.0) *
      math.exp(c.halfE * math.log((1.0 + c.e * sphi) / (1.0 - c.e * sphi)))
    val rho = c.aF * math.exp(c.n * math.log(tt))
    val th = c.n * lam
    (c.fe + rho * math.sin(th), c.fn + c.rho0 - rho * math.cos(th))
  }

  /** (easting m, northing m) → (lon°, lat°). φ by the fixed-point
    * iteration φ ← π/2 − 2·atan(t′·((1−e·sinφ)/(1+e·sinφ))^(e/2)),
    * UNROLLED to exactly 5 steps after the spherical seed (converges to
    * <1e-12 rad in ≤4 for e≈0.0818) so the SQL oracle can replay the
    * same fixed chain — a while-until-converged loop would make the op
    * count data-dependent and the replica impossible. */
  def inverse(easting: Double, northing: Double, c: Crs): (Double, Double) = {
    val dx = easting - c.fe
    val dy = c.rho0 - (northing - c.fn)
    val rhop = math.sqrt(dx * dx + dy * dy) // n > 0 for both CRS
    val tp = math.exp(math.log(rhop / c.aF) / c.n)
    val thp = math.atan2(dx, dy)
    val lam = thp / c.n
    var phi = math.Pi / 2.0 - 2.0 * math.atan(tp)
    var k = 0
    while (k < 5) {
      val s = math.sin(phi)
      phi = math.Pi / 2.0 - 2.0 * math.atan(
        tp * math.exp(c.halfE * math.log((1.0 - c.e * s) / (1.0 + c.e * s))))
      k += 1
    }
    (c.lon0Deg + math.toDegrees(lam), math.toDegrees(phi))
  }
}
