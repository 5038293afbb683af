package graft.core

/** Polar Stereographic (variant B) on WGS84 — the engine's third
  * general-SRS family beyond UTM and LCC (reference: ogr/ogrct.cpp ::
  * OGRProj4CT dispatching to PROJ's stere; public formulas: Snyder PP
  * 1395 pp. 160–163 / EPSG Guidance Note 7-2 method 9829).
  *
  * Supported CRS (parameters from the public EPSG registry):
  *   - EPSG:3031  WGS84 / Antarctic Polar Stereographic (φF=−71, λ0=0,
  *                FE=FN=0, south aspect)
  *   - EPSG:3413  WGS84 / NSIDC Sea Ice Polar Stereographic North
  *                (φF=70, λ0=−45, FE=FN=0, north aspect)
  *
  * Variant B folds the scale into ρ = (a·mF/tF)·t — exact at the
  * standard parallel — so ONE derived runtime double per CRS (`k`)
  * reaches the oracle. Op-order discipline as core/Lcc.scala: powers as
  * exp(k·ln x), trig/ln/exp only, φ-iteration unrolled to exactly 5
  * steps; libm-vs-JVM transcendental ULPs are absorbed by the cm /
  * 1e-6-deg output quanta. Pure scalar math, no allocation: safe
  * per-coordinate on the executor hot path.
  */
object Ps {
  private val aWgs = 6378137.0
  private val fWgs = 1.0 / 298.257223563

  final class Crs(val epsg: Int, latF: Double, val lon0Deg: Double,
                  val fe: Double, val fn: Double, val south: Boolean) {
    val e2: Double = fWgs * (2.0 - fWgs)
    val e: Double = math.sqrt(e2)
    val halfE: Double = 0.5 * e

    private val phiF = math.toRadians(latF)
    private val sF = math.sin(phiF)
    private val mF = math.cos(phiF) / math.sqrt(1.0 - e2 * sF * sF)
    // north-aspect isometric t at |aspect|: for south CRS the formulas
    // below evaluate the mirrored form, which equals the north form at −φ
    private val tF =
      if (south)
        math.tan(math.Pi / 4.0 + phiF / 2.0) *
          math.exp(halfE * math.log((1.0 - e * sF) / (1.0 + e * sF)))
      else
        math.tan(math.Pi / 4.0 - phiF / 2.0) *
          math.exp(halfE * math.log((1.0 + e * sF) / (1.0 - e * sF)))

    /** ρ(φ) = k·t(φ) with k = a·mF/tF — ONE runtime double, scale exact
      * at the standard parallel; the oracle embeds this same constant. */
    val k: Double = aWgs * mF / tF

    /** Point scale factor k(φ) = ρ(φ)/(a·m(φ)) — 1 exactly at the
      * standard parallel; exposed for the spec's structural check. */
    def scaleFactor(lat: Double): Double = {
      val phi = math.toRadians(lat)
      val s = math.sin(phi)
      val t =
        if (south)
          math.tan(math.Pi / 4.0 + phi / 2.0) *
            math.exp(halfE * math.log((1.0 - e * s) / (1.0 + e * s)))
        else
          math.tan(math.Pi / 4.0 - phi / 2.0) *
            math.exp(halfE * math.log((1.0 + e * s) / (1.0 - e * s)))
      val m = math.cos(phi) / math.sqrt(1.0 - e2 * s * s)
      k * t / (aWgs * m)
    }
  }

  val crs3031 = new Crs(3031, -71.0, 0.0, 0.0, 0.0, south = true)
  val crs3413 = new Crs(3413, 70.0, -45.0, 0.0, 0.0, south = false)

  def byEpsg(epsg: Int): Crs = epsg match {
    case 3031 => crs3031
    case 3413 => crs3413
    case other => throw new IllegalArgumentException(s"not a supported polar-stereo EPSG: $other")
  }

  def isPs(epsg: Int): Boolean = epsg == 3031 || epsg == 3413

  /** (lon°, lat°) → (easting m, northing m). λ−λ0 wraps once into
    * (−180, 180] in degrees, like Lcc.forward. */
  def forward(lon: Double, lat: Double, c: Crs): (Double, Double) = {
    var lamd = lon - c.lon0Deg
    if (lamd > 180.0) lamd -= 360.0
    if (lamd < -180.0) lamd += 360.0
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lamd)
    val s = math.sin(phi)
    if (c.south) {
      val t = math.tan(math.Pi / 4.0 + phi / 2.0) *
        math.exp(c.halfE * math.log((1.0 - c.e * s) / (1.0 + c.e * s)))
      val rho = c.k * t
      (c.fe + rho * math.sin(lam), c.fn + rho * math.cos(lam))
    } else {
      val t = math.tan(math.Pi / 4.0 - phi / 2.0) *
        math.exp(c.halfE * math.log((1.0 + c.e * s) / (1.0 - c.e * s)))
      val rho = c.k * t
      (c.fe + rho * math.sin(lam), c.fn - rho * math.cos(lam))
    }
  }

  /** (easting m, northing m) → (lon°, lat°). North-form φ fixed-point
    * chain (Lcc.inverse's shape) unrolled to exactly 5 steps; the south
    * aspect mirrors through φ → −φ, which commutes bit-exactly with the
    * final degrees conversion ((−x)·c ≡ −(x·c) in IEEE). */
  def inverse(easting: Double, northing: Double, c: Crs): (Double, Double) = {
    val dx = easting - c.fe
    val dy = if (c.south) northing - c.fn else c.fn - northing
    val rho = math.sqrt(dx * dx + dy * dy)
    val tp = rho / c.k
    val lam = math.atan2(dx, dy)
    var phi = math.Pi / 2.0 - 2.0 * math.atan(tp)
    var i = 0
    while (i < 5) {
      val s = math.sin(phi)
      phi = math.Pi / 2.0 - 2.0 * math.atan(
        tp * math.exp(c.halfE * math.log((1.0 - c.e * s) / (1.0 + c.e * s))))
      i += 1
    }
    val phiSigned = if (c.south) -phi else phi
    (c.lon0Deg + math.toDegrees(lam), math.toDegrees(phiSigned))
  }
}
