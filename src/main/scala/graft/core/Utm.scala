package graft.core

/** WGS84 ↔ UTM closed-form transverse Mercator, 6th-order Krüger series
  * (public formulas: Karney, "Transverse Mercator with an accuracy of a
  * few nanometers", J. Geod. 2011; series as tabulated on the public
  * record). This is the engine's analog of the reference's PROJ-backed
  * arbitrary-SRS path (reference: ogr/ogrct.cpp :: OGRProj4CT) for the
  * SRS family real users bring most: EPSG 326xx / 327xx UTM zones.
  *
  * Accuracy: the 6th-order series is sub-micrometer within a zone
  * (|λ−λ0| ≤ 3°) and sub-mm anywhere within 10° of the central
  * meridian — far below the cm quantum any oracle uses.
  *
  * Pure scalar math, no allocation: safe to call per-coordinate from a
  * codegen'd expression on the executor hot path.
  */
object Utm {
  private val a = 6378137.0               // WGS84 semi-major
  private val f = 1.0 / 298.257223563     // WGS84 flattening
  private val n = f / (2.0 - f)           // third flattening
  private val k0 = 0.9996
  private val E0 = 500000.0
  private val N0South = 10000000.0

  private val n2 = n * n; private val n3 = n2 * n
  private val n4 = n3 * n; private val n5 = n4 * n; private val n6 = n5 * n

  /** Rectifying radius A = a/(1+n) · (1 + n²/4 + n⁴/64 + n⁶/256). */
  private val rectA = a / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0 + n6 / 256.0)

  // forward series α_j (geodetic → TM)
  private val al = Array(
    n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0 - 127.0 * n5 / 288.0 + 7891.0 * n6 / 37800.0,
    13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0 + 281.0 * n5 / 630.0 - 1983433.0 * n6 / 1935360.0,
    61.0 * n3 / 240.0 - 103.0 * n4 / 140.0 + 15061.0 * n5 / 26880.0 + 167603.0 * n6 / 181440.0,
    49561.0 * n4 / 161280.0 - 179.0 * n5 / 168.0 + 6601661.0 * n6 / 7257600.0,
    34729.0 * n5 / 80640.0 - 3418889.0 * n6 / 1995840.0,
    212378941.0 * n6 / 319334400.0)

  // inverse series β_j (TM → conformal sphere)
  private val be = Array(
    n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0 - 81.0 * n5 / 512.0 + 96199.0 * n6 / 604800.0,
    n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0 + 46.0 * n5 / 105.0 - 1118711.0 * n6 / 3870720.0,
    17.0 * n3 / 480.0 - 37.0 * n4 / 840.0 - 209.0 * n5 / 4480.0 + 5569.0 * n6 / 90720.0,
    4397.0 * n4 / 161280.0 - 11.0 * n5 / 504.0 - 830251.0 * n6 / 7257600.0,
    4583.0 * n5 / 161280.0 - 108847.0 * n6 / 3991680.0,
    20648693.0 * n6 / 638668800.0)

  // conformal → geodetic latitude series δ_j
  private val de = Array(
    2.0 * n - 2.0 * n2 / 3.0 - 2.0 * n3 + 116.0 * n4 / 45.0 + 26.0 * n5 / 45.0 - 2854.0 * n6 / 675.0,
    7.0 * n2 / 3.0 - 8.0 * n3 / 5.0 - 227.0 * n4 / 45.0 + 2704.0 * n5 / 315.0 + 2323.0 * n6 / 945.0,
    56.0 * n3 / 15.0 - 136.0 * n4 / 35.0 - 1262.0 * n5 / 105.0 + 73814.0 * n6 / 2835.0,
    4279.0 * n4 / 630.0 - 332.0 * n5 / 35.0 - 399572.0 * n6 / 14175.0,
    4174.0 * n5 / 315.0 - 144838.0 * n6 / 6237.0,
    601676.0 * n6 / 22275.0)

  private val twoSqrtNov = 2.0 * math.sqrt(n) / (1.0 + n)

  /** Exact runtime doubles for the DuckDB oracle generator
    * (graft.OracleHashSql.q73Utm): embedding these as decimal literals
    * makes the oracle's arithmetic start from bit-identical constants. */
  private[graft] def oracleC1: Double = twoSqrtNov
  private[graft] def oracleKA: Double = k0 * rectA
  private[graft] def oracleRectA: Double = rectA
  private[graft] def oracleAlpha: Array[Double] = al.clone()
  private[graft] def oracleBeta: Array[Double] = be.clone()
  private[graft] def oracleDelta: Array[Double] = de.clone()

  /** Central meridian of a UTM zone, degrees. */
  def zoneLon0(zone: Int): Double = zone * 6.0 - 183.0

  /** The natural zone for a longitude (the engine does NOT force it —
    * out-of-zone transforms are legal, just less accurate far out). */
  def lonZone(lon: Double): Int =
    math.min(60, math.max(1, ((lon + 180.0) / 6.0).toInt + 1))

  /** EPSG 326zz/327zz → (zone, north); -1 zone if not a UTM code. */
  def epsgZone(epsg: Int): (Int, Boolean) = {
    if (epsg >= 32601 && epsg <= 32660) (epsg - 32600, true)
    else if (epsg >= 32701 && epsg <= 32760) (epsg - 32700, false)
    else (-1, true)
  }

  def isUtm(epsg: Int): Boolean = epsgZone(epsg)._1 > 0

  /** (lon°, lat°) → (easting m, northing m) in the given zone/hemisphere. */
  def forward(lon: Double, lat: Double, zone: Int, north: Boolean): (Double, Double) =
    forwardTm(lon, lat, zoneLon0(zone), k0, E0, if (north) 0.0 else N0South)

  /** Generalized Gauss-Krüger / Transverse Mercator forward with explicit
    * central meridian, scale factor and false origin (reference:
    * ogr/ogr_srsnode.cpp + ogr_spatialref.cpp :: SetTM — the
    * Transverse_Mercator projection's four parameters; UTM is SetUTM's
    * (zone·6−183, 0.9996, 500000, 0|10M) specialization). The identical
    * Krüger series — delegation keeps q73/q76's doubles bit-stable. */
  def forwardTm(lon: Double, lat: Double, lon0: Double, k: Double,
                e0: Double, n0: Double): (Double, Double) = {
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon - lon0)
    val sphi = math.sin(phi)
    // conformal latitude via Gauss-Schreiber: t = sinh(atanh sinφ − 2√n/(1+n)·atanh(2√n/(1+n)·sinφ))
    val t = math.sinh(atanh(sphi) - twoSqrtNov * atanh(twoSqrtNov * sphi))
    val cosl = math.cos(lam)
    val xip = math.atan2(t, cosl)
    // sqrt(t²+cos²λ), NOT math.hypot: the DuckDB oracle replicates this as
    // sqrt(t*t + cosl*cosl), and hypot is an algorithmically different op
    // (extra scaling for overflow safety) that can differ by >1 ulp —
    // matching the oracle's exact IEEE op sequence keeps the cm-quantized
    // outputs bit-stable (t, cosl are O(1) here; no overflow concern).
    val etap = asinh(math.sin(lam) / math.sqrt(t * t + cosl * cosl))
    var xi = xip; var eta = etap
    var j = 0
    while (j < 6) {
      val kk = 2.0 * (j + 1)
      xi += al(j) * math.sin(kk * xip) * math.cosh(kk * etap)
      eta += al(j) * math.cos(kk * xip) * math.sinh(kk * etap)
      j += 1
    }
    val e = e0 + k * rectA * eta
    val nn = n0 + k * rectA * xi
    (e, nn)
  }

  /** (easting m, northing m, zone, hemisphere) → (lon°, lat°). */
  def inverse(easting: Double, northing: Double, zone: Int, north: Boolean): (Double, Double) =
    inverseTm(easting, northing, zoneLon0(zone), k0, E0, if (north) 0.0 else N0South)

  /** Generalized TM inverse — see [[forwardTm]]. */
  def inverseTm(easting: Double, northing: Double, lon0: Double, k: Double,
                e0: Double, n0: Double): (Double, Double) = {
    val xi = (northing - n0) / (k * rectA)
    val eta = (easting - e0) / (k * rectA)
    var xip = xi; var etap = eta
    var j = 0
    while (j < 6) {
      val kk = 2.0 * (j + 1)
      xip -= be(j) * math.sin(kk * xi) * math.cosh(kk * eta)
      etap -= be(j) * math.cos(kk * xi) * math.sinh(kk * eta)
      j += 1
    }
    val chi = math.asin(math.sin(xip) / math.cosh(etap))
    var phi = chi
    j = 0
    while (j < 6) {
      phi += de(j) * math.sin(2.0 * (j + 1) * chi)
      j += 1
    }
    val lam = math.atan2(math.sinh(etap), math.cos(xip))
    (lon0 + math.toDegrees(lam), math.toDegrees(phi))
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))

  // JDK Math has no asinh; |x| here is ≤ ~1 (sin λ' / sec-ish), so the
  // naive log form is well-conditioned
  private def asinh(x: Double): Double = {
    val r = math.log(math.abs(x) + math.sqrt(x * x + 1.0))
    if (x < 0) -r else r
  }
}
