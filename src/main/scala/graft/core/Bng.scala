package graft.core

/** EPSG:27700 OSGB36 / British National Grid — the engine's first
  * cross-DATUM transform (reference: ogr/ogrct.cpp :: OGRProj4CT with a
  * towgs84 7-parameter shift; public formulas: EPSG Guidance Note 7-2
  * methods 9606 (position-vector Helmert) + 9807 (Transverse Mercator,
  * Snyder series form), OS "A guide to coordinate systems in Great
  * Britain" for the published OSGB36 Helmert parameters).
  *
  * Chain (4326 → 27700): WGS84 geodetic → WGS84 geocentric XYZ →
  * position-vector Helmert (tx −446.448, ty 125.157, tz −542.060 m;
  * rx −0.1502″, ry −0.2470″, rz −0.8421″; s 20.4894 ppm) → Airy-1830
  * geodetic (φ fixed-point iteration UNROLLED to 5 steps) → TM forward
  * (k0 0.9996012717, φ0 49°, λ0 −2°, FE 400000, FN −100000). Inverse
  * runs the chain backwards with the reverse-sign Helmert (the standard
  * small-parameter inverse, sub-mm at these magnitudes).
  *
  * Op-order discipline as core/Lcc: trig/sqrt/atan2 + fixed-order
  * +,·,/ only, iterations unrolled, every derived constant computed ONCE
  * here and exposed for the oracle generator to embed as the exact
  * runtime double. Helmert accuracy vs the grid-based OSTN correction is
  * the published ~3–5 m — the reference's own no-grid default. Pure
  * scalar math, no allocation: safe per-coordinate on the executor hot
  * path.
  */
object Bng {
  // WGS84
  val aW = 6378137.0
  private val fW = 1.0 / 298.257223563
  val e2W: Double = fW * (2.0 - fW)
  // Airy 1830 (a, b from the EPSG registry)
  val aA = 6377563.396
  private val bA = 6356256.909
  val e2A: Double = 1.0 - (bA * bA) / (aA * aA)
  val ep2: Double = e2A / (1.0 - e2A)
  // TM parameters
  val k0 = 0.9996012717
  val fe = 400000.0
  val fn = -100000.0
  val lat0Rad: Double = math.toRadians(49.0)
  val lon0Rad: Double = math.toRadians(-2.0)
  // Helmert WGS84 → OSGB36 (position vector), radians / unitless
  val tx = -446.448; val ty = 125.157; val tz = -542.060
  val rx: Double = math.toRadians(-0.1502 / 3600.0)
  val ry: Double = math.toRadians(-0.2470 / 3600.0)
  val rz: Double = math.toRadians(-0.8421 / 3600.0)
  val hs: Double = 1.0 + 20.4894 / 1000000.0
  val hsInv: Double = 1.0 - 20.4894 / 1000000.0
  // Meridional-arc series constants on Airy (Snyder 3-21), then M0 = M(φ0)
  private val e4A = e2A * e2A
  private val e6A = e4A * e2A
  val m0c: Double = 1.0 - e2A / 4.0 - 3.0 * e4A / 64.0 - 5.0 * e6A / 256.0
  val m2c: Double = 3.0 * e2A / 8.0 + 3.0 * e4A / 32.0 + 45.0 * e6A / 1024.0
  val m4c: Double = 15.0 * e4A / 256.0 + 45.0 * e6A / 1024.0
  val m6c: Double = 35.0 * e6A / 3072.0
  def merid(phi: Double): Double =
    aA * (m0c * phi - m2c * math.sin(2.0 * phi) + m4c * math.sin(4.0 * phi) -
      m6c * math.sin(6.0 * phi))
  val m0v: Double = merid(lat0Rad)
  // Footpoint-latitude series constant e1 (Snyder 3-24/3-26)
  val e1: Double = (1.0 - math.sqrt(1.0 - e2A)) / (1.0 + math.sqrt(1.0 - e2A))
  val f2c: Double = 3.0 * e1 / 2.0 - 27.0 * (e1 * e1 * e1) / 32.0
  val f4c: Double = 21.0 * (e1 * e1) / 16.0 - 55.0 * (e1 * e1 * e1 * e1) / 32.0
  val f6c: Double = 151.0 * (e1 * e1 * e1) / 96.0
  val f8c: Double = 1097.0 * (e1 * e1 * e1 * e1) / 512.0
  val muDen: Double = aA * m0c

  /** WGS84 (lon°, lat°) → BNG (easting m, northing m). */
  def forward(lon: Double, lat: Double): (Double, Double) = {
    // 1. WGS84 geodetic → geocentric (h = 0)
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon)
    val sp = math.sin(phi); val cp = math.cos(phi)
    val nu = aW / math.sqrt(1.0 - e2W * sp * sp)
    val x = nu * cp * math.cos(lam)
    val y = nu * cp * math.sin(lam)
    val z = nu * (1.0 - e2W) * sp
    // 2. Helmert position vector
    val x2 = tx + hs * (x - rz * y + ry * z)
    val y2 = ty + hs * (rz * x + y - rx * z)
    val z2 = tz + hs * (-ry * x + rx * y + z)
    // 3. geocentric → Airy geodetic, 5-step unrolled φ iteration
    val p = math.sqrt(x2 * x2 + y2 * y2)
    val lam2 = math.atan2(y2, x2)
    var phi2 = math.atan2(z2, p * (1.0 - e2A))
    var i = 0
    while (i < 5) {
      val s = math.sin(phi2)
      val nv = aA / math.sqrt(1.0 - e2A * s * s)
      phi2 = math.atan2(z2 + e2A * nv * s, p)
      i += 1
    }
    // 4. TM forward on Airy (Snyder 8-9..8-13)
    tmForward(lam2, phi2)
  }

  private def tmForward(lam2: Double, phi2: Double): (Double, Double) = {
    val s = math.sin(phi2); val c = math.cos(phi2)
    val t = math.tan(phi2)
    val nu = aA / math.sqrt(1.0 - e2A * s * s)
    val tt = t * t
    val cc = ep2 * c * c
    val bigA = c * (lam2 - lon0Rad)
    val a2 = bigA * bigA; val a3 = a2 * bigA
    val a4 = a2 * a2; val a5 = a4 * bigA; val a6 = a4 * a2
    val m = merid(phi2)
    val e_ = fe + k0 * nu * (bigA + (1.0 - tt + cc) * a3 / 6.0 +
      (5.0 - 18.0 * tt + tt * tt + 72.0 * cc - 58.0 * ep2) * a5 / 120.0)
    val n_ = fn + k0 * (m - m0v + nu * t * (a2 / 2.0 +
      (5.0 - tt + 9.0 * cc + 4.0 * cc * cc) * a4 / 24.0 +
      (61.0 - 58.0 * tt + tt * tt + 600.0 * cc - 330.0 * ep2) * a6 / 720.0))
    (e_, n_)
  }

  /** BNG (easting m, northing m) → WGS84 (lon°, lat°). */
  def inverse(easting: Double, northing: Double): (Double, Double) = {
    // 1. TM inverse on Airy (Snyder 8-12/3-26/8-14..8-18)
    val mu = ((northing - fn) / k0 + m0v) / muDen
    val phi1 = mu + f2c * math.sin(2.0 * mu) + f4c * math.sin(4.0 * mu) +
      f6c * math.sin(6.0 * mu) + f8c * math.sin(8.0 * mu)
    val s1 = math.sin(phi1); val c1 = math.cos(phi1)
    val t1 = math.tan(phi1)
    val den = math.sqrt(1.0 - e2A * s1 * s1)
    val nu1 = aA / den
    val rho1 = aA * (1.0 - e2A) / (den * den * den)
    val tt1 = t1 * t1
    val cc1 = ep2 * c1 * c1
    val d = (easting - fe) / (nu1 * k0)
    val d2 = d * d; val d3 = d2 * d; val d4 = d2 * d2
    val d5 = d4 * d; val d6 = d4 * d2
    val phi2 = phi1 - (nu1 * t1 / rho1) * (d2 / 2.0 -
      (5.0 + 3.0 * tt1 + 10.0 * cc1 - 4.0 * cc1 * cc1 - 9.0 * ep2) * d4 / 24.0 +
      (61.0 + 90.0 * tt1 + 298.0 * cc1 + 45.0 * tt1 * tt1 - 252.0 * ep2 -
        3.0 * cc1 * cc1) * d6 / 720.0)
    val lam2 = lon0Rad + (d - (1.0 + 2.0 * tt1 + cc1) * d3 / 6.0 +
      (5.0 - 2.0 * cc1 + 28.0 * tt1 - 3.0 * cc1 * cc1 + 8.0 * ep2 +
        24.0 * tt1 * tt1) * d5 / 120.0) / c1
    // 2. Airy geodetic → geocentric (h = 0)
    val sp = math.sin(phi2); val cp = math.cos(phi2)
    val nv = aA / math.sqrt(1.0 - e2A * sp * sp)
    val x = nv * cp * math.cos(lam2)
    val y = nv * cp * math.sin(lam2)
    val z = nv * (1.0 - e2A) * sp
    // 3. reverse-sign Helmert (OSGB36 → WGS84)
    val x2 = -tx + hsInv * (x + rz * y - ry * z)
    val y2 = -ty + hsInv * (-rz * x + y + rx * z)
    val z2 = -tz + hsInv * (ry * x - rx * y + z)
    // 4. geocentric → WGS84 geodetic, 5-step unrolled φ iteration
    val p = math.sqrt(x2 * x2 + y2 * y2)
    val lam = math.atan2(y2, x2)
    var phi = math.atan2(z2, p * (1.0 - e2W))
    var i = 0
    while (i < 5) {
      val s = math.sin(phi)
      val nw = aW / math.sqrt(1.0 - e2W * s * s)
      phi = math.atan2(z2 + e2W * nw * s, p)
      i += 1
    }
    (math.toDegrees(lam), math.toDegrees(phi))
  }
}
