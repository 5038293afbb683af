package graft.core

/** 3×3 focal kernels — the scalar core of the DEM operators (reference:
  * apps/gdaldem.cpp :: GDALHillshade / GDALSlope / GDALAspect /
  * GDALTRI / GDALTPI / GDALRoughness). Operates on a HALO-PADDED buffer of
  * (w+2)×(h+2) pixels and emits the w×h interior, so the distributed
  * operator's only job is assembling halos (SURVEY.md §3.6 O5).
  *
  * Window naming follows the reference (row-major, y down):
  *   a b c
  *   d e f
  *   g h i
  *
  * Border semantics: callers pad by clamping at the raster edge
  * (the reference's -compute_edges style), documented in FocalSpec.
  */
object Focal {

  final case class Params(ewres: Double = 1.0, nsres: Double = 1.0,
                          z: Double = 1.0, scale: Double = 1.0,
                          altDeg: Double = 45.0, azDeg: Double = 315.0)

  /** Apply `mode` to the padded buffer. Modes: hillshade, hillshade_md,
    * hillshade_combined, slope_deg, aspect_deg, tri, tpi, roughness,
    * edge8. */
  def apply(padded: Array[Double], w: Int, h: Int, mode: String,
            p: Params = Params()): Array[Double] = {
    val pw = w + 2
    val out = new Array[Double](w * h)
    val degToRad = math.Pi / 180.0
    val altRad = p.altDeg * degToRad
    val azRad = p.azDeg * degToRad
    val sinAlt = math.sin(altRad)
    val cosAlt = math.cos(altRad)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cx = x + 1; val cy = y + 1
        val a = padded((cy - 1) * pw + cx - 1); val b = padded((cy - 1) * pw + cx); val c = padded((cy - 1) * pw + cx + 1)
        val d = padded(cy * pw + cx - 1);       val e = padded(cy * pw + cx);       val f = padded(cy * pw + cx + 1)
        val g = padded((cy + 1) * pw + cx - 1); val hh = padded((cy + 1) * pw + cx); val i = padded((cy + 1) * pw + cx + 1)
        val v = mode match {
          case "tri" =>
            // mean absolute difference center vs 8 neighbors (Wilson 2007;
            // reference: gdaldem TRI -alg Wilson)
            (math.abs(a - e) + math.abs(b - e) + math.abs(c - e) + math.abs(d - e) +
              math.abs(f - e) + math.abs(g - e) + math.abs(hh - e) + math.abs(i - e)) / 8.0
          case "tri_riley" =>
            // sqrt of summed squared differences (Riley et al. 1999 —
            // gdaldem TRI's DEFAULT algorithm). Squares/sums of small
            // integers are exact and IEEE sqrt is correctly rounded, so
            // the double compares bit-exactly across engines.
            math.sqrt((a - e) * (a - e) + (b - e) * (b - e) + (c - e) * (c - e) +
              (d - e) * (d - e) + (f - e) * (f - e) + (g - e) * (g - e) +
              (hh - e) * (hh - e) + (i - e) * (i - e))
          case "tpi" =>
            // center minus mean of 8 neighbors
            e - (a + b + c + d + f + g + hh + i) / 8.0
          case "roughness" =>
            // max - min over the full 3×3 window
            val mx = math.max(math.max(math.max(a, b), math.max(c, d)),
              math.max(math.max(e, f), math.max(g, math.max(hh, i))))
            val mn = math.min(math.min(math.min(a, b), math.min(c, d)),
              math.min(math.min(e, f), math.min(g, math.min(hh, i))))
            mx - mn
          case "slope_deg" =>
            // Horn's formula (reference: gdaldem slope)
            val dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * p.ewres)
            val dzdy = ((g + 2 * hh + i) - (a + 2 * b + c)) / (8.0 * p.nsres)
            math.atan(p.z * math.sqrt(dzdx * dzdx + dzdy * dzdy) / p.scale) / degToRad
          case "aspect_deg" =>
            // azimuth the slope faces, degrees clockwise from north
            val dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / 8.0
            val dzdy = ((g + 2 * hh + i) - (a + 2 * b + c)) / 8.0
            if (dzdx == 0 && dzdy == 0) -9999.0
            else {
              val deg = math.atan2(dzdy, -dzdx) / degToRad
              val az = 90.0 - deg
              if (az < 0) az + 360.0 else if (az >= 360.0) az - 360.0 else az
            }
          case "aspect_trig" =>
            // gdaldem aspect -trigonometric -zero_for_flat: the angle
            // stays mathematical (CCW from east, atan2(dzdy, -dzdx)
            // wrapped into [0,360)) instead of compass, and flat cells
            // return 0 instead of the -9999 sentinel
            val dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / 8.0
            val dzdy = ((g + 2 * hh + i) - (a + 2 * b + c)) / 8.0
            if (dzdx == 0 && dzdy == 0) 0.0
            else {
              val deg = math.atan2(dzdy, -dzdx) / degToRad
              if (deg < 0) deg + 360.0 else deg
            }
          case "slope_pct" =>
            // gdaldem slope -p (percent slope; reference apps/gdaldem.cpp
            // GDALSlope percent branch): 100·rise/run over the Horn
            // gradient — no trig at all, so with integer inputs the whole
            // chain is exactly-rounded *, /, sqrt and the oracle replays
            // it bit-exactly UNQUANTIZED
            val dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * p.ewres)
            val dzdy = ((g + 2 * hh + i) - (a + 2 * b + c)) / (8.0 * p.nsres)
            100.0 * (p.z * math.sqrt(dzdx * dzdx + dzdy * dzdy) / p.scale)
          case "slope_zt" =>
            // Zevenbergen–Thorne slope (reference: apps/gdaldem.cpp ::
            // GDALSlopeZevenbergenThorneAlg, the -alg ZevenbergenThorne
            // flag): central differences over the 4 edge neighbors only,
            // denominator 2 instead of Horn's weighted 8
            val dzdx = (f - d) / (2.0 * p.ewres)
            val dzdy = (hh - b) / (2.0 * p.nsres)
            math.atan(p.z * math.sqrt(dzdx * dzdx + dzdy * dzdy) / p.scale) / degToRad
          case "aspect_zt" =>
            // ZT aspect: same wrap/flat-sentinel logic as Horn aspect,
            // gradient from the edge neighbors alone — flat fires whenever
            // f==d AND hh==b, a strictly larger set than Horn's
            val dzdx = (f - d) / 2.0
            val dzdy = (hh - b) / 2.0
            if (dzdx == 0 && dzdy == 0) -9999.0
            else {
              val deg = math.atan2(dzdy, -dzdx) / degToRad
              val az = 90.0 - deg
              if (az < 0) az + 360.0 else if (az >= 360.0) az - 360.0 else az
            }
          case "hillshade_zt" =>
            // ZT hillshade: the Horn shade chain over the ZT gradient
            // (reference GDALHillshadeZevenbergenThorneAlg wires the same
            // shade formula to the 2-tap derivative)
            val xx = p.z * (d - f) / (2.0 * p.ewres * p.scale)
            val yy = p.z * (hh - b) / (2.0 * p.nsres * p.scale)
            val slope = math.Pi / 2.0 - math.atan(math.sqrt(xx * xx + yy * yy))
            val aspect = math.atan2(yy, xx)
            val cang = sinAlt * math.sin(slope) +
              cosAlt * math.cos(slope) * math.cos(azRad - math.Pi / 2.0 - aspect)
            if (cang <= 0.0) 1.0 else math.floor(1.0 + 254.0 * cang + 0.5)
          case "hillshade" =>
            // Horn hillshade, byte 1..255 (reference: gdaldem hillshade)
            val xx = p.z * ((a + 2 * d + g) - (c + 2 * f + i)) / (8.0 * p.ewres * p.scale)
            val yy = p.z * ((g + 2 * hh + i) - (a + 2 * b + c)) / (8.0 * p.nsres * p.scale)
            val slope = math.Pi / 2.0 - math.atan(math.sqrt(xx * xx + yy * yy))
            val aspect = math.atan2(yy, xx)
            val cang = sinAlt * math.sin(slope) +
              cosAlt * math.cos(slope) * math.cos(azRad - math.Pi / 2.0 - aspect)
            // floor(x + 0.5), not rint: rint's half-to-even differs from
            // SQL round()'s half-away at exact .5 ties, while floor(x+0.5)
            // is the same IEEE op sequence in both engines (and is GDAL's
            // own (int)(… + 0.5) idiom)
            if (cang <= 0.0) 1.0 else math.floor(1.0 + 254.0 * cang + 0.5)
          case "hillshade_md" =>
            // multidirectional hillshade (reference: gdaldem hillshade
            // -multidirectional, the USGS/Mark Smith method): shade from
            // azimuths 225/270/315/360 weighted by sin²(aspect − az). The
            // four weights at 45° spacing sum to 2 identically, so the
            // combination normalizes by /2. Flat terrain degenerates to
            // the standard single-azimuth value (weights × sinAlt).
            val xx = p.z * ((a + 2 * d + g) - (c + 2 * f + i)) / (8.0 * p.ewres * p.scale)
            val yy = p.z * ((g + 2 * hh + i) - (a + 2 * b + c)) / (8.0 * p.nsres * p.scale)
            val slope = math.Pi / 2.0 - math.atan(math.sqrt(xx * xx + yy * yy))
            val aspect = math.atan2(yy, xx)
            var acc = 0.0
            var az = 225.0
            while (az <= 360.0) {
              val azR = az * degToRad
              val wgt = { val s = math.sin(aspect - azR); s * s }
              val cang = sinAlt * math.sin(slope) +
                cosAlt * math.cos(slope) * math.cos(azR - math.Pi / 2.0 - aspect)
              acc += wgt * math.max(cang, 0.0)
              az += 45.0
            }
            val cmb = acc / 2.0
            if (cmb <= 0.0) 1.0 else math.floor(1.0 + 254.0 * cmb + 0.5)
          case "hillshade_combined" =>
            // combined shading (reference: gdaldem hillshade -combined):
            // the Horn shade angle acos(cang) damped by the slope angle,
            // cmb = 1 − acos(cang)·slopeAng·(4/π²) — flat terrain (slopeAng
            // = 0) always maps to 255 regardless of altitude, full-contrast
            // oblique shading only on steep cells. cang is a true cosine
            // but FP error can land a hair outside [−1,1], so it is clamped
            // min-then-max (the oracle replays least-then-greatest in the
            // same order).
            val xx = p.z * ((a + 2 * d + g) - (c + 2 * f + i)) / (8.0 * p.ewres * p.scale)
            val yy = p.z * ((g + 2 * hh + i) - (a + 2 * b + c)) / (8.0 * p.nsres * p.scale)
            val slopeAng = math.atan(math.sqrt(xx * xx + yy * yy))
            val slope = math.Pi / 2.0 - slopeAng
            val aspect = math.atan2(yy, xx)
            val cang = sinAlt * math.sin(slope) +
              cosAlt * math.cos(slope) * math.cos(azRad - math.Pi / 2.0 - aspect)
            val cmb = 1.0 - math.acos(math.max(-1.0, math.min(1.0, cang))) *
              slopeAng / (math.Pi * math.Pi / 4.0)
            if (cmb <= 0.0) 1.0 else math.floor(1.0 + 254.0 * cmb + 0.5)
          case "hillshade_igor" =>
            // igor-style soft shading (reference: gdaldem hillshade -igor,
            // apps/gdaldem_lib.cpp :: GDALHillshadeIgorAlg — the shadow
            // law shade = 255·(1 − slopeStrength·aspectStrength) over the
            // Horn gradient): slopeStrength = slope angle as a fraction of
            // 90° (atan(|∇|)/(π/2)); aspectStrength = angdiff/π where
            // angdiff is the minimal angular distance between the aspect
            // and the LIGHT direction (azRad − π/2 in the math convention
            // the Horn shade chain uses) — 0 facing the light, 1 facing
            // away — so light-facing cells keep full brightness and
            // away-facing steep cells darken linearly.
            // fmod (Scala %) on both engines — a bare subtraction rounds
            // differently than the exact fmod remainder.
            val xx = p.z * ((a + 2 * d + g) - (c + 2 * f + i)) / (8.0 * p.ewres * p.scale)
            val yy = p.z * ((g + 2 * hh + i) - (a + 2 * b + c)) / (8.0 * p.nsres * p.scale)
            val slopeStrength = math.atan(math.sqrt(xx * xx + yy * yy)) / (math.Pi / 2.0)
            val aspect = math.atan2(yy, xx)
            val light = azRad - math.Pi / 2.0
            val d0 = math.abs(aspect - light) % (2.0 * math.Pi)
            val angDiff = if (d0 > math.Pi) 2.0 * math.Pi - d0 else d0
            val aspectStrength = angDiff / math.Pi
            255.0 * (1.0 - slopeStrength * aspectStrength)
          case "edge8" =>
            // class-boundary marker: 1 where the center differs from any
            // 8-neighbor (edge-clamped borders never flag). Feeds the
            // cutline-blend proximity prefilter (operators/Raster.scala
            // cutlineBlend): the nearest opposite-class pixel to any pixel
            // always sits on this boundary, so proximity targets shrink
            // from O(area) to O(perimeter)
            if (a != e || b != e || c != e || d != e ||
              f != e || g != e || hh != e || i != e) 1.0 else 0.0
          case other => throw new IllegalArgumentException(s"focal mode $other")
        }
        out(y * w + x) = v
        x += 1
      }
      y += 1
    }
    out
  }

  /** Whole-grid scalar oracle: pad a gw×gh raster by edge clamping and run
    * the kernel — the single-node golden path for FocalSpec. */
  def wholeGrid(vals: Array[Double], gw: Int, gh: Int, mode: String,
                p: Params = Params()): Array[Double] = {
    val pw = gw + 2
    val padded = new Array[Double]((gw + 2) * (gh + 2))
    var y = -1
    while (y <= gh) {
      var x = -1
      while (x <= gw) {
        val sx = math.max(0, math.min(gw - 1, x))
        val sy = math.max(0, math.min(gh - 1, y))
        padded((y + 1) * pw + (x + 1)) = vals(sy * gw + sx)
        x += 1
      }
      y += 1
    }
    apply(padded, gw, gh, mode, p)
  }
}
