package graft.core

/** Resampling kernels shared by the warp operator and its scalar oracle
  * (reference: alg/gdalwarpkernel.cpp :: GWKNearestNoMasksByte /
  * GWKBilinearNoMasksT; overview reduction in gcore/overview.cpp ::
  * GDALDownsampleChunk32R_*).
  *
  * `src` is a sampling function over fractional source pixel coordinates
  * with out-of-range access returning NaN (treated as nodata).
  */
object Resample {

  /** Nearest neighbor at fractional source coords (sx, sy). */
  def nearest(src: (Int, Int) => Double, sx: Double, sy: Double): Double =
    src(math.floor(sx).toInt, math.floor(sy).toInt)

  /** Bilinear on the 2×2 neighborhood around (sx, sy); pixel centers at
    * integer+0.5 — matches the reference kernel's center convention. */
  def bilinear(src: (Int, Int) => Double, sx: Double, sy: Double): Double = {
    val fx = sx - 0.5; val fy = sy - 0.5
    val x0 = math.floor(fx).toInt; val y0 = math.floor(fy).toInt
    val wx = fx - x0; val wy = fy - y0
    val v00 = src(x0, y0); val v10 = src(x0 + 1, y0)
    val v01 = src(x0, y0 + 1); val v11 = src(x0 + 1, y0 + 1)
    if (v00.isNaN || v10.isNaN || v01.isNaN || v11.isNaN) {
      // fall back to nearest of the valid corners (reference folds masks;
      // our tiles are dense so this path only triggers at raster edges)
      val n = nearest(src, sx, sy)
      if (!n.isNaN) n
      else {
        val cands = Array(v00, v10, v01, v11).filterNot(_.isNaN)
        if (cands.isEmpty) Double.NaN else cands(0)
      }
    } else {
      val top = v00 * (1 - wx) + v10 * wx
      val bot = v01 * (1 - wx) + v11 * wx
      top * (1 - wy) + bot * wy
    }
  }

  /** Cubic convolution on the 4×4 neighborhood (Keys 1981, a = -0.5 — the
    * reference's CUBIC kernel coefficients: alg/gdalwarpkernel.cpp ::
    * CubicConvolution). Falls back to bilinear when any tap is nodata. */
  def cubic(src: (Int, Int) => Double, sx: Double, sy: Double): Double = {
    val fx = sx - 0.5; val fy = sy - 0.5
    val x0 = math.floor(fx).toInt; val y0 = math.floor(fy).toInt
    val dx = fx - x0; val dy = fy - y0
    def w(t: Double): Double = {
      val a = -0.5
      val at = math.abs(t)
      if (at <= 1.0) (a + 2.0) * at * at * at - (a + 3.0) * at * at + 1.0
      else if (at < 2.0) a * at * at * at - 5.0 * a * at * at + 8.0 * a * at - 4.0 * a
      else 0.0
    }
    var sum = 0.0
    var j = -1
    while (j <= 2) {
      var rowSum = 0.0
      var i = -1
      while (i <= 2) {
        val v = src(x0 + i, y0 + j)
        if (v.isNaN) return bilinear(src, sx, sy)
        rowSum += v * w(dx - i)
        i += 1
      }
      sum += rowSum * w(dy - j)
      j += 1
    }
    sum
  }

  /** Cubic B-spline on the 4×4 neighborhood (reference GRA_CubicSpline:
    * alg/gdalwarpkernel.cpp :: BSpline weights) — a SMOOTHING kernel (does
    * not interpolate the samples exactly, by design). Falls back to
    * bilinear when any tap is nodata. */
  def cubicSpline(src: (Int, Int) => Double, sx: Double, sy: Double): Double = {
    val fx = sx - 0.5; val fy = sy - 0.5
    val x0 = math.floor(fx).toInt; val y0 = math.floor(fy).toInt
    val dx = fx - x0; val dy = fy - y0
    def w(t: Double): Double = {
      val at = math.abs(t)
      if (at < 1.0) (4.0 - 6.0 * at * at + 3.0 * at * at * at) / 6.0
      else if (at < 2.0) { val u = 2.0 - at; u * u * u / 6.0 }
      else 0.0
    }
    var sum = 0.0
    var j = -1
    while (j <= 2) {
      var rowSum = 0.0
      var i = -1
      while (i <= 2) {
        val v = src(x0 + i, y0 + j)
        if (v.isNaN) return bilinear(src, sx, sy)
        rowSum += v * w(dx - i)
        i += 1
      }
      sum += rowSum * w(dy - j)
      j += 1
    }
    sum
  }

  /** Lanczos windowed sinc, a = 3, on the 6×6 neighborhood (reference
    * GRA_Lanczos: alg/gdalwarpkernel.cpp :: GWKLanczosSinc). The truncated
    * window's weights do not sum to 1, so the result is normalized by the
    * weight sum exactly as the reference does. Falls back to bilinear when
    * any tap is nodata. */
  def lanczos(src: (Int, Int) => Double, sx: Double, sy: Double): Double = {
    val fx = sx - 0.5; val fy = sy - 0.5
    val x0 = math.floor(fx).toInt; val y0 = math.floor(fy).toInt
    val dx = fx - x0; val dy = fy - y0
    def w(t: Double): Double = {
      if (t == 0.0) 1.0
      else if (t <= -3.0 || t >= 3.0) 0.0
      else {
        val pt = math.Pi * t
        3.0 * math.sin(pt) * math.sin(pt / 3.0) / (pt * pt)
      }
    }
    var sum = 0.0; var wsum = 0.0
    var j = -2
    while (j <= 3) {
      val wy = w(dy - j)
      if (wy != 0.0) {
        var i = -2
        while (i <= 3) {
          val wx = w(dx - i)
          if (wx != 0.0) {
            val v = src(x0 + i, y0 + j)
            if (v.isNaN) return bilinear(src, sx, sy)
            sum += v * wx * wy; wsum += wx * wy
          }
          i += 1
        }
      }
      j += 1
    }
    if (wsum == 0.0) Double.NaN else sum / wsum
  }

  /** 2×2 average reduction of a w×h tile (w,h even) — the AVERAGE overview
    * kernel. Order-fixed summation for bit determinism. */
  def downsample2x2Avg(pixels: Array[Double], w: Int, h: Int): Array[Double] = {
    val ow = w / 2; val oh = h / 2
    val out = new Array[Double](ow * oh)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val i = (2 * y) * w + 2 * x
        out(y * ow + x) = (pixels(i) + pixels(i + 1) + pixels(i + w) + pixels(i + w + 1)) / 4.0
        x += 1
      }
      y += 1
    }
    out
  }

  /** RMS reduction (reference: gcore/overview.cpp, the "RMS" resampling
    * of GDALRegenerateOverviews, GDAL 3.3): parent = sqrt of the mean of
    * squares of its 2×2 block. For integer-valued pixels the sum of
    * squares is an exact integer, /4.0 is exact (dyadic), and IEEE sqrt
    * is correctly rounded — so the double is bit-identical to any other
    * engine evaluating the same expression (SQL-oracle replayable). */
  def downsample2x2Rms(pixels: Array[Double], w: Int, h: Int): Array[Double] = {
    val ow = w / 2; val oh = h / 2
    val out = new Array[Double](ow * oh)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val i = (2 * y) * w + 2 * x
        val a = pixels(i); val b = pixels(i + 1); val c = pixels(i + w); val d = pixels(i + w + 1)
        out(y * ow + x) = math.sqrt((a * a + b * b + c * c + d * d) / 4.0)
        x += 1
      }
      y += 1
    }
    out
  }

  /** MODE reduction: most frequent value of each 2×2 block, ties broken by
    * smallest value (deterministic; the reference's GDALDownsampleChunk32R
    * mode kernel keeps the first-seen max count — ours pins smallest for
    * partitioning independence, documented divergence). */
  def downsample2x2Mode(pixels: Array[Double], w: Int, h: Int): Array[Double] = {
    val ow = w / 2; val oh = h / 2
    val out = new Array[Double](ow * oh)
    val v = new Array[Double](4)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val i = (2 * y) * w + 2 * x
        v(0) = pixels(i); v(1) = pixels(i + 1); v(2) = pixels(i + w); v(3) = pixels(i + w + 1)
        java.util.Arrays.sort(v)
        // after sort: best = value with max run length; ties → smallest (first)
        var best = v(0); var bestN = 1; var cur = v(0); var curN = 1
        var j = 1
        while (j < 4) {
          if (v(j) == cur) curN += 1 else { cur = v(j); curN = 1 }
          if (curN > bestN) { best = cur; bestN = curN }
          j += 1
        }
        out(y * ow + x) = best
        x += 1
      }
      y += 1
    }
    out
  }

  /** AVERAGE over all source pixels whose CENTER lies in the fractional
    * source-pixel box [gx0, gx1) × [gy0, gy1) — the reference's `-r
    * average` box filter (reference: alg/gdalwarpkernel.cpp ::
    * GWKAverageOrModeThread, GRA_Average branch). NaN sources skipped;
    * NaN if the box holds no valid pixel. */
  def boxAverage(src: (Int, Int) => Double,
                 gx0: Double, gy0: Double, gx1: Double, gy1: Double): Double = {
    var sum = 0.0; var n = 0L
    var gy = math.ceil(gy0 - 0.5).toInt
    while (gy + 0.5 < gy1) {
      var gx = math.ceil(gx0 - 0.5).toInt
      while (gx + 0.5 < gx1) {
        val v = src(gx, gy)
        if (!v.isNaN) { sum += v; n += 1 }
        gx += 1
      }
      gy += 1
    }
    if (n == 0) Double.NaN else sum / n
  }

  /** MODE over the same box: most frequent value, ties → smallest value
    * (deterministic; the reference keeps the first max encountered, which
    * is scan-order-dependent — documented divergence, pinned by tests). */
  def boxMode(src: (Int, Int) => Double,
              gx0: Double, gy0: Double, gx1: Double, gy1: Double): Double = {
    val counts = new java.util.TreeMap[Double, Int]()
    var gy = math.ceil(gy0 - 0.5).toInt
    while (gy + 0.5 < gy1) {
      var gx = math.ceil(gx0 - 0.5).toInt
      while (gx + 0.5 < gx1) {
        val v = src(gx, gy)
        if (!v.isNaN) counts.merge(v, 1, (a, b) => a + b)
        gx += 1
      }
      gy += 1
    }
    if (counts.isEmpty) Double.NaN
    else {
      var best = Double.NaN; var bestN = 0
      val it = counts.entrySet().iterator() // ascending value order
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > bestN) { best = e.getKey; bestN = e.getValue }
      }
      best
    }
  }

  /** NEAREST reduction: top-left pixel of each 2×2 block. */
  def downsample2x2Near(pixels: Array[Double], w: Int, h: Int): Array[Double] = {
    val ow = w / 2; val oh = h / 2
    val out = new Array[Double](ow * oh)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) { out(y * ow + x) = pixels((2 * y) * w + 2 * x); x += 1 }
      y += 1
    }
    out
  }
}
