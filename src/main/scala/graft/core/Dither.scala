package graft.core

/** Floyd–Steinberg error-diffusion dither to 1-bit (0/255), PER TILE
  * (reference: alg/gdaldither.cpp :: GDALDitherRGB2PCT — its serpentine
  * global recurrence is inherently serial across the whole raster, which
  * is why round-2 documented it as a non-goal; the distributed
  * re-expression dithers each tile independently with the error buffer
  * reset at tile boundaries — embarrassingly parallel, deterministic,
  * and a DOCUMENTED divergence from the reference's global error flow,
  * visible only as a phase shift along tile seams).
  *
  * All-integer arithmetic with TRUNCATING division (Java `/`, which is
  * exactly DuckDB's integer `//` — both round toward zero) so a SQL
  * oracle replicates it bit-for-bit: weights 7/16 right, 3/16 down-left, 5/16 down, and the
  * REMAINDER (not 1/16) down-right, so the diffused error sums exactly to
  * the quantization error. Errors leaving the right/bottom tile edge are
  * dropped (the boundary-reset divergence).
  */
object Dither {
  def fsDither(px: Array[Int], w: Int, h: Int): Array[Int] = {
    require(px.length == w * h, s"pixel count ${px.length} != ${w}x$h")
    val out = new Array[Int](w * h)
    val rowErr = new Array[Int](w)   // incoming error from the row above
    val nextErr = new Array[Int](w)  // accumulating for the row below
    var right = 0                    // error carried to the next pixel
    var i = 0
    while (i < px.length) {
      val x = i % w
      val vp = px(i) + right + rowErr(x)
      val o = if (vp >= 128) 255 else 0
      out(i) = o
      val e = vp - o
      val r = 7 * e / 16
      val dl = 3 * e / 16
      val dn = 5 * e / 16
      val dr = e - r - dl - dn
      if (x > 0) nextErr(x - 1) += dl
      nextErr(x) += dn
      if (x < w - 1) { nextErr(x + 1) += dr; right = r }
      else {
        // row end: discard the right carry, roll the buffers
        right = 0
        var k = 0
        while (k < w) { rowErr(k) = nextErr(k); nextErr(k) = 0; k += 1 }
      }
      i += 1
    }
    out
  }
}
