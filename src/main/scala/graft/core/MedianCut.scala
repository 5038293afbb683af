package graft.core

/** Median-cut palette computation (reference: alg/gdalmediancut.cpp ::
  * GDALComputeMedianCutPCT): boxes over the (quantized) RGB histogram are
  * split at the weighted median of their longest axis until `size` boxes
  * exist; each box contributes its count-weighted mean color. The palette
  * is SORTED by packed (r,g,b) at the end, so the output is independent
  * of split order and partitioning — required for the oracle and for
  * idempotent resume.
  *
  * Like the reference, the algorithm runs on the HISTOGRAM (≤ 2^(3·qbits)
  * bins — 32 768 at the reference's 5 bits), never on the image: the
  * distributed side only aggregates the histogram and maps pixels.
  *
  * Divergence (documented): the reference follows with Floyd–Steinberg
  * error diffusion (alg/gdaldither.cpp), which is inherently a sequential
  * scanline recurrence; this engine assigns NEAREST palette color per
  * pixel (ties → smaller packed color), which is order-free and exact.
  */
object MedianCut {

  @inline private def rOf(p: Int): Int = (p >> 16) & 0xff
  @inline private def gOf(p: Int): Int = (p >> 8) & 0xff
  @inline private def bOf(p: Int): Int = p & 0xff

  /** hist: (packed rgb, count) pairs; returns ≤ size packed colors, sorted
    * ascending. If the histogram has ≤ size distinct colors the palette is
    * exactly those colors (identity case — pinned by q63's oracle). */
  def palette(hist: Array[(Int, Long)], size: Int): Array[Int] = {
    require(size > 0)
    val sorted0 = hist.sortBy(_._1)
    var boxes = List(sorted0)
    // split until `size` boxes or nothing splittable; deterministic pick:
    // largest longest-axis range, tie -> largest count, tie -> smallest
    // min color
    var done = false
    while (boxes.length < size && !done) {
      def axisRange(box: Array[(Int, Long)], c: Int): Int = {
        val ch: Int => Int = c match { case 0 => rOf; case 1 => gOf; case _ => bOf }
        var lo = 255; var hi = 0
        box.foreach { case (p, _) => val v = ch(p); if (v < lo) lo = v; if (v > hi) hi = v }
        hi - lo
      }
      val splittable = boxes.filter(_.length >= 2)
      if (splittable.isEmpty) done = true
      else {
        val pick = splittable.maxBy { box =>
          val rng = (0 to 2).map(axisRange(box, _)).max
          (rng, box.map(_._2).sum, -box.head._1)
        }
        val bestAxis = {
          val rs = (0 to 2).map(axisRange(pick, _))
          rs.indexOf(rs.max) // first max: r, then g, then b
        }
        val ch: Int => Int = bestAxis match { case 0 => rOf; case 1 => gOf; case _ => bOf }
        val ordered = pick.sortBy { case (p, _) => (ch(p), p) }
        val total = ordered.map(_._2).sum
        var acc = 0L; var cut = 0
        while (cut < ordered.length - 1 && acc + ordered(cut)._2 < (total + 1) / 2) {
          acc += ordered(cut)._2; cut += 1
        }
        if (cut == 0) cut = 1 // both halves non-empty
        val (a, b) = ordered.splitAt(cut)
        boxes = a :: b :: boxes.filterNot(_ eq pick)
      }
    }
    boxes.map { box =>
      val n = box.map(_._2).sum
      def mean(ch: Int => Int): Int = (box.map { case (p, c) => ch(p).toLong * c }.sum / n).toInt
      (mean(rOf) << 16) | (mean(gOf) << 8) | mean(bOf)
    }.distinct.sorted.toArray
  }

  /** Nearest palette index (squared RGB distance, ties → smaller index =
    * smaller packed color since the palette is sorted). */
  def nearestIdx(palette: Array[Int], r: Int, g: Int, b: Int): Int = {
    var best = 0; var bestD = Int.MaxValue
    var i = 0
    while (i < palette.length) {
      val p = palette(i)
      val dr = rOf(p) - r; val dg = gOf(p) - g; val db = bOf(p) - b
      val d = dr * dr + dg * dg + db * db
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }
}
