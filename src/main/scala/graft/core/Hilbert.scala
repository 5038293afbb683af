package graft.core

/** Hilbert space-filling curve over a 2^n × 2^n tile grid — the OTHER
  * interleaved cell-key family the north star names ("Hilbert/Z-order
  * interleaved cell keys") beside ZCell's Morton order. The Hilbert walk
  * visits grid-adjacent cells at every consecutive index (|Δx|+|Δy| = 1
  * always, vs Morton's 2^k-sized jumps at quadrant seams), so sorting
  * tiles by Hilbert key tightens Parquet/Iceberg row-group min-max
  * envelopes further than Z-order at the same zoom — the classic
  * locality upgrade for range-partitioned spatial scans.
  *
  * Algorithm: the standard rotate-and-flip bit walk (public: Hilbert
  * 1891; iterative form as in Warren, "Hacker's Delight" §16 / the
  * widely-published xy2d/d2xy pseudocode). Pure integer ops, MSB-first
  * over `order` levels — the SQL oracle replays the identical unrolled
  * chain (q253) with &, //, xor arithmetic.
  */
object Hilbert {
  final val MaxOrder = 31

  /** (x, y) → curve index d in [0, 4^order); x,y must be in [0, 2^order). */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    require(order >= 1 && order <= MaxOrder, s"order $order out of [1,$MaxOrder]")
    val side = 1L << order
    require(x0 >= 0 && x0 < side && y0 >= 0 && y0 < side,
      s"($x0,$y0) outside the 2^$order grid")
    var x = x0; var y = y0
    var d = 0L
    var s = side >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse: curve index d → (x, y). LSB-first rebuild (the published
    * d2xy companion loop). */
  def d2xy(order: Int, d0: Long): (Long, Long) = {
    require(order >= 1 && order <= MaxOrder, s"order $order out of [1,$MaxOrder]")
    val side = 1L << order
    require(d0 >= 0 && d0 < side * side, s"d $d0 outside 4^$order")
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    while (s < side) {
      val rx = (t / 2) & 1L
      val ry = (t ^ rx) & 1L
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
