package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distance-to-target raster (reference: alg/gdalproximity.cpp ::
  * GDALComputeProximity) — SURVEY.md §3.8 R5.
  *
  * The reference does a two-pass chamfer scan over the whole raster, which
  * needs global sequential sweeps. The distributed re-expression exploits
  * the MAXDIST bound the reference also has: a pixel's nearest target
  * within maxDist can only live in tiles whose bounding box is within
  * maxDist, so
  *
  *   1. target pixels (mask hits) explode to every tile id within the
  *      maxDist reach — fan-out (2·ceil(maxDist/tileW)+1)², small for
  *      maxDist ≈ a few tiles;
  *   2. an equi-join on tile id co-locates each tile with its candidate
  *      targets (broadcast when the target set is small);
  *   3. per tile, one pass computes min squared distance per pixel.
  *
  * Distances are EXACT squared-integer pixel distances (dist2), so results
  * are bit-reproducible by a SQL oracle; callers take sqrt for the
  * reference's GEO/PIXEL distance output.
  */
object Proximity {

  final case class Target(gx: Long, gy: Long)

  /** @param tiles (tx, ty, pixels) single-zoom tile table (w×h pixels)
    * @param mask  pixel-value predicate defining target pixels
    * @param maxDistPx cap in pixel units
    * @return (gx, gy, dist2) for every pixel with a target within
    *         maxDistPx; targets themselves have dist2 = 0. */
  def proximity(tiles: DataFrame, w: Int, h: Int, nxTiles: Long, nyTiles: Long,
                mask: Double => Boolean, maxDistPx: Double): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val maxD2 = maxDistPx * maxDistPx
    // 1. targets exploded to reachable tile ids
    val targets = targetsWithinReach(tiles, w, h, nxTiles, nyTiles, mask, maxDistPx)
    // 2–3. co-locate tiles with candidate targets, min dist2 per pixel
    val keys = tiles.select(col("tx").cast("long").as("ttx"), col("ty").cast("long").as("tty"))
    keys.join(targets, Seq("ttx", "tty"))
      .as[(Long, Long, Long, Long)]
      .groupByKey { case (ttx, tty, _, _) => (ttx, tty) }
      .flatMapGroups { (key: (Long, Long), it: Iterator[(Long, Long, Long, Long)]) =>
        val (ttx, tty) = key
        val tgts = it.map { case (_, _, gx, gy) => (gx, gy) }.toArray
        val out = Array.newBuilder[(Long, Long, Long)]
        var py = 0
        while (py < h) {
          var px = 0
          while (px < w) {
            val gx = ttx * w + px; val gy = tty * h + py
            var best = Long.MaxValue
            var t = 0
            while (t < tgts.length) {
              val dx = gx - tgts(t)._1; val dy = gy - tgts(t)._2
              val d2 = dx * dx + dy * dy
              if (d2 < best) best = d2
              t += 1
            }
            if (best <= maxD2) out += ((gx, gy, best))
            px += 1
          }
          py += 1
        }
        out.result()
      }
      .toDF("gx", "gy", "dist2")
  }

  /** Target pixels exploded to every tile id within maxDistPx reach, with
    * the bbox prune — the shared step 1 of proximity/proximityBuffer. */
  private def targetsWithinReach(tiles: DataFrame, w: Int, h: Int,
                                 nxTiles: Long, nyTiles: Long,
                                 mask: Double => Boolean,
                                 maxDistPx: Double): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val maxD2 = maxDistPx * maxDistPx
    val reachX = math.ceil(maxDistPx / w).toInt
    val reachY = math.ceil(maxDistPx / h).toInt
    tiles.select(col("tx").cast("long"), col("ty").cast("long"), col("pixels"))
      .as[(Long, Long, Seq[Double])]
      .flatMap { case (tx, ty, px) =>
        val out = Array.newBuilder[(Long, Long, Long, Long)] // (ttx, tty, gx, gy)
        var i = 0
        while (i < px.length) {
          if (mask(px(i))) {
            val gx = tx * w + i % w; val gy = ty * h + i / w
            var dty = -reachY
            while (dty <= reachY) {
              var dtx = -reachX
              while (dtx <= reachX) {
                val ttx = tx + dtx; val tty = ty + dty
                if (ttx >= 0 && ttx < nxTiles && tty >= 0 && tty < nyTiles) {
                  // prune: tile bbox must be within maxD of the target
                  val bx0 = ttx * w; val bx1 = ttx * w + w - 1
                  val by0 = tty * h; val by1 = tty * h + h - 1
                  val ddx = if (gx < bx0) bx0 - gx else if (gx > bx1) gx - bx1 else 0L
                  val ddy = if (gy < by0) by0 - gy else if (gy > by1) gy - by1 else 0L
                  if (ddx * ddx + ddy * ddy <= maxD2) out += ((ttx, tty, gx, gy))
                }
                dtx += 1
              }
              dty += 1
            }
          }
          i += 1
        }
        out.result()
      }.toDF("ttx", "tty", "gx", "gy")
  }

  /** gdal_proximity's -fixed-buf-val / -nodata / -values surface
    * (reference: swig/python/scripts/gdal_proximity.py options feeding
    * alg/gdalproximity.cpp :: GDALComputeProximity, the bFixedBufVal
    * branch): pixels within maxDistPx of a target (target set = `mask`,
    * the -values list) write `bufVal`, all others `nodata`, over the FULL
    * raster — the utility always writes every destination pixel. Same
    * bounded-reach target explode as proximity; the tile join is LEFT so
    * target-free tiles still emit their all-nodata pixels without any
    * pixel data ever shuffling (only target coords move). */
  def proximityBuffer(tiles: DataFrame, w: Int, h: Int, nxTiles: Long, nyTiles: Long,
                      mask: Double => Boolean, maxDistPx: Double,
                      bufVal: Double, nodata: Double): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val maxD2 = maxDistPx * maxDistPx
    val targets = targetsWithinReach(tiles, w, h, nxTiles, nyTiles, mask, maxDistPx)
    val keys = tiles.select(col("tx").cast("long").as("ttx"), col("ty").cast("long").as("tty"))
    keys.join(targets, Seq("ttx", "tty"), "left_outer")
      .select(col("ttx"), col("tty"),
        coalesce(col("gx"), lit(Long.MinValue)).as("gx"),
        coalesce(col("gy"), lit(Long.MinValue)).as("gy"))
      .as[(Long, Long, Long, Long)]
      .groupByKey { case (ttx, tty, _, _) => (ttx, tty) }
      .flatMapGroups { (key: (Long, Long), it: Iterator[(Long, Long, Long, Long)]) =>
        val (ttx, tty) = key
        val tgts = it.collect { case (_, _, gx, gy) if gx != Long.MinValue => (gx, gy) }.toArray
        val out = new Array[(Long, Long, Double)](w * h)
        var py = 0; var k = 0
        while (py < h) {
          var px = 0
          while (px < w) {
            val gx = ttx * w + px; val gy = tty * h + py
            var within = false
            var t = 0
            while (t < tgts.length && !within) {
              val dx = gx - tgts(t)._1; val dy = gy - tgts(t)._2
              if (dx * dx + dy * dy <= maxD2) within = true
              t += 1
            }
            out(k) = (gx, gy, if (within) bufVal else nodata)
            k += 1; px += 1
          }
          py += 1
        }
        out.iterator
      }
      .toDF("gx", "gy", "val")
  }
}
