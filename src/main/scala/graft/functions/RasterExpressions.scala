package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.core.{GeomIO, MedianCut, Resample, Scanline, TileMath, ZCell}

/** Raster-side expressions: scanline burn runs, warp source-window
  * computation, and the per-tile warp kernel. */

/** raster_runs(geom_wkb, cell) → array<struct<py:int, xs:int, xe:int>>:
  * the pixel runs of the geometry burned into the 64×64 grid of the given
  * geodetic cell — the reference's scanline parity fill emitted as data
  * (reference: alg/llrasterize.cpp :: GDALdllImageFilledPolygon via
  * alg/gdalrasterize.cpp :: gv_rasterize_one_shape). Array-returning
  * expression + explode ≡ a Generator with less Catalyst surface
  * (SURVEY.md §3.10). */
case class RasterRuns(left: Expression, right: Expression, tileW: Int, tileH: Int,
                      allTouched: Boolean = false)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("py", IntegerType, nullable = false),
      StructField("xs", IntegerType, nullable = false),
      StructField("xe", IntegerType, nullable = false))), containsNull = false)
  override def nullSafeEval(g0: Any, c0: Any): Any = {
    val g = GeomIO.fromWkb(g0.asInstanceOf[Array[Byte]])
    val cell = c0.asInstanceOf[Long]
    val z = ZCell.zoom(cell)
    val (w, s, e, n) = TileMath.geoTileBounds(z, ZCell.tx(cell), ZCell.ty(cell))
    val pw = (e - w) / tileW; val ph = (n - s) / tileH
    val runs = Scanline.burnRuns(g, w, n, pw, ph, tileW, tileH, allTouched)
    new GenericArrayData(runs.map { case (py, xs, xe) =>
      InternalRow(py, xs, xe)
    }.toArray[Any])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r, tileW, tileH, allTouched)
  override def prettyName: String = "raster_runs"
}

/** warp_src_cells(dst_cell_merc, src_zoom) → array<long>: the geodetic
  * source cells a mercator destination tile needs, one source pixel of
  * halo included — the reference's source-window computation
  * (reference: alg/gdalwarpoperation.cpp ::
  * GDALWarpOperation::ComputeSourceWindow). */
case class WarpSrcCells(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(d0: Any, sz0: Any): Any = {
    val dst = d0.asInstanceOf[Long]
    val srcZoom = sz0.asInstanceOf[Int]
    val (w, s, e, n) = TileMath.mercTileBoundsDeg(ZCell.zoom(dst), ZCell.tx(dst), ZCell.ty(dst))
    val halo = 180.0 / (1L << srcZoom).toDouble / 64.0 * 3.5 // covers lanczos's 6×6 taps
    val cells = TileMath.geoCellsForEnvelope(
      math.max(-180.0, w - halo), math.max(-90.0, s - halo),
      math.min(180.0, e + halo), math.min(90.0, n + halo), srcZoom)
    new GenericArrayData(cells)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "warp_src_cells"
}

/** warp_dst_cells(src_cell_geo, dst_zoom) → array<long>: the mercator
  * destination tiles whose source window could include this geodetic
  * source cell — the FORWARD direction of warp_src_cells, used to derive
  * the dst-tile universe from actual source coverage instead of
  * enumerating every tile on Earth (4^20 rows at z20). Guaranteed a
  * superset of {d : src ∈ warp_src_cells(d)} (the halo here matches the
  * source-window halo, padded one dst pixel); the inner join against real
  * source tiles then drops the spares, so the output tile set is
  * IDENTICAL to the full-enumeration plan's. */
case class WarpDstCells(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s0: Any, dz0: Any): Any = {
    val src = s0.asInstanceOf[Long]
    val dstZoom = dz0.asInstanceOf[Int]
    val srcZoom = ZCell.zoom(src)
    val (w, s, e, n) = TileMath.geoTileBounds(srcZoom, ZCell.tx(src), ZCell.ty(src))
    // mirror warp_src_cells' halo (3.5 src px) + one dst px of slack
    val halo = 180.0 / (1L << srcZoom).toDouble / 64.0 * 3.5
    val nDst = 1L << dstZoom
    val dstPxDeg = 360.0 / (nDst * 64).toDouble
    val w2 = w - halo - dstPxDeg; val e2 = e + halo + dstPxDeg
    val n2 = math.min(TileMath.WebMercatorMaxLat, n + halo + dstPxDeg)
    val s2 = math.max(-TileMath.WebMercatorMaxLat, s - halo - dstPxDeg)
    if (s2 >= TileMath.WebMercatorMaxLat || n2 <= -TileMath.WebMercatorMaxLat)
      return new GenericArrayData(Array.emptyLongArray) // fully polar cell
    val tx0 = math.max(0L, TileMath.mercTileX(math.max(-180.0, w2), dstZoom))
    val tx1 = math.min(nDst - 1, TileMath.mercTileX(math.min(180.0, e2), dstZoom)) max tx0
    val ty0 = math.max(0L, TileMath.mercTileY(n2, dstZoom))
    val ty1 = math.min(nDst - 1, TileMath.mercTileY(s2, dstZoom)) max ty0
    new GenericArrayData(ZCell.range(dstZoom, tx0, ty0, tx1, ty1))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "warp_dst_cells"
}

/** warp_tile(dst_cell_merc, src_zoom, srcs: array<struct<cell:long,
  * pixels:array<double>>>, method) → array<double> 64×64 dst pixels.
  * Inverse-projects each dst pixel center to lon/lat, samples the geodetic
  * source mosaic with the shared Resample kernel (reference:
  * alg/gdalwarpkernel.cpp :: GWKBilinearNoMasksT / GWKNearestNoMasksByte;
  * chunk orchestration alg/gdalwarpoperation.cpp :: WarpRegion). */
case class WarpTile(first: Expression, second: Expression, third: Expression,
                    fourth: Expression)
    extends QuaternaryExpression with CodegenFallback {
  final val TW = 64; final val TH = 64
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(d0: Any, sz0: Any, srcs0: Any, m0: Any): Any = {
    val dst = d0.asInstanceOf[Long]
    val srcZoom = sz0.asInstanceOf[Int]
    val method = m0.toString
    val srcArr = srcs0.asInstanceOf[ArrayData]
    // global geodetic pixel grid at srcZoom: (2^(z+1)*64) × (2^z*64) px
    val tiles = new java.util.HashMap[Long, Array[Double]]()
    var i = 0
    while (i < srcArr.numElements()) {
      val row = srcArr.getStruct(i, 2)
      tiles.put(row.getLong(0), row.getArray(1).toDoubleArray())
      i += 1
    }
    val srcFn: (Int, Int) => Double = (gx, gy) => {
      val nx = (1L << (srcZoom + 1)) * TW; val ny = (1L << srcZoom) * TH
      if (gx < 0 || gy < 0 || gx >= nx || gy >= ny) Double.NaN
      else {
        val key = ZCell.pack(srcZoom, gx.toLong / TW, gy.toLong / TH)
        val px = tiles.get(key)
        if (px == null) Double.NaN else px((gy % TH) * TW + (gx % TW))
      }
    }
    val (z, tx, ty) = ZCell.unpack(dst)
    val (xm0, ym0, xm1, ym1) = TileMath.mercTileBoundsMeters(z, tx, ty)
    val dxm = (xm1 - xm0) / TW; val dym = (ym1 - ym0) / TH
    val srcResX = 360.0 / ((1L << (srcZoom + 1)) * TW).toDouble
    val srcResY = 180.0 / ((1L << srcZoom) * TH).toDouble
    val out = new Array[Double](TW * TH)
    var py = 0
    while (py < TH) {
      val ym = ym1 - (py + 0.5) * dym // top row first
      val lat = TileMath.mercYToLat(ym)
      val gy = (90.0 - lat) / srcResY // fractional src pixel row
      // box kernels (average/mode) need the dst pixel's EDGE rows too
      val latN = TileMath.mercYToLat(ym1 - py * dym)
      val latS = TileMath.mercYToLat(ym1 - (py + 1) * dym)
      val gyN = (90.0 - latN) / srcResY
      val gyS = (90.0 - latS) / srcResY
      var px = 0
      while (px < TW) {
        val xm = xm0 + (px + 0.5) * dxm
        val lon = TileMath.mercXToLon(xm)
        val gx = (lon + 180.0) / srcResX
        val v = method match {
          case "near"        => Resample.nearest(srcFn, gx, gy)
          case "cubic"       => Resample.cubic(srcFn, gx, gy)
          case "cubicspline" => Resample.cubicSpline(srcFn, gx, gy)
          case "lanczos"     => Resample.lanczos(srcFn, gx, gy)
          case "average" | "mode" =>
            val gxW = (TileMath.mercXToLon(xm0 + px * dxm) + 180.0) / srcResX
            val gxE = (TileMath.mercXToLon(xm0 + (px + 1) * dxm) + 180.0) / srcResX
            if (method == "average") Resample.boxAverage(srcFn, gxW, gyN, gxE, gyS)
            else Resample.boxMode(srcFn, gxW, gyN, gxE, gyS)
          case _       => Resample.bilinear(srcFn, gx, gy)
        }
        out(py * TW + px) = if (v.isNaN) 0.0 else v
        px += 1
      }
      py += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression = copy(a, b, c, d)
  override def prettyName: String = "warp_tile"
}

/** palette_map(r, g, b, palette) → array<double> of palette indices:
  * nearest-color assignment per pixel against a plan-time-literal sorted
  * palette of packed RGB ints (reference: alg/gdaldither.cpp assigns via
  * error diffusion — sequential; nearest assignment is the order-free
  * re-expression, documented in core.MedianCut). */
case class PaletteMap(first: Expression, second: Expression, third: Expression,
                      palette: Array[Int])
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(r0: Any, g0: Any, b0: Any): Any = {
    val r = r0.asInstanceOf[ArrayData].toDoubleArray()
    val g = g0.asInstanceOf[ArrayData].toDoubleArray()
    val b = b0.asInstanceOf[ArrayData].toDoubleArray()
    val out = new Array[Double](r.length)
    var i = 0
    while (i < r.length) {
      out(i) = MedianCut.nearestIdx(palette, r(i).toInt, g(i).toInt, b(i).toInt).toDouble
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(a, b, c, palette)
  override def prettyName: String = "palette_map"
}

/** dither_fs(pixels, w, h) → array<double>: per-tile Floyd–Steinberg
  * 1-bit dither (core/Dither.scala; reference alg/gdaldither.cpp — the
  * global serpentine recurrence re-expressed as independent per-tile
  * recurrences, a documented boundary-reset divergence). All-integer
  * TRUNCATING division error flow (Java `/` == DuckDB `//`, both round
  * toward zero — NOT floorDiv, which differs on the negative errors this
  * kernel produces), so the DuckDB list_reduce oracle replicates it
  * bit-for-bit. */
case class DitherFs(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(p0: Any, w0: Any, h0: Any): Any = {
    val px = p0.asInstanceOf[ArrayData].toDoubleArray()
    val w = w0.asInstanceOf[Int]; val h = h0.asInstanceOf[Int]
    val out = graft.core.Dither.fsDither(px.map(_.toInt), w, h)
    new GenericArrayData(out.map(_.toDouble))
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(a, b, c)
  override def prettyName: String = "dither_fs"
}
