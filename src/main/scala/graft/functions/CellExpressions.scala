package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import graft.core.{GeomIO, TileMath, ZCell}

/** Cell-index expressions: the engine-native hierarchical cell key
  * (Z-order quadtree, SURVEY.md §2.4) re-expressing the reference's tile
  * math and quadkeys (reference: swig/python/scripts/gdal2tiles.py ::
  * GlobalGeodetic/GlobalMercator.{LatLonToTile,TileBounds,QuadTree};
  * port/cpl_quad_tree.cpp :: CPLQuadTree for the generic quadtree role).
  */

/** cell_encode(lon, lat, zoom) — packed geodetic cell id. Inputs must be
  * (double, double, int); SQL text callers cast explicitly (a DECIMAL
  * literal like 0.0 needs CAST — AbstractDataType/implicit coercion is
  * private[sql] in Spark 4). */
case class CellEncode(first: Expression, second: Expression, third: Expression,
                      mercator: Boolean = false)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(lon0: Any, lat0: Any, z0: Any): Any = {
    val lon = lon0.asInstanceOf[Double]; val lat = lat0.asInstanceOf[Double]
    val z = z0.asInstanceOf[Int]
    if (mercator) TileMath.mercCell(lon, lat, z) else TileMath.geoCell(lon, lat, z)
  }
  // hot-path expressions stay inside whole-stage codegen via a static call
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val fn = if (mercator) "mercCell" else "geoCell"
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.core.TileMath.$fn($a, $b, $c)")
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(a, b, c, mercator)
  override def prettyName: String = if (mercator) "cell_encode_merc" else "cell_encode"
}

/** cell_zoom / cell_tx / cell_ty accessors. */
case class CellPart(child: Expression, part: String)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val c = v.asInstanceOf[Long]
    part match {
      case "zoom" => ZCell.zoom(c).toLong
      case "tx"   => ZCell.tx(c)
      case "ty"   => ZCell.ty(c)
      case "parent" => ZCell.parent(c)
    }
  }
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => part match {
      case "zoom" => s"(long) graft.core.ZCell.zoom($c)"
      case p      => s"graft.core.ZCell.$p($c)"
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(c, part)
  override def prettyName: String = s"cell_$part"
}

/** cell_pack(zoom, tx, ty) — build a packed cell id from parts. */
case class CellPack(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(z: Any, tx: Any, ty: Any): Any =
    ZCell.pack(z.asInstanceOf[Int], tx.asInstanceOf[Long], ty.asInstanceOf[Long])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (z, tx, ty) => s"graft.core.ZCell.pack($z, $tx, $ty)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(a, b, c)
  override def prettyName: String = "cell_pack"
}

/** cell_bounds(cell) → array(west, south, east, north) in degrees. */
case class CellBounds(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val c = v.asInstanceOf[Long]
    val (w, s, e, n) = TileMath.geoTileBounds(ZCell.zoom(c), ZCell.tx(c), ZCell.ty(c))
    new GenericArrayData(Array(w, s, e, n))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "cell_bounds"
}

/** cell_ring(cell, r) → array<long>: Chebyshev shell at distance r. */
case class CellRing(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(c0: Any, r0: Any): Any = {
    val cells = ZCell.ring(c0.asInstanceOf[Long], r0.asInstanceOf[Int], colsShift = 1)
    new GenericArrayData(cells)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "cell_ring"
}

/** cell_disk(cell, r) → all cells with Chebyshev distance <= r. */
case class CellDisk(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(c0: Any, r0: Any): Any = {
    val c = c0.asInstanceOf[Long]; val r = r0.asInstanceOf[Int]
    val out = Array.newBuilder[Long]
    var i = 0
    while (i <= r) { out ++= ZCell.ring(c, i, colsShift = 1); i += 1 }
    new GenericArrayData(out.result().distinct)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "cell_disk"
}

/** cells_cover(geom_wkb, zoom) → array<long>: geodetic cells intersecting
  * the geometry. Envelope cells first, then an exact prepared-geometry
  * intersects refine per cell — the same two-phase filter-and-refine the
  * reference's spatial filter does (reference:
  * ogr/ogrsf_frmts/generic/ogrlayer.cpp :: OGRLayer::FilterGeometry).
  *
  * maxCells > 0 caps the per-row array: if the envelope needs more than
  * maxCells cells at the requested zoom, the cover COARSENS (zoom-1,
  * zoom-2, …) until it fits: a continental polygon at deep zoom yields a
  * bounded array of coarser cells instead of a task-OOM-sized one. The
  * default (65536 ≈ 512 KB of longs) never fires below zoom 8 even for a
  * whole-world geometry, so shallow-zoom joins keep single-zoom plans. Cell
  * ids carry their zoom, and join consumers fan the opposing side out to
  * every zoom actually present (see SpatialJoin), so pruning stays
  * complete; the exact JTS refine unchanged. maxCells <= 0 disables the
  * cap (rasterize needs the exact requested zoom). */
case class CellsCover(left: Expression, right: Expression, maxCells: Int = 65536,
                      mercator: Boolean = false)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(g0: Any, z0: Any): Any = {
    val wkb = g0.asInstanceOf[Array[Byte]]
    val zoomReq = z0.asInstanceOf[Int]
    val g = GeomIO.fromWkb(wkb)
    val env = g.getEnvelopeInternal
    // pick the zoom FIRST via the arithmetic tile-range count (a hemisphere
    // at z15 is ~5·10^8 cells — materializing it before coarsening would
    // itself be the OOM the cap exists to prevent), then materialize once
    def count(z: Int): Long =
      if (mercator) TileMath.mercCellCountForEnvelope(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, z)
      else TileMath.geoCellCountForEnvelope(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, z)
    var zoom = zoomReq
    if (maxCells > 0) {
      while (zoom > 0 && count(zoom) > maxCells) zoom -= 1
    }
    val cand =
      if (mercator) TileMath.mercCellsForEnvelope(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, zoom)
      else TileMath.geoCellsForEnvelope(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, zoom)
    val out =
      if (cand.length <= 4) cand // tiny covers: envelope filter is enough
      else {
        val prep = GeomIO.prepared(wkb)
        cand.filter { c =>
          val (w, s, e, n) =
            if (mercator) TileMath.mercTileBoundsDeg(zoom, ZCell.tx(c), ZCell.ty(c))
            else TileMath.geoTileBounds(zoom, ZCell.tx(c), ZCell.ty(c))
          prep.intersects(GeomIO.box(w, s, e, n))
        }
      }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r, maxCells, mercator)
  override def prettyName: String = if (mercator) "cells_cover_merc" else "cells_cover"
}

/** cell_at_zoom(cell, z) → the cell's ancestor at zoom z (identity when
  * z >= the cell's zoom). The consumer-side half of the cells_cover cap:
  * a point's fine cell re-keys to whatever coarser zoom a capped cover
  * emitted. */
case class CellAtZoom(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(c0: Any, z0: Any): Any =
    ZCell.ancestorAt(c0.asInstanceOf[Long], z0.asInstanceOf[Int])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (c, z) => s"graft.core.ZCell.ancestorAt($c, $z)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "cell_at_zoom"
}

/** hilbert_d(x, y, order) → the Hilbert curve index of tile (x, y) on the
  * 2^order grid (core/Hilbert.xy2d) — the locality-tightest of the north
  * star's "Hilbert/Z-order interleaved cell keys". Stays inside
  * whole-stage codegen via a static call like its Z-order siblings. */
case class HilbertD(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(x0: Any, y0: Any, o0: Any): Any =
    graft.core.Hilbert.xy2d(o0.asInstanceOf[Int], x0.asInstanceOf[Long], y0.asInstanceOf[Long])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (x, y, o) => s"graft.core.Hilbert.xy2d($o, $x, $y)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(a, b, c)
  override def prettyName: String = "hilbert_d"
}
