package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.F

/** Distributed spatial join — the engine's centerpiece (SURVEY.md §3.3 J2/J3).
  *
  * Re-expresses the reference's layer-algebra joins (reference:
  * ogr/ogrsf_frmts/generic/ogrlayer.cpp :: OGRLayer::Intersection / Clip /
  * SetSpatialFilter + FilterGeometry), which are per-feature nested loops
  * with a bbox prefilter, as a two-phase cell-equi-join:
  *
  *   1. PRUNE:  polygons explode to the Z-order cells they intersect
  *              (cells_cover); points map to exactly one cell (cell_encode).
  *              The join on `cell` is an ordinary Catalyst equi-join, so
  *              Spark picks broadcast-hash vs shuffled-hash/SMJ and AQE
  *              re-plans at runtime.
  *   2. REFINE: exact JTS predicate (st_contains / st_intersects) on the
  *              candidates; the polygon side goes through the prepared-
  *              geometry cache, matching the reference's prepared filter.
  *
  * Scale levers (100-TB design):
  *   - broadcast: polygon side is usually the small dimension → map-side
  *     join, zero shuffle of the big point table.
  *   - shuffle + salting: when both sides are big, hot cells (skewed by
  *     cells_cover fan-out or point clustering) are salted — points get a
  *     deterministic salt in [0, s), polygons replicate ×s — bounding any
  *     single task's share of a hot cell at 1/s. AQE skew-join splits the
  *     residual.
  *   - a point maps to exactly ONE cell, so point-in-polygon emits no
  *     duplicate pairs; geometry×geometry joins dedup on the id pair
  *     before the (expensive) refine.
  */
object SpatialJoin {

  /** Point-in-polygon join.
    * @param polys  (idCol, geomCol: WKB) polygon side
    * @param points point side with lon/lat double columns
    * @param zoom   geodetic cell zoom for the prune phase
    * @param broadcastPolys map-side join (polygon side must fit in memory)
    * @param saltFactor >1 enables salting on the shuffle path
    * @param predicate "contains" (boundary excluded) or "covers"/"intersects"
    */
  def pointInPolygon(polys: DataFrame, polyGeom: String,
                     points: DataFrame, lonCol: String, latCol: String,
                     zoom: Int,
                     broadcastPolys: Boolean = true,
                     saltFactor: Int = 1,
                     predicate: String = "contains"): DataFrame = {
    val spark = polys.sparkSession
    F.ensureRegistered(spark)
    val cov = polys
      .withColumn("__cell", explode(F.cells_cover(col(polyGeom), lit(zoom))))
    val pts = points
      .withColumn("__cell", F.cell_encode(col(lonCol), col(latCol), lit(zoom)))
    // point-probe fast path: no WKB point round-trip per candidate
    val pred: Column =
      F.st_predicate_point(predicate, col(polyGeom), col(lonCol), col(latCol))

    val candidates =
      if (broadcastPolys) {
        pts.join(broadcast(cov), Seq("__cell"), "inner")
      } else if (saltFactor > 1) {
        val s = saltFactor
        val saltedPts = pts.withColumn("__salt",
          pmod(hash(col(lonCol), col(latCol)), lit(s)))
        val saltedCov = cov.withColumn("__salt",
          explode(sequence(lit(0), lit(s - 1))))
        saltedPts.join(saltedCov, Seq("__cell", "__salt"), "inner").drop("__salt")
      } else {
        pts.join(cov, Seq("__cell"), "inner")
      }
    candidates.where(pred).drop("__cell")
  }

  /** ADAPTIVE hot-cell salting (SURVEY.md §5 skew row): a cheap pre-agg
    * counts points per cell; only cells whose count exceeds
    * `hotThreshold` are salted (×saltFactor replication of the polygon
    * side), the cold remainder joins plainly — so replication cost is
    * paid exactly where skew exists. Returns the same rows as
    * pointInPolygon (verified in SpatialJoinSpec). The hot-cell set is a
    * small broadcast (cells, not rows). */
  def pointInPolygonAdaptive(polys: DataFrame, polyGeom: String,
                             points: DataFrame, lonCol: String, latCol: String,
                             zoom: Int, saltFactor: Int = 8,
                             hotThreshold: Long = 100000L): DataFrame = {
    val spark = polys.sparkSession
    F.ensureRegistered(spark)
    val cov = polys
      .withColumn("__cell", explode(F.cells_cover(col(polyGeom), lit(zoom))))
      .localCheckpoint(true)
    val pts = points
      .withColumn("__cell", F.cell_encode(col(lonCol), col(latCol), lit(zoom)))
    val hotCells = pts.groupBy("__cell").count()
      .where(col("count") > hotThreshold)
      .select("__cell").collect().map(_.getLong(0)).toSet
    val pred: Column =
      F.st_predicate_point("contains", col(polyGeom), col(lonCol), col(latCol))
    val isHot = col("__cell").isInCollection(
      if (hotCells.isEmpty) Seq(Long.MinValue) else hotCells.toSeq)
    val cold = pts.where(!isHot).join(cov.where(!isHot), Seq("__cell"))
    val s = saltFactor
    val hot = pts.where(isHot)
      .withColumn("__salt", pmod(hash(col(lonCol), col(latCol)), lit(s)))
      .join(cov.where(isHot).withColumn("__salt", explode(sequence(lit(0), lit(s - 1)))),
        Seq("__cell", "__salt"))
      .drop("__salt")
    cold.unionByName(hot).where(pred).drop("__cell")
  }

  /** Geometry × geometry join (both sides arbitrary WKB geometries).
    * Both sides explode to covering cells; candidate pairs dedup on the id
    * pair before the exact refine (a pair can meet in several cells).
    * Refine keeps only the pair ids + geometries; callers re-join payload
    * columns by id — at scale that keeps the dedup shuffle narrow. */
  def geomJoin(left: DataFrame, leftId: String, leftGeom: String,
               right: DataFrame, rightId: String, rightGeom: String,
               zoom: Int,
               predicate: String = "intersects",
               broadcastRight: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    F.ensureRegistered(spark)
    val l = left.select(col(leftId), col(leftGeom))
      .withColumn("__cell", explode(F.cells_cover(col(leftGeom), lit(zoom))))
    val r0 = right.select(col(rightId), col(rightGeom))
      .withColumn("__cell", explode(F.cells_cover(col(rightGeom), lit(zoom))))
    val r = if (broadcastRight) broadcast(r0) else r0
    val cand = l.join(r, Seq("__cell"), "inner")
      .dropDuplicates(leftId, rightId)
    cand.where(call_function(s"st_$predicate", col(leftGeom), col(rightGeom)))
      .drop("__cell")
  }

  /** Spatial overlay (reference: OGRLayer::Intersection) — the join above
    * plus the geometric intersection of each surviving pair. */
  def intersectionOverlay(left: DataFrame, leftId: String, leftGeom: String,
                          right: DataFrame, rightId: String, rightGeom: String,
                          zoom: Int): DataFrame = {
    geomJoin(left, leftId, leftGeom, right, rightId, rightGeom, zoom)
      .withColumn("geom_intersection", F.st_intersection(col(leftGeom), col(rightGeom)))
  }
}
