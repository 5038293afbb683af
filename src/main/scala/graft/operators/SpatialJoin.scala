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
  *   - a point maps to exactly ONE cell per cover zoom, so point-in-polygon
  *     emits no duplicate pairs; geometry×geometry joins dedup on the id
  *     pair before the (expensive) refine.
  *   - cells_cover is CAPPED (default 4096 cells/row): a continental
  *     polygon at deep zoom coarsens instead of OOM-ing a task. The
  *     opposing side re-keys to every zoom actually present via a tiny
  *     distinct-zoom broadcast joined on a constant key (a 1-row broadcast
  *     and fan-out of exactly 1 unless some cover actually coarsened).
  */
object SpatialJoin {

  /** Fan `df`'s `__cell` key out to every zoom present in `cov`'s capped
    * cover: constant-key equi-join against the tiny distinct-zoom table
    * (BroadcastHashJoin — never BNLJ/cartesian), re-key via cell_at_zoom.
    * Rows whose __cell is already coarser than a target zoom skip that
    * zoom (ancestorAt would be identity — duplicate keys). */
  private def fanToZooms(df: DataFrame, zooms: DataFrame): DataFrame =
    // the constant join key is derived from data (pmod of a real column),
    // NOT lit(1)===lit(1): FoldablePropagation would fold a literal key
    // into `true` and degrade the join to a BroadcastNestedLoopJoin —
    // PlanSpec pins the equi-join shape
    df.withColumn("__one", pmod(F.cell_zoom(col("__cell")), lit(1L)))
      .join(broadcast(zooms), Seq("__one"))
      .where(col("__covz") <= F.cell_zoom(col("__cell")))
      .withColumn("__cell", F.cell_at_zoom(col("__cell"), col("__covz")))
      .drop("__one", "__covz")

  private def coverZooms(cov: DataFrame): DataFrame =
    cov.select(F.cell_zoom(col("__cell")).cast("int").as("__covz"))
      .distinct().withColumn("__one", pmod(col("__covz").cast("long"), lit(1L)))

  /** Point-in-polygon join.
    * @param polys  (idCol, geomCol: WKB) polygon side
    * @param points point side with lon/lat double columns
    * @param zoom   geodetic cell zoom for the prune phase
    * @param broadcastPolys map-side join (polygon side must fit in memory)
    * @param saltFactor >1 enables salting on the shuffle path
    * @param predicate "contains" (boundary excluded) or "covers"/"intersects"
    * @param mercator prune on the web-mercator cell grid instead of the
    *   geodetic one — the native path for post-warp (EPSG:3857-tiled) data;
    *   the exact refine is unchanged, so results are identical wherever
    *   both grids cover (|lat| <= 85.05) */
  def pointInPolygon(polys: DataFrame, polyGeom: String,
                     points: DataFrame, lonCol: String, latCol: String,
                     zoom: Int,
                     broadcastPolys: Boolean = true,
                     saltFactor: Int = 1,
                     predicate: String = "contains",
                     mercator: Boolean = false): DataFrame = {
    val spark = polys.sparkSession
    F.ensureRegistered(spark)
    def cover(g: org.apache.spark.sql.Column) =
      if (mercator) F.cells_cover_merc(g, lit(zoom)) else F.cells_cover(g, lit(zoom))
    def encode(lon: org.apache.spark.sql.Column, lat: org.apache.spark.sql.Column) =
      if (mercator) F.cell_encode_merc(lon, lat, lit(zoom)) else F.cell_encode(lon, lat, lit(zoom))
    val cov = polys.withColumn("__cell", explode(cover(col(polyGeom))))
    val pts = fanToZooms(
      points.withColumn("__cell", encode(col(lonCol), col(latCol))),
      coverZooms(cov))
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
    * pointInPolygon (verified in SpatialJoinSpec). The hot-cell set stays
    * a DataFrame joined via broadcast semi/anti joins — never a driver
    * collect or an IN-list literal, so a million hot cells cannot bloat
    * the plan. */
  def pointInPolygonAdaptive(polys: DataFrame, polyGeom: String,
                             points: DataFrame, lonCol: String, latCol: String,
                             zoom: Int, saltFactor: Int = 8,
                             hotThreshold: Long = 100000L,
                             predicate: String = "contains"): DataFrame = {
    val spark = polys.sparkSession
    F.ensureRegistered(spark)
    val cov = polys
      .withColumn("__cell", explode(F.cells_cover(col(polyGeom), lit(zoom))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pts = fanToZooms(
      points.withColumn("__cell", F.cell_encode(col(lonCol), col(latCol), lit(zoom))),
      coverZooms(cov))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hotCells = pts.groupBy("__cell").count()
      .where(col("count") > hotThreshold)
      .select("__cell")
    val pred: Column =
      F.st_predicate_point(predicate, col(polyGeom), col(lonCol), col(latCol))
    val cold = pts.join(broadcast(hotCells), Seq("__cell"), "left_anti")
      .join(cov.join(broadcast(hotCells), Seq("__cell"), "left_anti"), Seq("__cell"))
    val s = saltFactor
    val hot = pts.join(broadcast(hotCells), Seq("__cell"), "left_semi")
      .withColumn("__salt", pmod(hash(col(lonCol), col(latCol)), lit(s)))
      .join(cov.join(broadcast(hotCells), Seq("__cell"), "left_semi")
        .withColumn("__salt", explode(sequence(lit(0), lit(s - 1)))),
        Seq("__cell", "__salt"))
      .drop("__salt")
    cold.unionByName(hot).where(pred).drop("__cell")
  }

  /** Geometry × geometry join (both sides arbitrary WKB geometries).
    * Both sides explode to covering cells; candidate pairs dedup on the id
    * pair before the exact refine (a pair can meet in several cells).
    * Refine keeps only the pair ids + geometries; callers re-join payload
    * columns by id — at scale that keeps the dedup shuffle narrow.
    *
    * Skew: hot cells (giant geometries fanning out, or dense clusters) are
    * ADAPTIVELY salted when `saltFactor > 1`: a pre-agg over the left
    * cover finds cells with > hotThreshold left rows; in those cells the
    * left side salts deterministically and the right side replicates ×s.
    * Cold cells join plainly — replication is paid only where skew exists. */
  def geomJoin(left: DataFrame, leftId: String, leftGeom: String,
               right: DataFrame, rightId: String, rightGeom: String,
               zoom: Int,
               predicate: String = "intersects",
               broadcastRight: Boolean = false,
               saltFactor: Int = 1,
               hotThreshold: Long = 100000L,
               mercator: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    F.ensureRegistered(spark)
    def cover(g: org.apache.spark.sql.Column) =
      if (mercator) F.cells_cover_merc(g, lit(zoom)) else F.cells_cover(g, lit(zoom))
    val l0 = left.select(col(leftId), col(leftGeom))
      .withColumn("__cell", explode(cover(col(leftGeom))))
    val r00 = right.select(col(rightId), col(rightGeom))
      .withColumn("__cell", explode(cover(col(rightGeom))))
    // mixed-zoom completeness: each side re-keys to every zoom present on
    // EITHER side that is <= its own cell's zoom; an intersecting pair
    // always meets at the coarser of its two cover zooms.
    val zooms = coverZooms(l0).unionByName(coverZooms(r00)).distinct()
    val l = fanToZooms(l0, zooms)
    val r0 = fanToZooms(r00, zooms)
    val refined =
      if (broadcastRight) {
        l.join(broadcast(r0), Seq("__cell"), "inner")
          .dropDuplicates(leftId, rightId)
      } else if (saltFactor > 1) {
        val lp = l.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val hotCells = lp.groupBy("__cell").count()
          .where(col("count") > hotThreshold).select("__cell")
        val s = saltFactor
        val cold = lp.join(broadcast(hotCells), Seq("__cell"), "left_anti")
          .join(r0.join(broadcast(hotCells), Seq("__cell"), "left_anti"), Seq("__cell"))
        val hot = lp.join(broadcast(hotCells), Seq("__cell"), "left_semi")
          .withColumn("__salt", pmod(hash(col(leftId)), lit(s)))
          .join(r0.join(broadcast(hotCells), Seq("__cell"), "left_semi")
            .withColumn("__salt", explode(sequence(lit(0), lit(s - 1)))),
            Seq("__cell", "__salt"))
          .drop("__salt")
        cold.unionByName(hot).dropDuplicates(leftId, rightId)
      } else {
        l.join(r0, Seq("__cell"), "inner")
          .dropDuplicates(leftId, rightId)
      }
    refined
      .where(call_function(s"st_$predicate", col(leftGeom), col(rightGeom)))
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
