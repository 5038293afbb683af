package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Observer viewshed over a DEM — the engine analog of gdal_viewshed
  * (reference: alg/viewshed.cpp :: GDALViewshedGenerate, apps/
  * gdal_viewshed.cpp). GDAL's implementation is the Wang–Robinson–White
  * interpolated sweep, a sequential approximation of true line-of-sight
  * chosen for single-core speed; this engine re-expresses the problem as
  * the EXACT R3 line-of-sight test (the algorithm Wang et al. approximate),
  * because R3 decomposes into Spark's native shape — explode → equi-join →
  * aggregate — with no sequential dependency at all:
  *
  *   1. targets: every DEM cell within `maxDist` (Chebyshev) of the
  *      observer.
  *   2. ray samples: each target at Chebyshev distance n contributes n−1
  *      sample coordinates — the DDA walk from observer to target, one
  *      sample per unit step, nearest-cell rounding (round-half-away on
  *      the exact rational k·d/n via pure integer arithmetic, so the
  *      sample grid is bit-reproducible on any engine).
  *   3. one equi-join samples→DEM on the sample cell key fetches the
  *      terrain height under every sample — this is the only shuffle that
  *      carries data, and it is a plain key join (at cluster scale the DEM
  *      side is partitioned by cell key; the sample side is generated
  *      map-side from the target cells).
  *   4. one aggregate per target takes min over k of the integer
  *      cross-multiplied clearance margin (eₜ−e₀)·k − (eₛ−e₀)·n ≥ 0 —
  *      sight-line comparison with NO floating point: distances along one
  *      ray are proportional to the step index, so the euclidean length
  *      cancels and visibility is exact 64-bit arithmetic.
  *
  * Scale notes (100-TB design): work is Σ ray lengths = O(area · maxDist),
  * the same asymptotic cost as GDAL's sweep per observer, but every row is
  * independent — the plan is generate → shuffle-on-cell-key → hash-agg,
  * no iteration, no driver participation, no broadcast of the DEM. Skewed
  * observers (many viewsheds sharing hot DEM cells) behave like any hot
  * equi-join key. visible cells report 255, blocked 0, matching
  * gdal_viewshed's default VISIBLE_VAL/INVISIBLE_VAL bytes.
  */
object Viewshed {

  /** @param dem   (x: long, y: long, elev: long) one row per DEM cell
    * @param ox,oy observer cell
    * @param obsH  observer height above the terrain at (ox,oy) — GDAL -oz
    * @param maxDist max Chebyshev distance of evaluated targets — GDAL -md
    * @return (x, y, vis) for every DEM cell with 1 <= chebyshev <= maxDist
    */
  def viewshed(dem: DataFrame, ox: Long, oy: Long, obsH: Long,
               maxDist: Int): DataFrame = {
    val eObs = dem.where(col("x") === ox && col("y") === oy)
      .select((col("elev") + obsH).as("e_obs"))
    // broadcast of one row: the observer's eye elevation joins every target
    val targets = dem
      .withColumn("n", greatest(abs(col("x") - ox), abs(col("y") - oy)))
      .where(col("n").between(1, maxDist))
      .crossJoin(broadcast(eObs))
      .select(col("x"), col("y"), col("n"), col("elev").as("e_t"), col("e_obs"))

    // DDA samples, integer round-half-away from the observer:
    //   xs = ox + sign(dx) * ((2*k*|dx| + n) div (2*n))
    // numerator is non-negative, so Spark's truncating `div` == floor ==
    // DuckDB `//` — the sample grid is engine-independent.
    val samples = targets.where(col("n") >= 2)
      .withColumn("k", explode(expr("sequence(1L, n - 1L)")))
      .withColumn("xs", lit(ox) +
        signum(col("x") - ox).cast("long") *
          expr(s"(2L * k * abs(x - ${ox}L) + n) div (2L * n)"))
      .withColumn("ys", lit(oy) +
        signum(col("y") - oy).cast("long") *
          expr(s"(2L * k * abs(y - ${oy}L) + n) div (2L * n)"))

    // terrain under each sample: ONE equi-join on the cell key
    val demS = dem.select(col("x").as("xs"), col("y").as("ys"),
      col("elev").as("e_s"))
    val margins = samples
      .join(demS, Seq("xs", "ys"))
      // clearance: target sight-line height at step k vs terrain, cross-
      // multiplied by n (distance cancels along a shared ray) — all BIGINT
      .withColumn("m", (col("e_t") - col("e_obs")) * col("k") -
        (col("e_s") - col("e_obs")) * col("n"))
      .groupBy("x", "y").agg(min(col("m")).as("min_margin"))

    // adjacent cells (n = 1) have no intervening samples -> always visible
    targets.join(margins, Seq("x", "y"), "left")
      .select(col("x"), col("y"),
        when(coalesce(col("min_margin"), lit(0L)) >= 0, lit(255))
          .otherwise(lit(0)).cast("int").as("vis"))
  }
}
