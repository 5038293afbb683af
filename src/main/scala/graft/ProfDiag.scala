package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.synth.Synth

/** Ad-hoc stage profiler for the optimization round (guide §1): times
  * isolated pieces of hot queries with the noop sink. Diagnostic only —
  * never run by the driver, not part of Bench/Verify. */
object ProfDiag {
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  def t(name: String)(body: => Unit): Unit = {
    val t0 = System.nanoTime()
    body
    println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    F.ensureRegistered(spark)
    import org.apache.spark.storage.StorageLevel
    // warmup
    try SparkEntry.entry(spark).queryExecution.toRdd.count() catch { case _: Throwable => }

    t("q52 full (noop)") {
      val polys = Synth.regionWkt(spark, dir).withColumn("geom", F.st_geomfromwkt(col("wkt")))
      noop(graft.operators.SpatialJoin.pointInPolygonAdaptive(polys, "geom", Synth.points(spark, dir),
        "lon", "lat", zoom = 7, saltFactor = 8, hotThreshold = 2000L)
        .select(col("region_id").cast("long").as("box_id"), col("pt_id")))
      spark.sharedState.cacheManager.clearCache()
    }
    locally {
      import org.apache.spark.storage.StorageLevel
      val polys2 = Synth.regionWkt(spark, dir).withColumn("geom", F.st_geomfromwkt(col("wkt")))
      val cov = graft.core.Par.fan(polys2)
        .withColumn("__env", F.st_env_bounds(col("geom")))
        .withColumn("__cell", explode(F.cells_cover(col("geom"), lit(7))))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("q52 cov + coverZooms") { println("   zooms=" + graft.operators.SpatialJoin.coverZooms(cov)) }
      val pts = graft.core.Par.fan(Synth.points(spark, dir))
        .withColumn("__cell", F.cell_encode(col("lon"), col("lat"), lit(7)))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val hotCells = pts.groupBy("__cell").count().where(col("count") > 2000L).select("__cell")
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("q52 hotCells count") { println("   hot=" + hotCells.count()) }
      val pred = (col("lon") >= col("__env")(0) && col("lon") <= col("__env")(2) &&
        col("lat") >= col("__env")(1) && col("lat") <= col("__env")(3)) &&
        F.st_predicate_point("contains", col("geom"), col("lon"), col("lat"))
      val cold = pts.join(broadcast(hotCells), Seq("__cell"), "left_anti")
        .join(cov.join(broadcast(hotCells), Seq("__cell"), "left_anti"), Seq("__cell"))
      t("q52 cold join+refine (noop)") { noop(cold.where(pred).select(col("pt_id"), col("region_id"))) }
      val hot = pts.join(broadcast(hotCells), Seq("__cell"), "left_semi")
        .withColumn("__salt", pmod(hash(col("lon"), col("lat")), lit(8)))
        .join(cov.join(broadcast(hotCells), Seq("__cell"), "left_semi")
          .withColumn("__salt", explode(sequence(lit(0), lit(7)))), Seq("__cell", "__salt"))
        .drop("__salt")
      t("q52 hot join+refine (noop)") { noop(hot.where(pred).select(col("pt_id"), col("region_id"))) }
      t("q52 union total (noop)") { noop(cold.unionByName(hot).where(pred).select(col("pt_id"), col("region_id"))) }
    }
    t("q11 full (noop)") {
      val polys = Synth.regionWkt(spark, dir).withColumn("geom", F.st_geomfromwkt(col("wkt")))
      noop(graft.operators.SpatialJoin.pointInPolygon(polys, "geom", Synth.points(spark, dir),
        "lon", "lat", zoom = 7, broadcastPolys = true)
        .select(col("region_id").cast("long").as("box_id"), col("pt_id")))
      spark.sharedState.cacheManager.clearCache()
    }
    val polys = Synth.regionWkt(spark, dir).withColumn("geom", F.st_geomfromwkt(col("wkt")))
    t("polys WKT parse (noop)") { noop(polys) }
    val cov = polys.withColumn("__env", F.st_env_bounds(col("geom")))
      .withColumn("__cell", explode(F.cells_cover(col("geom"), lit(7))))
    t("cover explode (noop, no persist)") { noop(cov) }
    val covP = cov.persist(StorageLevel.MEMORY_AND_DISK)
    t("cover persist + coverZooms collect") {
      println("   zooms=" + graft.operators.SpatialJoin.coverZooms(covP))
    }
    val pts = Synth.points(spark, dir)
      .withColumn("__cell", F.cell_encode(col("lon"), col("lat"), lit(7)))
    t("points + cell_encode (noop)") { noop(pts) }
    val cand = pts.join(broadcast(covP), Seq("__cell"), "inner")
    t("candidates join only (count via noop)") { noop(cand.select(col("pt_id"), col("region_id"))) }
    val gated = cand.where(col("lon") >= col("__env")(0) && col("lon") <= col("__env")(2) && col("lat") >= col("__env")(1) && col("lat") <= col("__env")(3))
    t("candidates + env gate (noop)") { noop(gated.select(col("pt_id"), col("region_id"))) }
    val refined = gated.where(F.st_predicate_point("contains", col("geom"), col("lon"), col("lat")))
    t("candidates + env gate + JTS (noop)") { noop(refined.select(col("pt_id"), col("region_id"))) }
    println("cand=" + cand.count() + " gated=" + gated.count() + " refined=" + refined.count())
    spark.stop()
  }
}
