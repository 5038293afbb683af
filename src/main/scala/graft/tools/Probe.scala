package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.operators.SpatialJoin
import graft.synth.Synth

/** Builder-side perf probe: stage-by-stage timings of the PIP pipeline so
  * optimization effort lands where the time actually goes. Not part of the
  * driver contract. Usage: runMain graft.tools.Probe [sfDir] */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    F.ensureRegistered(spark)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    val pts = Synth.points(spark, dir)
    time("warmup pts count")(pts.queryExecution.toRdd.count())
    time("pts materialize")(pts.queryExecution.toRdd.count())
    val enc = pts.withColumn("__cell", F.cell_encode(col("lon"), col("lat"), lit(7)))
    time("pts + cell_encode")(enc.queryExecution.toRdd.count())
    val polys = Synth.regionWkt(spark, dir).withColumn("geom", F.st_geomfromwkt(col("wkt")))
    val cov = polys.withColumn("__env", F.st_env_bounds(col("geom")))
      .withColumn("__cell", explode(F.cells_cover(col("geom"), lit(7))))
    time("cover explode")(cov.queryExecution.toRdd.count())
    val cand = enc.join(broadcast(cov), Seq("__cell"))
    time("candidates (no refine)")(cand.queryExecution.toRdd.count())
    val envOnly = cand.where(
      col("lon") >= col("__env")(0) && col("lon") <= col("__env")(2) &&
        col("lat") >= col("__env")(1) && col("lat") <= col("__env")(3))
    time("candidates + env gate")(envOnly.queryExecution.toRdd.count())
    val full = envOnly.where(F.st_predicate_point("contains", col("geom"), col("lon"), col("lat")))
    time("candidates + env + JTS")(full.queryExecution.toRdd.count())
    val q11 = SpatialJoin.pointInPolygon(polys, "geom", pts, "lon", "lat",
      zoom = 7, broadcastPolys = true)
    time("pointInPolygon (operator)")(q11.queryExecution.toRdd.count())
    spark.stop()
  }
}
