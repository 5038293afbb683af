package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.operators.SpatialJoin

/** Plan-shape probe for the Scaling job's join variants (builder-side
  * diagnostic): prints the physical plan head of each variant over the
  * materialized scaling input so shuffle/broadcast differences are
  * visible without timing noise. Usage: runMain graft.tools.ProbeScale */
object ProbeScale {
  /** Pure input-side baseline: scan + span explode + WKT parse, NO join —
    * its N-vs-4N ratio is the host's ceiling for any join built on it. */
  def scanBaseline(docsPath: String): Unit = {
    for ((cores, parts) <- Seq((8, 64), (32, 256))) {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .appName(s"probe-scan-$cores")
        .config("spark.sql.shuffle.partitions", parts.toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      F.ensureRegistered(spark)
      def job = spark.read.parquet(docsPath)
        .select(posexplode(col("spans")).as(Seq("pos", "span")))
        .where(col("span.kind") === "text")
        .select(F.st_geomfromwkt(col("span.text")).as("g"))
        .agg(sum(F.st_x(col("g")) + F.st_y(col("g"))))
      job.collect() // warmup
      val t0 = System.nanoTime()
      job.collect()
      println(f"[scan-baseline] local[$cores]: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.stop()
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--scan")) { scanBaseline(args(1)); return }
    val docsPath = args.headOption.getOrElse("/tmp/graft_scaling/docs_32000000")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    F.ensureRegistered(spark)
    val docs = spark.read.parquet(docsPath)
    val pts = docs
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "span")))
      .where(col("span.kind") === "text")
      .select(col("doc_id"), col("span.offset").as("offset"),
        F.st_geomfromwkt(col("span.text")).as("g"))
      .withColumn("lon", F.st_x(col("g"))).withColumn("lat", F.st_y(col("g")))
      .drop("g")
    val polys = spark.range(2000).select(col("id").as("region_id"),
      format_string("POLYGON((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f))",
        (col("id") * 131 % 340) - 170.0, (col("id") * 241 % 150) - 75.0,
        (col("id") * 131 % 340) - 168.0, (col("id") * 241 % 150) - 75.0,
        (col("id") * 131 % 340) - 168.0, (col("id") * 241 % 150) - 73.0,
        (col("id") * 131 % 340) - 170.0, (col("id") * 241 % 150) - 73.0,
        (col("id") * 131 % 340) - 170.0, (col("id") * 241 % 150) - 75.0).as("wkt"))
      .withColumn("geom", F.st_geomfromwkt(col("wkt")))
    for (mode <- Seq("unsalted", "salted")) {
      val j = mode match {
        case "salted" => SpatialJoin.pointInPolygon(polys, "geom", pts, "lon", "lat",
          zoom = 5, broadcastPolys = false, saltFactor = 8)
        case _ => SpatialJoin.pointInPolygon(polys, "geom", pts, "lon", "lat",
          zoom = 5, broadcastPolys = false, saltFactor = 1)
      }
      println(s"===== $mode =====")
      val plan = j.queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Broadcast") ||
          l.contains("Sort ") || l.contains("AQE")).take(20).mkString("\n"))
    }
    spark.stop()
  }
}
