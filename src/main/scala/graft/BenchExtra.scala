package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.F

/** Extra (non-frozen) diagnostics bench — guide §1.4 noop-sink isolation
  * and phase-level timing for optimization work. NOT part of the driver
  * protocol; Bench.scala stays the only reported number. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val what = sys.env.getOrElse("GRAFT_EXTRA", "q223phases")
    what match {
      case "q223phases" => q223phases(spark, sfDir)
      case other =>
        // time an arbitrary declared query with the noop sink, 3 reps
        val fn = SparkEntry.queries(other)
        var i = 0
        while (i < 3) {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"[extra] $other rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
          spark.sharedState.cacheManager.clearCache()
          i += 1
        }
    }
    spark.stop()
  }

  private def q223phases(s: SparkSession, dir: String): Unit = {
    F.ensureRegistered(s)
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = java.nio.file.Files.createTempDirectory("q223x").toString
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"))
    val srcV = s"$base/v"; val srcC = s"$base/c"
    val out = s"$base/out"; val ckp = s"$base/ckp"
    t("write sources") {
      ev.where(col("event_id") % 2 === 0).write.mode("overwrite").parquet(srcV)
      ev.where(col("event_id") % 2 === 1).write.mode("overwrite").parquet(srcC)
    }
    val views = s.readStream.schema(ev.schema).parquet(srcV)
      .withWatermark("ts", "40 days")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("vts"))
    val clicks = s.readStream.schema(ev.schema).parquet(srcC)
      .withWatermark("ts", "40 days")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("cts"))
    val joined = graft.operators.Streaming.streamIntervalJoin(views, clicks,
      "v_user", "c_user", "vts", "cts", windowMs = 3600000L, joinType = "leftSemi")
      .select(col("view_id"), col("v_user"), unix_millis(col("vts")).as("vts_ms"))
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = t("start") {
        joined.writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckp).outputMode("append").start()
      }
      t("processAllAvailable") { q.processAllAvailable() }
      q.recentProgress.foreach { p =>
        println(s"[batch] id=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
      }
      t("stop") { q.stop() }
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    t("read back") {
      s.read.parquet(out).write.format("noop").mode("overwrite").save()
    }
  }
}
