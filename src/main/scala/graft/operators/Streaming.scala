package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.functions.F

/** Structured-Streaming surface. The reference is a batch library
  * (SURVEY.md §3.9) — these transforms feed the SAME cell-explode /
  * window-agg plans from a stream source, which is the engine's
  * incremental-ingest path (availableNow trigger for backfill).
  */
object Streaming {

  /** File-source stream of events with event-time watermark + tumbling
    * window counts — the streaming twin of the q09 batch query. */
  def eventWindowCounts(spark: SparkSession, schema: StructType, path: String,
                        window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    spark.readStream.schema(schema).parquet(path)
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ parquet -> event-time LTZ
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Stateless streaming tile assignment: the same cell_encode expression
    * applied on a stream — proves the spatial path is streaming-safe. */
  def tileAssignStream(points: DataFrame, zoom: Int): DataFrame = {
    F.ensureRegistered(points.sparkSession)
    points.withColumn("cell", F.cell_encode(col("lon"), col("lat"), lit(zoom)))
  }

  /** Streaming exact-dedup on content fingerprint within the watermark
    * horizon (dropDuplicates with event-time column). */
  def streamingDedup(docs: DataFrame, textCol: String, tsCol: String,
                     watermark: String = "1 hour"): DataFrame = {
    F.ensureRegistered(docs.sparkSession)
    docs.withColumn("fp", F.fingerprint64(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicates("fp")
  }
}
