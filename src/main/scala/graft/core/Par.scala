package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair (OPTIMIZATION r6; guide §2.5 "input skew —
  * one huge unsplittable file" and §6 input-split sizing).
  *
  * The driver's sf inputs are SINGLE-ROW-GROUP parquet files (verified:
  * every table 1 row group), and parquet scans cannot split below
  * row-group granularity — so every scan is ONE split, and all map-side
  * work before the first exchange (cell encodes, WKT parses, n-gram
  * explodes, JTS probes under a broadcast join) runs on ONE core of the
  * cluster. `fan` round-robin-repartitions the scan up to the cluster's
  * default parallelism — one cheap narrow-row exchange buys full-width
  * map stages — and is the IDENTITY whenever the plan already has at
  * least that many partitions, so at real scale (thousands of splits) no
  * shuffle is added. Partition count derives from the cluster, never a
  * constant. Output row SETS are unchanged (round-robin only moves rows;
  * every consumer is order-insensitive and the verify gate sorts). */
object Par {
  def fan(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** Streaming variant: a streaming DataFrame cannot report partition
    * counts at plan time, so fan unconditionally to cluster parallelism.
    * Used on file-stream sources that mirror the single-row-group batch
    * inputs; at scale the repartition is ~neutral (the micro-batch scan's
    * splits are re-spread across the same executors). */
  def fanStream(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
