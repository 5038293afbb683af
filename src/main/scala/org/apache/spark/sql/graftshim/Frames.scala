package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Package-access shim (the Register/Columns seam pattern): rebuild a
  * DataFrame from an already-computed InternalRow RDD. `internalCreateDataFrame`
  * is `private[sql]`; routing through it gives iterative loops a
  * LogicalRDD-rooted plan — i.e. real logical-plan truncation — without
  * the double-compute + disk round-trip of Dataset.checkpoint or the
  * cluster-unsafe block lifetime of localCheckpoint (the backing RDD here
  * is persist()ed with intact lineage, so lost blocks recompute). */
object Frames {
  def ofInternal(spark: SparkSession, rdd: RDD[InternalRow],
                 schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
