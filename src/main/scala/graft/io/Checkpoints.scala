package graft.io

import org.apache.spark.sql.DataFrame

/** Reliable (cluster-safe) eager checkpoints for iterative operators.
  *
  * The kNN ring-doubling loop and polygonize's pointer-jumping label loop
  * must truncate lineage every round (a persist would stack O(rounds) of
  * plan on plan). Round-4's `localCheckpoint(true)` did that but is
  * cluster-UNSAFE: a local checkpoint's blocks live only on the executors
  * that computed them, so one lost executor poisons the lineage of every
  * later round (the same analysis Dedup.ngramJaccard documents). This
  * helper routes the truncation through a RELIABLE checkpoint instead —
  * written to `sparkContext.setCheckpointDir`, which on a real cluster the
  * caller points at shared storage (HDFS/S3); blocks then survive executor
  * loss and any stage resumes idempotently, matching the engine's
  * checkpoint-table contract (CatalogIO).
  *
  * If no checkpoint dir is configured (local runs, tests), a per-JVM temp
  * dir is created once and removed at JVM exit.
  */
object Checkpoints {

  private val lock = new Object

  /** Eagerly checkpoint `df` to reliable storage and return a Dataset
    * whose lineage starts at the checkpoint files. */
  def reliable(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty) lock.synchronized {
      if (sc.getCheckpointDir.isEmpty) {
        val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          def rm(p: java.io.File): Unit = {
            val kids = p.listFiles(); if (kids != null) kids.foreach(rm)
            p.delete(): Unit
          }
          rm(dir.toFile)
        }))
        sc.setCheckpointDir(dir.toString)
      }
    }
    df.checkpoint() // eager: materializes now, truncates lineage
  }
}
