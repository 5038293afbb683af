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

  /** Per-round lineage management for iterative loops (OPTIMIZATION r6,
    * guide §5): an eager reliable checkpoint computes every round TWICE
    * (the eager action plus the checkpoint-write job) and round-trips
    * disk — paying that EVERY round dominated the tiny per-round joins of
    * the SSSP/PageRank/pointer-jumping loops. A bare persist() is NOT a
    * substitute: it leaves the logical plan growing, and analyzer/
    * optimizer time explodes with round count (measured: q263 6.5 s →
    * 97 s on persist-only rounds). `cut` instead materializes the round
    * ONCE into a persisted InternalRow RDD and rebuilds a
    * LogicalRDD-rooted DataFrame from it (graftshim.Frames) — constant
    * plan size per round, one compute, no disk round-trip — and every
    * `interval`-th round still goes through a true reliable checkpoint.
    * Cluster safety: the persisted RDDs keep their lineage, so a lost
    * block recomputes through at most `interval` rounds back to the last
    * reliable cut (never the fatal localCheckpoint block loss). The
    * previous round's RDD is unpersisted after the new round
    * materializes. */
  final class RoundCache(interval: Int = 8) {
    private var r1: org.apache.spark.rdd.RDD[_] = null // most recent cut
    private var r2: org.apache.spark.rdd.RDD[_] = null // the cut before it
    private var idx = 0
    /** LAZY cut: no eager job here — the caller's next action (a
      * convergence signature, the following round's cut chain, or the
      * loop's final result action) materializes the persisted RDD. A
      * loop with no per-round driver decision (PageRank's fixed `iters`)
      * therefore runs as ONE multi-stage job instead of 2·iters jobs.
      * Release is deferred one cut (the previous round is this round's
      * parent); unpersisting a never-computed RDD is a no-op, and
      * lineage stays intact either way. */
    def cut(df: DataFrame): DataFrame = {
      val out =
        if (interval > 0 && idx % interval == interval - 1) {
          val ck = reliable(df)
          release()
          ck
        } else {
          val rdd = df.queryExecution.toRdd.map(_.copy())
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          if (r2 != null) r2.unpersist(false): Unit
          r2 = r1
          r1 = rdd
          org.apache.spark.sql.graftshim.Frames.ofInternal(
            df.sparkSession, rdd, df.schema)
        }
      idx += 1
      out
    }
    /** Unpersist every tracked round (called on reliable cuts; loops may
      * call at the end once their result is materialized elsewhere). */
    def release(): Unit = {
      if (r2 != null) { r2.unpersist(false): Unit; r2 = null }
      if (r1 != null) { r1.unpersist(false): Unit; r1 = null }
    }
  }
}
