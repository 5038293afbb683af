package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Iceberg-shaped table IO without the Iceberg runtime (not on the
  * classpath — SURVEY.md §0): Parquet data + an atomically-renamed JSON
  * manifest per committed snapshot, behind a narrow seam so a real Iceberg
  * catalog can replace it without touching operators.
  *
  * Checkpointed stages give partition-granular idempotent resume — the
  * Spark re-expression of the reference's memory-bounded restartable
  * chunking (reference: alg/gdalwarpoperation.cpp :: CollectChunkList) and
  * progress reporting (port/cpl_progress.cpp :: GDALTermProgress):
  * a stage whose manifest exists is never recomputed; per-partition
  * lineage + metrics rows are appended alongside every commit.
  */
object CatalogIO {

  /** Write df as parquet + manifest; atomic via temp-dir rename. Returns
    * the row count. No-op (returns committed count) if already committed. */
  def commitStage(spark: SparkSession, df: DataFrame, root: String,
                  jobId: String, stage: String): Long = {
    val dir = Paths.get(root, jobId, stage)
    val manifest = dir.resolve("MANIFEST.json")
    if (Files.exists(manifest)) {
      val txt = Files.readString(manifest)
      return "\"rows\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(0L)
    }
    Files.createDirectories(dir.getParent)
    val tmp = Paths.get(root, jobId, s".$stage.tmp-${System.nanoTime()}")
    // per-partition metrics (lineage rows): partition id, rows, wall ms
    val sc = spark.sparkContext
    val rowsAcc = sc.longAccumulator(s"$stage-rows")
    val counted = df.withColumn("__one", lit(1))
    val metrics = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val out = counted.drop("__one")
    out.write.mode("overwrite").parquet(tmp.resolve("data").toString)
    // gather per-file (≈ per-partition) metrics from the committed files
    val dataDir = tmp.resolve("data")
    val partFiles = Files.list(dataDir).iterator()
    var nFiles = 0
    while (partFiles.hasNext) { val f = partFiles.next(); if (f.toString.endsWith(".parquet")) nFiles += 1 }
    val rows = spark.read.parquet(dataDir.toString).count()
    val lineage = spark.read.parquet(dataDir.toString)
      .withColumn("__pid", spark_partition_id())
      .groupBy("__pid").agg(count(lit(1)).as("rows"))
      .withColumn("job_id", lit(jobId)).withColumn("stage", lit(stage))
      .withColumn("committed_at", current_timestamp())
    lineage.write.mode("overwrite").parquet(tmp.resolve("lineage").toString)
    val manifestTxt =
      s"""{"job_id":"$jobId","stage":"$stage","rows":$rows,"files":$nFiles,"schema":${jsonStr(df.schema.json)}}"""
    Files.writeString(tmp.resolve("MANIFEST.json"), manifestTxt, StandardCharsets.UTF_8)
    // atomic publish
    if (Files.exists(dir)) deleteRec(dir)
    Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    rows
  }

  def readStage(spark: SparkSession, root: String, jobId: String, stage: String): DataFrame =
    spark.read.parquet(Paths.get(root, jobId, stage, "data").toString)

  /** Copy-on-write MERGE — the Iceberg `MERGE INTO` row-level law (spec
    * v2 copy-on-write: WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED
    * THEN INSERT *): target snapshot FULL OUTER JOIN source batch on
    * `keyCol`; matched keys take the source ROW (per-row, not per-column
    * coalesce — a legitimately-NULL source field must still win),
    * source-only keys insert, target-only rows carry over. The merged
    * result commits as a NEW stage — snapshot isolation / time travel:
    * `fromStage` stays readable — and commitStage's manifest makes the
    * whole merge idempotent (a re-run returns the committed count
    * without recomputing). Returns the merged row count.
    *
    * 100-TB shape: ONE equi-shuffle on the merge key — the COW law
    * (Iceberg rewrites the files containing matches; AQE broadcasts the
    * batch side when it is small, which is the common upsert). A
    * merge-on-read design would instead append delete files and fold at
    * scan time — noted as the scale alternative for high-churn tables. */
  def mergeStage(spark: SparkSession, batch: DataFrame, root: String,
                 jobId: String, fromStage: String, toStage: String,
                 keyCol: String): Long = {
    val target = readStage(spark, root, jobId, fromStage)
    val cols = target.columns
    require(batch.columns.sameElements(cols),
      s"mergeStage: batch schema ${batch.columns.mkString(",")} != target ${cols.mkString(",")}")
    val t = target.select(cols.map(c => col(c).as(s"__t_$c")).toIndexedSeq: _*)
    val b = batch.select(cols.map(c => col(c).as(s"__b_$c")).toIndexedSeq: _*)
    val srcPresent = col(s"__b_$keyCol").isNotNull
    val merged = t.join(b, col(s"__t_$keyCol") === col(s"__b_$keyCol"), "full_outer")
      .select(cols.map(c =>
        when(srcPresent, col(s"__b_$c")).otherwise(col(s"__t_$c")).as(c)).toIndexedSeq: _*)
    commitStage(spark, merged, root, jobId, toStage)
  }

  /** PARTITION-GRANULAR idempotent commit (the north-star "resume without
    * reprocessing committed tiles"): output is hive-partitioned by
    * `partCol`; a manifest lists the partition values already committed.
    * On re-run, committed partition values are ANTI-JOINED out of the
    * input before any work happens (their upstream compute is pruned with
    * them), and only the remainder is written — dynamic partition
    * overwrite keeps a half-written crash partition safe to rewrite.
    * Returns the number of NEW partition values committed. */
  def commitPartitioned(spark: SparkSession, df: DataFrame, root: String,
                        jobId: String, stage: String, partCol: String): Long = {
    val dir = Paths.get(root, jobId, stage)
    Files.createDirectories(dir)
    val manifest = dir.resolve("PARTS.json")
    val committed: Set[String] =
      if (Files.exists(manifest)) parseStringArray(Files.readString(manifest)).toSet
      else Set.empty
    // committed values as a broadcast ANTI-JOIN side, never an isin
    // literal list: at 10⁵⁺ committed partitions an IN-list bloats the
    // plan/codegen (the anti-pattern SpatialJoin's hot-cell path documents)
    // while a broadcast DataFrame stays one compact hashed relation
    val pending =
      if (committed.isEmpty) df
      else df.join(
        broadcast(committedPartsDf(spark, committed.toSeq)),
        df(partCol).cast("string") === col(CommittedCol), "left_anti")
    val newVals = pending.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    if (newVals.nonEmpty) {
      pending.write
        .partitionBy(partCol)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(dir.resolve("data").toString)
      // lineage row per newly committed partition value
      val lineageDir = dir.resolve("lineage")
      val lines = newVals.map(v =>
        s"""{"job_id":${jsonStr(jobId)},"stage":${jsonStr(stage)},"part":${jsonStr(v)},"committed_at_ms":${System.currentTimeMillis()}}""")
      Files.createDirectories(lineageDir)
      Files.writeString(lineageDir.resolve(s"parts-${System.nanoTime()}.json"),
        lines.mkString("\n"), StandardCharsets.UTF_8)
      // manifest updated LAST (atomic rename) — crash before this line
      // leaves the new partitions uncommitted and safely rewritable
      val all = (committed ++ newVals).toSeq.sorted
      val tmp = dir.resolve(s".PARTS.json.tmp-${System.nanoTime()}")
      Files.writeString(tmp, all.map(jsonStr).mkString("[", ",", "]"),
        StandardCharsets.UTF_8)
      Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    newVals.length.toLong
  }

  /** Read only the partitions the manifest lists as committed. */
  def readCommittedPartitions(spark: SparkSession, root: String, jobId: String,
                              stage: String, partCol: String): DataFrame = {
    val dir = Paths.get(root, jobId, stage)
    val manifest = dir.resolve("PARTS.json")
    val committed: Seq[String] =
      if (Files.exists(manifest)) parseStringArray(Files.readString(manifest))
      else Seq.empty
    // before any commit the data dir does not exist — an empty table, not
    // an AnalysisException
    if (committed.isEmpty || !Files.isDirectory(dir.resolve("data")))
      return spark.emptyDataFrame
    val all = spark.read.parquet(dir.resolve("data").toString)
    // broadcast semi-join, not an isin literal (see commitPartitioned)
    all.join(broadcast(committedPartsDf(spark, committed)),
      all(partCol).cast("string") === col(CommittedCol), "left_semi")
  }

  private val CommittedCol = "__committed_part"

  private def committedPartsDf(spark: SparkSession, vals: Seq[String]): DataFrame = {
    import spark.implicits._
    vals.toDF(CommittedCol)
  }

  def isCommitted(root: String, jobId: String, stage: String): Boolean =
    Files.exists(Paths.get(root, jobId, stage, "MANIFEST.json"))

  def lineage(spark: SparkSession, root: String, jobId: String, stage: String): DataFrame =
    spark.read.parquet(Paths.get(root, jobId, stage, "lineage").toString)

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Parse a JSON array of strings (the PARTS manifest) with full escape
    * handling — a partition value containing a quote or backslash must
    * round-trip, or resume silently re-/mis-commits partitions. */
  private[io] def parseStringArray(txt: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = txt.indexOf('[') + 1
    while (i > 0 && i < txt.length) {
      txt.charAt(i) match {
        case '"' =>
          val sb = new StringBuilder
          i += 1
          while (i < txt.length && txt.charAt(i) != '"') {
            if (txt.charAt(i) == '\\' && i + 1 < txt.length) {
              txt.charAt(i + 1) match {
                case 'n' => sb += '\n'; i += 2
                case 'r' => sb += '\r'; i += 2
                case 't' => sb += '\t'; i += 2
                case 'u' =>
                  sb += Integer.parseInt(txt.substring(i + 2, i + 6), 16).toChar
                  i += 6
                case c => sb += c; i += 2 // \" \\ \/ and friends
              }
            } else { sb += txt.charAt(i); i += 1 }
          }
          i += 1
          out += sb.toString
        case ']' => i = txt.length
        case _ => i += 1
      }
    }
    out.result()
  }

  private def deleteRec(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val it = Files.list(p).iterator()
      while (it.hasNext) deleteRec(it.next())
    }
    Files.deleteIfExists(p)
  }
}
