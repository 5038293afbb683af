package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.functions.F

/** Structured-Streaming surface. The reference is a batch library
  * (SURVEY.md §3.9) — these transforms feed the SAME cell-explode /
  * window-agg plans from a stream source, which is the engine's
  * incremental-ingest path (availableNow trigger for backfill).
  */
object Streaming {

  /** Persisted static polygon covers created by streamPointInPolygon, so
    * callers can release them when their streaming query stops (caches
    * would otherwise live for the session: a cover must outlive every
    * micro-batch, so the operator cannot unpersist it itself). */
  private val staticCovers =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Unpersist every static cover cached by streamPointInPolygon. Called
    * automatically by the termination listener below once NO streaming
    * query is active; public so callers with their own lifecycle can
    * release early. */
  def releaseStaticCovers(): Unit = {
    var df = staticCovers.poll()
    while (df != null) { df.unpersist(); df = staticCovers.poll() }
  }

  /** Ties cover lifetime to query termination (VERDICT r4 / ADVICE r3):
    * when any streaming query terminates and no other query is still
    * active, every cached cover is unpersisted. Conservative under
    * concurrency — covers live while ANY streaming query runs, since the
    * queue does not track which query uses which cover — but nothing
    * outlives the last active query anymore. */
  private val releaseListenerOn = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def ensureReleaseListener(spark: SparkSession): Unit =
    if (releaseListenerOn.compareAndSet(false, true)) {
      import org.apache.spark.sql.streaming.StreamingQueryListener
      spark.streams.addListener(new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
          if (spark.streams.active.isEmpty) releaseStaticCovers()
      })
    }

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

  /** Stream-static point-in-polygon: streaming points prune against the
    * STATIC polygon side with the same cell equi-join + envelope gate +
    * exact refine as the batch operator (SpatialJoin), broadcast by
    * Catalyst (stream-static joins are stateless — no watermark needed).
    * This is the incremental-ingest twin of q11: a micro-batch of arriving
    * documents gets region-tagged with identical semantics. */
  def streamPointInPolygon(points: DataFrame, polys: DataFrame,
                           polyGeom: String, lonCol: String, latCol: String,
                           zoom: Int, predicate: String = "contains"): DataFrame = {
    F.ensureRegistered(points.sparkSession)
    ensureReleaseListener(points.sparkSession)
    // persist like the batch operator: coverZooms below is a plan-time
    // action over the cover, and the static side is re-joined by EVERY
    // micro-batch of a long-running stream — without the persist the
    // cells_cover explode recomputes once for the collect plus once per
    // batch for the lifetime of the query. Lifecycle: the termination
    // listener (ensureReleaseListener) unpersists covers once the last
    // active streaming query stops; releaseStaticCovers() remains for
    // callers that want to free earlier.
    // fan: single-row-group static input → one-core WKT parse/cover build
    // without the repartition; identity when already parallel (guide §2.5)
    val cov = graft.core.Par.fan(polys)
      .withColumn("__env", F.st_env_bounds(col(polyGeom)))
      .withColumn("__cell", explode(F.cells_cover(col(polyGeom), lit(zoom))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    staticCovers.add(cov)
    // `polys` is STATIC, so the mixed-zoom ladder is computable at plan
    // time exactly like the batch operator: if any polygon's capped cover
    // coarsened below `zoom`, the streaming point side must re-key to
    // every zoom present or those polygons silently never match (the
    // batch/stream row-set equality this operator promises). Single-zoom
    // covers — the common case — leave the point plan untouched.
    val zooms = SpatialJoin.coverZooms(cov)
    // fanStream: each micro-batch of a single-row-group file source is one
    // scan split, so the broadcast join + JTS refine below would run on
    // one core; repartition spreads the batch to cluster parallelism
    val pts = SpatialJoin.fanToZooms(
      graft.core.Par.fanStream(points)
        .withColumn("__cell", F.cell_encode(col(lonCol), col(latCol), lit(zoom))),
      zooms, zoom)
    pts.join(broadcast(cov), Seq("__cell"))
      .where(SpatialJoin.envGateLonLat(lonCol, latCol) &&
        F.st_predicate_point(predicate, col(polyGeom), col(lonCol), col(latCol)))
      .drop("__cell", "__env")
  }

  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  final case class SessState(startMs: Long, lastMs: Long, n: Long, firstEvent: Long)
  final case class SessionOut(user_id: Long, start_ms: Long, n_events: Long, first_event: Long)

  /** Stateful streaming sessionization via flatMapGroupsWithState — the
    * custom-state surface of §3.9. Sessions close when an in-batch gap
    * exceeds `gapSec` (emitted immediately) or when the event-time
    * watermark times the open session out. Input needs (user_id, event_id,
    * ts) with a watermark-compatible `ts`. */
  /** Stream-STREAM interval join (§3.9; Structured Streaming's symmetric
    * hash join — both sides buffer state, matches emit as rows arrive):
    * left rows pair with right rows of the same key whose event time
    * falls in [left.ts, left.ts + windowMs]. INNER joins emit eagerly —
    * watermarks only bound state retention — so a drain-once caller
    * (write all input, one processAllAvailable) gets the complete,
    * deterministic row set. The range bound is expressed directly on the
    * watermarked timestamp columns (NOT through unix_millis): Spark's
    * StreamingJoinHelper can only derive state-eviction watermarks from
    * raw event-time comparisons, so the millis form kept symmetric-hash
    * state forever in a long-running query. Timestamp compares run at
    * MICROsecond precision — a DuckDB oracle replays them via epoch_us.
    * Column names must already be disjoint. */
  def streamIntervalJoin(left: DataFrame, right: DataFrame,
                         keyL: String, keyR: String,
                         tsL: String, tsR: String, windowMs: Long,
                         joinType: String = "inner"): DataFrame =
    left.join(right, expr(
      s"""$keyL = $keyR AND $tsR >= $tsL
          AND $tsR <= $tsL + INTERVAL $windowMs MILLISECOND"""), joinType)

  def sessionizeStream(events: DataFrame, gapSec: Long = 1800,
                       watermark: String = "2 hours"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def fn(userId: Long, rows: Iterator[Ev], state: GroupState[SessState]): Iterator[SessionOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      if (rows.isEmpty && state.hasTimedOut) {
        state.getOption.foreach(s => out += SessionOut(userId, s.startMs, s.n, s.firstEvent))
        state.remove()
      } else {
        val evs = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
        var cur = state.getOption.orNull
        evs.foreach { e =>
          val t = e.ts.getTime
          if (cur == null) cur = SessState(t, t, 1, e.event_id)
          else if (t - cur.lastMs > gapSec * 1000) {
            out += SessionOut(userId, cur.startMs, cur.n, cur.firstEvent)
            cur = SessState(t, t, 1, e.event_id)
          } else cur = cur.copy(lastMs = math.max(cur.lastMs, t), n = cur.n + 1,
            firstEvent = math.min(cur.firstEvent, e.event_id))
        }
        if (cur != null) {
          state.update(cur)
          state.setTimeoutTimestamp(cur.lastMs + gapSec * 1000)
        }
      }
      out.iterator
    }
    events.selectExpr("user_id", "event_id", "ts").as[Ev]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
