package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** A parsed session event flowing through the stateful operators. */
final case class SessionEvent(user: String, event_time: java.sql.Timestamp, payload: String)

/** An assembled user session. */
final case class SessionSummary(
    user: String,
    n_events: Long,
    start_ms: Long,
    end_ms: Long,
    duration_ms: Long)

private final case class SessionState(n: Long, startMs: Long, endMs: Long)

/** Stateful streaming operators (SURVEY.md §2.B streaming-stateful row).
  *
  * The reference's only state is sink buffers in `ListState`
  * (`CTSDBSink.java:212-230`) and pending-ack message IDs; our engine adds
  * the operators a session stream actually needs:
  *
  *   - content dedup within a watermark (the scalable analog of the
  *     reference's redelivery-dedup, `PulsarSource.java:199-201` — state is
  *     evicted once the watermark passes, so it cannot grow unboundedly);
  *   - session assembly via `flatMapGroupsWithState` with an event-time
  *     timeout — emits one summary per quiet-gap-terminated session;
  *   - declarative `session_window` aggregation for the same semantics
  *     where the built-in operator suffices (preferred; Catalyst-planned).
  */
object StatefulOps {

  /** Switch the session to the RocksDB state store — required at scale:
    * the default HDFS-backed provider keeps every key in executor heap,
    * which a 100 TB stream's dedup/session state cannot fit; RocksDB
    * spills to local SSD with bounded memory. Call before `.start()`. */
  def useRocksDbStateStore(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** Drop duplicate message payloads within the watermark horizon. */
  def dedupWithinWatermark(msgs: DataFrame, watermark: String = "1 minute"): DataFrame =
    msgs.withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("payload")

  /** Built-in session windows: gap-based grouping, Catalyst-planned. */
  def sessionWindows(events: DataFrame, gap: String = "30 seconds"): DataFrame =
    events
      .withWatermark("event_time", "1 minute")
      .groupBy(session_window(col("event_time"), gap), col("user"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user"),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("n_events"))

  /** Watermarked stream-stream interval join: right rows matching on
    * `keyCond` within `[leftTs, leftTs + within]`. BOTH sides carry
    * watermarks and the join condition bounds event-time distance — that
    * pair is what lets Spark evict buffered rows once the watermark passes
    * the interval. Without it a stream-stream join buffers both streams
    * forever, which no 100 TB stream survives; with it, state is
    * O(rate × (watermark + within)). Append output.
    *
    * `joinType` also admits the outer variants ("left_outer" etc.): an
    * unmatched preserved-side row is emitted with nulls once the watermark
    * passes its interval — i.e. when the engine can PROVE no match can
    * still arrive, the only sound emission point on unbounded streams. */
  def intervalJoin(
      left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      keyCond: org.apache.spark.sql.Column,
      within: String = "5 seconds",
      watermark: String = "10 seconds",
      joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(
        right.withWatermark(rightTs, watermark),
        keyCond &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"interval $within"),
        joinType)

  /** Custom state machine: assemble sessions with a 30s quiet-gap timeout.
    * Demonstrates arbitrary per-key state where `session_window` semantics
    * are not enough (e.g. emitting mid-session checkpoints). */
  def assembleSessions(
      spark: SparkSession,
      events: Dataset[SessionEvent],
      gapMs: Long = 30000): Dataset[SessionSummary] = {
    import spark.implicits._
    events
      .withWatermark("event_time", "1 minute")
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: String, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionSummary(user, s.n, s.startMs, s.endMs, s.endMs - s.startMs))
          } else {
            // replay-correct: a gap WITHIN the batch closes a session too,
            // so backfilling history through the stream gives the same
            // sessions as live arrival (and as batch q_sessionize)
            val ts = rows.map(_.event_time.getTime).toSeq.sorted
            var cur = state.getOption.getOrElse(SessionState(0, Long.MaxValue, Long.MinValue))
            val closed = Vector.newBuilder[SessionSummary]
            ts.foreach { t =>
              if (cur.n > 0 && t - cur.endMs > gapMs) {
                closed += SessionSummary(user, cur.n, cur.startMs, cur.endMs,
                  cur.endMs - cur.startMs)
                cur = SessionState(0, Long.MaxValue, Long.MinValue)
              }
              cur = SessionState(cur.n + 1, math.min(cur.startMs, t), math.max(cur.endMs, t))
            }
            state.update(cur)
            state.setTimeoutTimestamp(cur.endMs + gapMs)
            closed.result().iterator
          }
      }
  }

  /** The same session assembly on Spark 4's `transformWithState` — the
    * successor stateful API: typed per-key state handles (`ValueState`)
    * instead of one opaque state object, explicit event-time timers
    * instead of a single timeout slot, and a RocksDB-only state backend
    * (call [[useRocksDbStateStore]] before starting the query). Semantics
    * are identical to [[assembleSessions]]; both are declared so a caller
    * can migrate per-query. */
  def assembleSessionsTws(
      spark: SparkSession,
      events: Dataset[SessionEvent],
      gapMs: Long = 30000): Dataset[SessionSummary] = {
    import spark.implicits._
    events
      .withWatermark("event_time", "1 minute")
      .groupByKey(_.user)
      .transformWithState(
        new SessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }

  /** Measured floor for the state-store count: 8 wins the swept optimum
    * at BOTH measured extremes — 7 live window rows (r14 state_profile:
    * 32 stores paid ~466 ms commit fixed cost each per batch for ~7 rows)
    * and 700k live RocksDB rows over a 10⁶-key domain (r15 sweep: 8
    * stores 597.6k rows/s vs 32: 314.5k vs 128: 92.4k). */
  val StatePartitionsDefault = 8

  /** Where per-store commit fixed cost stops dominating: the r15 sweep's
    * state_commit attribution puts the crossover at ~50k CHANGED rows per
    * store per batch — below it, adding stores only multiplies commit
    * overhead (per-batch cost is O(changed keys), flat in |state|). */
  val ChangedRowsPerStoreTarget = 50000L

  /** The measured sizing rule, in-engine (r15 verdict #5): store count
    * scales with CHANGED ROWS PER BATCH, not live keys and not cores —
    * `clamp(ceil(changed / 50k), 8, maxParallelism)`. For a planned query
    * feed it the trigger's row cap (each input row changes at most one
    * key, so that bounds changed keys from above); for a running one,
    * [[recommendedStatePartitions]] reads the observed number. Set
    * `spark.sql.shuffle.partitions` to the result BEFORE `.start()`. */
  def statePartitionsFor(changedRowsPerBatch: Long,
      maxParallelism: Int = 32): Int =
    math.max(StatePartitionsDefault.toLong,
      math.min(maxParallelism.toLong,
        (math.max(0L, changedRowsPerBatch) + ChangedRowsPerStoreTarget - 1)
          / ChangedRowsPerStoreTarget)).toInt

  /** Observed changed-rows-per-batch (max of `numRowsUpdated` across the
    * query's recent progress) → the store count [[statePartitionsFor]]
    * recommends for this query's NEXT deployment; None before the first
    * stateful progress. THE RE-SIZE PATH IS A RESTART: Spark pins the
    * state partition count into the checkpoint at first start
    * (`spark.sql.shuffle.partitions` is read once and baked into every
    * state store path), so applying a new recommendation means starting
    * the query against a FRESH checkpoint and rebuilding state from the
    * source's retained history — there is no in-place re-shard. Poll this
    * during canary runs, not per batch. */
  def recommendedStatePartitions(q: org.apache.spark.sql.streaming.StreamingQuery,
      maxParallelism: Int = 32): Option[Int] = {
    val changed = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq.map(_.numRowsUpdated))
    if (changed.isEmpty) None
    else Some(statePartitionsFor(changed.max, maxParallelism))
  }
}

/** `transformWithState` session state machine: one `ValueState` per user,
  * one event-time timer armed at last-event + gap; a newer event re-arms
  * the timer (deleting the stale one), and expiry emits the summary and
  * clears the state — so state size is O(active sessions). */
private final class SessionProcessor(gapMs: Long)
  extends StatefulProcessor[String, SessionEvent, SessionSummary] {

  @transient private var sess: ValueState[SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[SessionState](
      "sess", Encoders.product[SessionState], TTLConfig.NONE)

  override def handleInputRows(user: String, rows: Iterator[SessionEvent],
      timers: TimerValues): Iterator[SessionSummary] = {
    // replay-correct like the fMGWS twin: in-batch gaps close sessions
    val ts = rows.map(_.event_time.getTime).toSeq.sorted
    var cur =
      if (sess.exists()) sess.get()
      else SessionState(0, Long.MaxValue, Long.MinValue)
    if (cur.n > 0) getHandle.deleteTimer(cur.endMs + gapMs)
    val closed = Vector.newBuilder[SessionSummary]
    ts.foreach { t =>
      if (cur.n > 0 && t - cur.endMs > gapMs) {
        closed += SessionSummary(user, cur.n, cur.startMs, cur.endMs,
          cur.endMs - cur.startMs)
        cur = SessionState(0, Long.MaxValue, Long.MinValue)
      }
      cur = SessionState(cur.n + 1, math.min(cur.startMs, t), math.max(cur.endMs, t))
    }
    sess.update(cur)
    getHandle.registerTimer(cur.endMs + gapMs)
    closed.result().iterator
  }

  override def handleExpiredTimer(user: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[SessionSummary] = {
    val s = sess.get()
    sess.clear()
    Iterator(SessionSummary(user, s.n, s.startMs, s.endMs, s.endMs - s.startMs))
  }
}
