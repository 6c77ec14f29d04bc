package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One metric observation heading into the streaming detector. */
final case class ValueEvent(
    user_id: Long, event_time: java.sql.Timestamp, event_id: Long, value: Double)

/** A flagged anomaly — the same row batch `q_anomaly` emits. */
final case class AnomalyHit(
    event_id: Long, user_id: Long, event_time: java.sql.Timestamp,
    value: Double, n_baseline: Long)

private final case class PendingObs(tsUs: Long, eventId: Long, vi: Long)

/** Streaming rolling-z-score anomaly detection — the streaming face of
  * `operators.Sequence.qAnomaly`, bit-identical semantics: each
  * observation tests against the mean/variance of its ≤ 20 predecessors
  * (needs ≥ 10) in (event_time, event_id) order, with the cross-multiplied
  * integer test `(n·x − s1)²(n−1) > 9n(n·s2 − s1²)` on milli-quantized
  * values — no floats in the decision, in either engine.
  *
  * Order sensitivity is the streaming problem: an observation's verdict
  * depends on exactly which 20 events precede it, so nothing can be
  * decided until the watermark proves no earlier event is still in
  * flight. Pending observations buffer per user; an event-time timer
  * finalizes (in order) every observation at-or-behind the watermark,
  * slides it into the bounded 20-entry context, and emits hits. Live
  * state per user is the context (20 longs) plus the in-flight window of
  * pending observations — bounded by the watermark delay, not history.
  */
object StreamAnomaly {

  /** Spark's `round(value * 1000)` — BigDecimal HALF_UP on the double
    * product — replicated exactly so stream and batch quantize alike. */
  private[streaming] def quantize(value: Double): Long =
    java.math.BigDecimal.valueOf(value * 1000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** The batch test over a context of up to 20 predecessors. */
  private[streaming] def isAnomaly(vi: Long, ctx: Seq[Long]): Boolean = {
    val n = ctx.length.toLong
    if (n < 10) return false
    val s1 = ctx.sum
    val s2 = ctx.map(v => v * v).sum
    val d = n * vi - s1
    d * d * (n - 1) > 9 * n * (n * s2 - s1 * s1)
  }

  def anomalies(
      spark: SparkSession,
      events: Dataset[ValueEvent],
      watermark: String = "10 seconds",
      maxPending: Int = 100000): Dataset[AnomalyHit] = {
    import spark.implicits._
    events
      .withWatermark("event_time", watermark)
      .groupByKey(_.user_id)
      .transformWithState(
        new AnomalyProcessor(maxPending),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** Per-user pending buffer + bounded finalized context. */
private final class AnomalyProcessor(maxPending: Int)
  extends StatefulProcessor[Long, ValueEvent, AnomalyHit] {

  @transient private var pending: ListState[PendingObs] = _
  @transient private var context: ListState[Long] = _ // ≤ 20, oldest first

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    pending = getHandle.getListState[PendingObs](
      "pending", Encoders.product[PendingObs], TTLConfig.NONE)
    context = getHandle.getListState[Long](
      "context", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(userId: Long, rows: Iterator[ValueEvent],
      timers: TimerValues): Iterator[AnomalyHit] = {
    var p = pending.get().toVector
    rows.foreach { r =>
      if (p.size < maxPending)
        p = p :+ PendingObs(StreamFunnel.toMicros(r.event_time), r.event_id,
          StreamAnomaly.quantize(r.value))
    }
    pending.put(p.toArray)
    if (p.nonEmpty)
      getHandle.registerTimer(Math.floorDiv(p.map(_.tsUs).min + 999, 1000) + 1)
    Iterator.empty
  }

  override def handleExpiredTimer(userId: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[AnomalyHit] = {
    val wmUs = timers.getCurrentWatermarkInMs() * 1000
    val p = pending.get().toVector
    val (ripe, stillPending) = p.partition(_.tsUs <= wmUs)
    var ctx = context.get().toVector
    val out = Vector.newBuilder[AnomalyHit]
    ripe.sortBy(o => (o.tsUs, o.eventId)).foreach { o =>
      if (StreamAnomaly.isAnomaly(o.vi, ctx))
        out += AnomalyHit(o.eventId, userId, StreamFunnel.fromMicros(o.tsUs),
          o.vi / 1000.0, ctx.length.toLong)
      ctx = (ctx :+ o.vi).takeRight(20)
    }
    context.put(ctx.toArray)
    if (stillPending.isEmpty) pending.clear()
    else {
      pending.put(stillPending.toArray)
      getHandle.registerTimer(
        Math.floorDiv(stillPending.map(_.tsUs).min + 999, 1000) + 1)
    }
    out.result().iterator
  }
}
