package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One user event heading into the streaming funnel. */
final case class UserEvent(user_id: Long, event_time: java.sql.Timestamp, event_type: String)

/** A completed conversion: the same row batch `q_funnel` emits. */
final case class Conversion(
    user_id: Long,
    signup_ts: java.sql.Timestamp,
    click_ts: java.sql.Timestamp,
    purchase_ts: java.sql.Timestamp)

private final case class FunnelEvt(code: Int, tsUs: Long)

/** Streaming funnel detection — the streaming face of
  * `operators.Sequence.qFunnel`, with IDENTICAL semantics: earliest
  * signup, earliest click strictly after it, earliest purchase strictly
  * after that, all inside the window.
  *
  * Those semantics cannot be decided event-by-event under out-of-order
  * arrival (an earlier signup arriving late retroactively changes which
  * click qualifies), so the processor buffers a user's funnel events in
  * `ListState` and finalizes exactly ONCE, when the event-time watermark
  * passes `min(signup) + window` — the moment the funnel outcome is
  * complete no matter what arrives later (any later event has event time
  * beyond the closed window). One event-time timer per user enforces
  * this; state is cleared on finalization either way.
  *
  * Batch parity includes one-funnel-per-user-EVER (the batch query keys
  * on the global earliest signup), so a finalized user leaves behind a
  * one-byte `done` tombstone that stops re-detection from later events —
  * without it the stream would report a second conversion from a fresh
  * post-window signup, which the batch query never does.
  *
  * Scale shape: live state is a bounded few rows per in-flight user
  * (only the three funnel event types are buffered, capped at
  * `maxPerUser`), evicted at window close; finalized users keep only the
  * tombstone (~bytes per user — users ≪ events). The batch query remains
  * the backfill path; this is the low-latency path over the same
  * semantics, pinned equal in `StreamingSpec` on identical input.
  */
object StreamFunnel {

  private[streaming] val Codes = Map("signup" -> 0, "click" -> 1, "purchase" -> 2)

  /** Event times carry MICROsecond precision (the events table is
    * micros); state and comparisons run in micros so the streaming
    * outcome is bit-identical to the batch query. Timers are epoch-ms —
    * deadlines round UP so a timer never fires before the window truly
    * closes. */
  private[streaming] def toMicros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000) * 1000000L + t.getNanos / 1000

  private[streaming] def fromMicros(us: Long): java.sql.Timestamp = {
    val sec = Math.floorDiv(us, 1000000L)
    val t = new java.sql.Timestamp(sec * 1000)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  def conversions(
      spark: SparkSession,
      events: Dataset[UserEvent],
      windowMs: Long = 7L * 24 * 3600 * 1000,
      watermark: String = "10 seconds",
      maxPerUser: Int = 10000): Dataset[Conversion] = {
    import spark.implicits._
    events
      .filter(e => Codes.contains(e.event_type))
      .withWatermark("event_time", watermark)
      .groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor(windowMs, maxPerUser),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The batch rule over a buffered event set (times in micros) — shared
    * by the processor and the spec's sequential reference. Returns
    * (t1, t2, t3) micros on conversion. */
  private[streaming] def evaluate(evts: Seq[FunnelEvt], windowMs: Long): Option[(Long, Long, Long)] = {
    val t1s = evts.filter(_.code == 0).map(_.tsUs)
    if (t1s.isEmpty) return None
    val t1 = t1s.min
    val t2s = evts.filter(e => e.code == 1 && e.tsUs > t1).map(_.tsUs)
    if (t2s.isEmpty) return None
    val t2 = t2s.min
    val t3s = evts.filter(e => e.code == 2 && e.tsUs > t2).map(_.tsUs)
    if (t3s.isEmpty) return None
    val t3 = t3s.min
    if (t3 <= t1 + windowMs * 1000) Some((t1, t2, t3)) else None
  }
}

/** Per-user funnel buffer + window-close timer. */
private final class FunnelProcessor(windowMs: Long, maxPerUser: Int)
  extends StatefulProcessor[Long, UserEvent, Conversion] {

  @transient private var buf: ListState[FunnelEvt] = _
  @transient private var done: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[FunnelEvt](
      "funnel", Encoders.product[FunnelEvt], TTLConfig.NONE)
    done = getHandle.getValueState[Boolean](
      "done", Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
      timers: TimerValues): Iterator[Conversion] = {
    if (done.exists()) return Iterator.empty // funnel already finalized
    var entries = buf.get().toVector
    rows.foreach { r =>
      if (entries.size < maxPerUser)
        entries = entries :+ FunnelEvt(StreamFunnel.Codes(r.event_type),
          StreamFunnel.toMicros(r.event_time))
    }
    buf.put(entries.toArray)
    // (re-)arm the close timer at min(signup) + window (the tightest
    // deadline; an earlier-signup late arrival re-arms earlier). With no
    // signup yet, arm a cleanup at max(ts) + window: once the watermark
    // passes that, any future signup's window starts after these events,
    // so the buffered clicks/purchases can never qualify and are dropped.
    def ceilMs(us: Long): Long = Math.floorDiv(us + 999, 1000)
    val signups = entries.filter(_.code == 0)
    if (signups.nonEmpty)
      getHandle.registerTimer(ceilMs(signups.map(_.tsUs).min) + windowMs)
    else if (entries.nonEmpty)
      getHandle.registerTimer(ceilMs(entries.map(_.tsUs).max) + windowMs)
    Iterator.empty
  }

  override def handleExpiredTimer(userId: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[Conversion] = {
    val entries = buf.get().toVector
    val e = expired.getExpiryTimeInMs()
    // finalize only at the TIGHT deadline (a stale timer from before a
    // late-arriving earlier signup may fire at the wrong time — ignore it)
    val deadline = entries.filter(_.code == 0).map(_.tsUs).minOption
      .map(us => Math.floorDiv(us + 999, 1000) + windowMs)
    deadline match {
      case Some(d) if d <= e =>
        buf.clear()
        done.update(true)
        StreamFunnel.evaluate(entries, windowMs).map { case (t1, t2, t3) =>
          Conversion(userId, StreamFunnel.fromMicros(t1),
            StreamFunnel.fromMicros(t2), StreamFunnel.fromMicros(t3))
        }.iterator
      case Some(_) => Iterator.empty // stale early timer; window still open
      case None =>
        // no signup: prune events no future signup's window can reach
        val keep = entries.filter(_.tsUs > e * 1000)
        if (keep.isEmpty) buf.clear() else buf.put(keep.toArray)
        Iterator.empty
    }
  }
}
