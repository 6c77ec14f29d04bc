package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of `q_range_join` — the event-time interval join
  * maintained at ingest as a watermarked STREAM-STREAM join (the one
  * Structured Streaming capability the first ten parity pairs don't
  * exercise; reference analog: the dual-ended buffered join a native
  * engine hand-codes, R6's windowed state). [[StatefulOps.intervalJoin]]
  * is the generic form (inner/outer, spec'd on synthetic rows); this is
  * the q_range_join-shaped instance — half-open bound, prior-hour
  * direction — whose full-corpus replay pins against the DuckDB oracle.
  *
  * Both sides derive from the same append-only events feed: `error` rows
  * probe for the `click`/`view` activity of the same user in the hour
  * strictly before the error (identical predicate to the batch
  * `operators/Temporal.scala` qRangeJoin). Each side carries its own
  * watermark; the range condition bounds BOTH event-time columns
  * (`ats ∈ [ets-1h, ets)` ⇔ `ets ∈ (ats, ats+1h]`), which is exactly what
  * Spark's state cleanup needs: a buffered activity row is evicted once
  * the error-side watermark passes `ats + 1h`, so state is
  * (rate × window)-bounded, never history-bounded — the property that
  * makes this run forever at production rates.
  *
  * Emits the raw join PAIRS (eid, aid) in append mode — final-once rows.
  * The batch query's per-error COUNT is a downstream aggregate of these
  * pairs; chaining it into the same streaming plan would need Spark's
  * multi-stateful-operator watermark propagation on a non-windowed key,
  * which append mode cannot finalize — so the count stays a consumer-side
  * fold (`StreamingSpec` replays history through the stream and pins
  * pairs-then-count ≡ the oracle-gated batch rows).
  *
  * Filter placement caveat (same as [[StreamHopWindow]]): the per-side
  * `event_type` filters sit BELOW each side's EventTimeWatermark node, so
  * watermark-advancing sentinel rows must pass the side's filter to move
  * its clock — tests advance time with one 'error'-typed and one
  * 'click'-typed sentinel on reserved negative user ids.
  */
object StreamRangeJoin {

  /** `events`: streaming frame with `event_id LONG, ts TIMESTAMP,
    * user_id LONG, event_type STRING`. Returns (eid, aid) join pairs. */
  def pairs(events: DataFrame, watermark: String = "1 second"): DataFrame = {
    val errors = events.where(col("event_type") === "error")
      .select(col("event_id").as("eid"), col("user_id").as("uid"),
        col("ts").as("ets"))
      .withWatermark("ets", watermark)
    val acts = events.where(col("event_type").isin("click", "view"))
      .select(col("event_id").as("aid"), col("user_id"), col("ts").as("ats"))
      .withWatermark("ats", watermark)
    errors.join(acts,
      col("uid") === col("user_id") &&
        col("ats") >= col("ets") - expr("interval 1 hour") &&
        col("ats") < col("ets"))
      .select(col("eid"), col("aid"))
  }
}
