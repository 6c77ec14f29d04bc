package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of `q_hop_window` — the hopping (sliding) window
  * aggregate maintained at ingest: the IDENTICAL window/agg expressions as
  * the batch query (`operators/Temporal.scala` qHopWindow) applied to a
  * watermarked stream. Append mode emits each (window, event_type) row
  * exactly once, when the watermark passes the window end — so a closed
  * window's row is FINAL, and replaying history through the stream yields
  * the batch result (the batch↔stream parity pattern; pinned in
  * `StreamingSpec`).
  *
  * State is bounded by the watermark delay: open windows within
  * (window length + delay) of the max event time, not history. The 4×
  * replication (window/slide) happens in the scan-stage Expand exactly as
  * in batch; only (window, type) partials reach the state store.
  */
object StreamHopWindow {

  /** `events`: streaming frame with `ts TIMESTAMP`, `event_type STRING`,
    * `value DOUBLE`. No pre-aggregation filter on purpose: Catalyst pushes
    * row predicates BELOW the EventTimeWatermark node, so a filter here
    * would stop watermark-advancing sentinel rows from ever reaching the
    * watermark tracker — callers exclude control rows downstream instead. */
  def hopAgg(
      events: DataFrame,
      watermark: String = "1 second"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double") / count(lit(1)), 4)
          .as("avg_v"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("avg_v"))
}
