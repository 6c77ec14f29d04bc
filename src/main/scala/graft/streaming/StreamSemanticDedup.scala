package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** An embedding vector arriving on a stream. */
final case class VecEvent(vec_id: Long, event_time: java.sql.Timestamp, v: Array[Double])

/** A flagged streaming semantic duplicate: `vec_id` matched the earlier
  * vector `dup_of` (the lowest-id ≥ threshold neighbor) in k-means cell
  * `cell`. */
final case class SemDupHit(vec_id: Long, cell: Int, dup_of: Long)

private[streaming] final case class CellVec(
    cell: Int, vec_id: Long, event_time: java.sql.Timestamp,
    v: Array[Double], nrm: Double)

private final case class VecEntry(
    vecId: Long, v: Array[Double], nrm: Double, tsMs: Long)

/** Streaming face of `q_semantic_dedup` (SemDeDup with a learned blocking
  * key): the coarse quantizer is trained OFFLINE (batch
  * [[graft.api.VectorSearch.ivfFitKMeans]]) and applied online — each
  * arriving vector is assigned to its max-cosine cell host-side
  * (bit-identical to the engine's `ivfAssign` projection: same
  * multiply-accumulate fold order as the codegen'd `DotProduct`, same
  * lowest-cell tie-break), and `transformWithState` keyed by the cell
  * checks it against the cell's accumulated vectors — the ingest-pipeline
  * shape that semantic-dedups against the corpus per micro-batch instead
  * of re-running the batch pass. The suite's SEVENTH batch↔stream parity
  * pair (`StreamingSpec` pins the streamed dropped set ≡ the batch
  * keep-list complement on identical input fed in id order).
  *
  * Scale shape: state is partitioned by the SAME cell id the batch pair
  * join blocks on; per-cell state is capped at `maxPerCell` (the
  * [[graft.api.BucketCap]] mirror — a degenerate cell stops absorbing
  * state instead of growing without bound) and event-time timers expire
  * entries `horizonMs` past their event time, so retained state tracks
  * cell population × dedup horizon, not history. Raw vectors live in
  * state (64 doubles each); a production corpus would store PQ codes
  * ([[graft.api.ProductQuant]]) and re-rank the few candidates exactly. */
object StreamSemanticDedup {

  /** Multiply-accumulate in index order — the host mirror of the codegen'd
    * `DotProduct` loop, so cosines match the engine bit-for-bit. */
  def dotOf(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** `l2_norm` mirror: sqrt of the self dot product. */
  def nrmOf(v: Array[Double]): Double = math.sqrt(dotOf(v, v))

  /** Max-cosine cell, ties to the lowest cell id — the host mirror of
    * `ivfAssign`'s `greatest(struct(cos, -i))` projection. */
  def assignOf(v: Array[Double], nrm: Double, cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestCos = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val cn = math.sqrt(dotOf(c, c))
      val cos = dotOf(v, c) / (nrm * cn)
      if (cos > bestCos) { bestCos = cos; best = i }
      i += 1
    }
    best
  }

  /** The streaming semantic-dedup pipeline: vectors in, [[SemDupHit]]s out
    * (append). `cents` is the offline-trained quantizer. */
  def semDupStream(
      spark: SparkSession,
      vecs: Dataset[VecEvent],
      cents: Array[Array[Double]],
      minCosine: Double = 0.99,
      maxPerCell: Int = 10000,
      horizonMs: Long = 3600000L,
      watermark: String = "1 minute"): Dataset[SemDupHit] = {
    import spark.implicits._
    vecs
      .map { e =>
        val nrm = nrmOf(e.v)
        CellVec(assignOf(e.v, nrm, cents), e.vec_id, e.event_time, e.v, nrm)
      }
      .withWatermark("event_time", watermark)
      .groupByKey(_.cell)
      .transformWithState(
        new SemanticDedupProcessor(minCosine, maxPerCell, horizonMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** Per-cell vector index. Rows process in (event_time, vec_id) order;
  * an arriving vector flags against its lowest-id ≥ threshold neighbor
  * and is appended to state EITHER WAY — a dropped vector still witnesses
  * later duplicates, exactly like the batch pair derivation where the
  * lower-id side of a pair need not itself be kept. A redelivered vec_id
  * neither flags itself nor re-enters state. */
private final class SemanticDedupProcessor(
    minCosine: Double, maxPerCell: Int, horizonMs: Long)
  extends StatefulProcessor[Int, CellVec, SemDupHit] {

  @transient private var seen: ListState[VecEntry] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getListState[VecEntry](
      "seen", Encoders.product[VecEntry], TTLConfig.NONE)

  private def live(wmMs: Long): Vector[VecEntry] =
    seen.get().filter(_.tsMs + horizonMs > wmMs).toVector

  override def handleInputRows(key: Int, rows: Iterator[CellVec],
      timers: TimerValues): Iterator[SemDupHit] = {
    val wm = timers.getCurrentWatermarkInMs()
    var entries = live(wm)
    val out = Vector.newBuilder[SemDupHit]
    var maxTs = Long.MinValue
    rows.toVector.sortBy(r => (r.event_time.getTime, r.vec_id)).foreach { r =>
      val ts = r.event_time.getTime
      maxTs = math.max(maxTs, ts)
      if (!entries.exists(_.vecId == r.vec_id)) {
        val hits = entries.filter(e =>
          StreamSemanticDedup.dotOf(e.v, r.v) / (e.nrm * r.nrm) >= minCosine)
        if (hits.nonEmpty) out += SemDupHit(r.vec_id, key, hits.minBy(_.vecId).vecId)
        if (entries.size < maxPerCell)
          entries = entries :+ VecEntry(r.vec_id, r.v, r.nrm, ts)
      }
    }
    seen.put(entries.toArray)
    // one timer per batch at the newest entry's expiry: every stored entry
    // has expiry <= some registered timer, so abandoned cells still drain
    if (maxTs != Long.MinValue) getHandle.registerTimer(maxTs + horizonMs)
    out.result().iterator
  }

  override def handleExpiredTimer(key: Int, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[SemDupHit] = {
    val remaining = live(expired.getExpiryTimeInMs())
    if (remaining.isEmpty) seen.clear() else seen.put(remaining.toArray)
    Iterator.empty
  }
}
