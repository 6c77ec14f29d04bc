package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One document heading into the streaming curation pipeline. */
final case class CurateDocEvent(
    doc_id: Long, event_time: java.sql.Timestamp,
    text: String, lang: String, source: String)

/** Wire record between the two stateful stages: `stage` is a FINAL drop
  * verdict (`quality` | `dup`) passing through to the sink, or `surv` —
  * a dedup survivor heading into the per-domain cap. */
final case class CurateFlow(
    doc_id: Long, stage: String, source: String, lang: String,
    n_chars: Long, event_time: java.sql.Timestamp)

/** Stage-1 output: [[CurateFlow]] plus the text digest it keys on — flat,
  * so `event_time` stays a top-level column for the watermark. */
final case class CurateKeyed(
    dig: String, doc_id: Long, stage: String, source: String, lang: String,
    n_chars: Long, event_time: java.sql.Timestamp)

/** A streamed drop verdict: `doc_id` was dropped by `stage`
  * (`quality` | `dup` | `domain_cap`). Kept documents emit nothing —
  * "kept" is the complement, derived by [[StreamCuratePipeline.attribution]]. */
final case class CurateDrop(doc_id: Long, stage: String)

private final case class KeeperEntry(docId: Long)
private final case class CapEntry(docId: Long, nChars: Long)
private final case class CapState(entries: Seq[CapEntry])

/** Streaming face of `q_curate_pipeline` — the composed curation attrition
  * (quality gate → exact dedup → per-domain cap) maintained per micro-batch
  * at ingest instead of re-run over the corpus. The suite's NINTH
  * batch↔stream parity pair.
  *
  * The output is a stream of DROP EVENTS, and every emitted verdict is
  * FINAL — the design picks, for each stage, the append-monotone face of
  * the batch rule:
  *   - quality is per-row arithmetic (host mirror of
  *     [[graft.api.TextProfile.stats]], same IEEE double ops — bit-identical
  *     booleans), fixed at arrival;
  *   - dedup keeps the FIRST-SEEN holder of a text digest (by
  *     (event_time, doc_id)) — first-seen never changes, so a `dup` verdict
  *     never retracts. Feed order = doc_id order makes this ≡ the batch
  *     `min(doc_id)` keeper;
  *   - the cap keeps the best K per (source, lang) under
  *     (n_chars DESC, doc_id ASC) — the SAME rule as the batch
  *     top-K-with-long-tail-passthrough, and its evictions are MONOTONE:
  *     the survivor set only grows, so a doc evicted at any prefix stays
  *     evicted at every later prefix. `domain_cap` verdicts never retract.
  * Consequently the attribution snapshot (fed docs minus drops) equals the
  * batch pipeline's attribution over every prefix — `StreamingSpec` pins
  * it against `q_curate_pipeline`'s own corpus after every micro-batch.
  *
  * Scale shape: stage-2 state is ONE 8-byte keeper id per distinct text
  * digest, partitioned BY DIGEST — the same key the batch dedup groupBy
  * shuffles on; text itself never enters state (only its md5 travels past
  * the map stage). Stage-3 state is K (id, n_chars) pairs per domain —
  * O(K) bounded regardless of domain size, the streaming analogue of the
  * batch bounded-heap `TopKAgg`. Drop verdicts flow through stage 3
  * without touching state. Keeper state is horizonless BY DESIGN (the
  * batch face has no horizon); at corpus-scale digest counts the backend
  * must be RocksDB ([[StatefulOps.useRocksDbStateStore]]), and a
  * deployment that wants bounded state adds a processing-time TTL or
  * event-time timers — accepting that re-arrivals past the horizon
  * re-keep (the [[StreamSpanDedup]] horizon pattern). */
object StreamCuratePipeline {

  /** Host mirror of the batch quality gate — operand-for-operand the
    * [[graft.api.TextProfile.stats]] arithmetic on `split(text, " ")`
    * (Spark keeps trailing empties; so does `split(_, -1)`), so the
    * boolean matches the batch column bit-for-bit. */
  def qualityKeep(text: String, stopwords: Seq[String]): Boolean = {
    val w = text.split(" ", -1)
    val n = w.length
    val stopRatio = w.count(stopwords.contains).toDouble / n
    val ttr = w.distinct.length.toDouble / n
    n >= 20 && stopRatio >= 0.02 && ttr >= 0.4 && ttr <= 0.9
  }

  /** Spark `length()` counts codepoints, not UTF-16 units. */
  private[streaming] def nCharsOf(text: String): Long =
    text.codePointCount(0, text.length).toLong

  private[streaming] def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The streaming pipeline: docs in, final [[CurateDrop]] verdicts out
    * (append mode — two chained `transformWithState` stages, event time
    * propagated through the first so the chain plans). */
  def dropStream(
      spark: SparkSession,
      docs: Dataset[CurateDocEvent],
      k: Int = 3,
      stopwords: Seq[String] = graft.api.TextProfile.DefaultStopwords,
      watermark: String = "1 minute"): Dataset[CurateDrop] = {
    import spark.implicits._
    docs
      .map { d =>
        val stage = if (qualityKeep(d.text, stopwords)) "surv" else "quality"
        // only the digest travels on; the text leaves the row here
        CurateKeyed(md5Hex(d.text), d.doc_id, stage, d.source, d.lang,
          nCharsOf(d.text), d.event_time)
      }
      .withWatermark("event_time", watermark)
      .groupByKey(_.dig)
      .transformWithState(
        new CurateDedupProcessor, "event_time", OutputMode.Append())
      .groupByKey(r => (r.source, r.lang))
      .transformWithState(
        new CurateCapProcessor(k), TimeMode.EventTime(), OutputMode.Append())
  }

  /** Attribution view over accumulated drops: every fed doc's FIRST
    * dropping stage, `kept` if none — the batch pipeline's output shape. */
  def attribution(spark: SparkSession,
      fed: Seq[(Long, String)], drops: Seq[CurateDrop]): Map[Long, String] = {
    val d = drops.map(x => x.doc_id -> x.stage).toMap
    fed.map { case (id, _) => id -> d.getOrElse(id, "kept") }.toMap
  }
}

/** Keyed by text digest: the first-seen (event_time, doc_id) quality
  * survivor keeps; later holders drop as `dup`. Quality failures pass
  * through untouched (no state read or write). */
private final class CurateDedupProcessor
  extends StatefulProcessor[String, CurateKeyed, CurateFlow] {

  @transient private var keeper: ValueState[KeeperEntry] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    keeper = getHandle.getValueState[KeeperEntry]("keeper",
      Encoders.product[KeeperEntry], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[CurateKeyed],
      timers: TimerValues): Iterator[CurateFlow] = {
    val out = Vector.newBuilder[CurateFlow]
    var cur = if (keeper.exists()) Option(keeper.get()) else None
    rows.toVector
      .sortBy(r => (r.event_time.getTime, r.doc_id)).foreach { k =>
        val r = CurateFlow(k.doc_id, k.stage, k.source, k.lang, k.n_chars, k.event_time)
        if (r.stage != "surv") out += r
        else cur match {
          case Some(c) if c.docId != r.doc_id =>
            out += r.copy(stage = "dup")
          case Some(_) => () // redelivery of the keeper itself: no-op
          case None =>
            cur = Some(KeeperEntry(r.doc_id))
            keeper.update(KeeperEntry(r.doc_id))
            out += r
        }
      }
    out.result().iterator
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[CurateFlow] = Iterator.empty
}

/** Keyed by (source, lang): keeps the best `k` survivors under
  * (n_chars DESC, doc_id ASC); each arrival past capacity evicts exactly
  * one doc — possibly the arrival itself — as a final `domain_cap` drop.
  * `quality`/`dup` verdicts pass straight through to the sink. */
private final class CurateCapProcessor(k: Int)
  extends StatefulProcessor[(String, String), CurateFlow, CurateDrop] {

  @transient private var heap: ValueState[CapState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    heap = getHandle.getValueState[CapState](
      "heap", Encoders.product[CapState], TTLConfig.NONE)

  // best-first: longer keeps; doc_id breaks ties
  private def rank(e: CapEntry): (Long, Long) = (-e.nChars, e.docId)

  override def handleInputRows(key: (String, String), rows: Iterator[CurateFlow],
      timers: TimerValues): Iterator[CurateDrop] = {
    val out = Vector.newBuilder[CurateDrop]
    var entries = (if (heap.exists()) Option(heap.get()) else None)
      .map(_.entries.toVector).getOrElse(Vector.empty)
    var dirty = false
    rows.toVector.sortBy(r => (r.event_time.getTime, r.doc_id)).foreach { r =>
      if (r.stage != "surv") out += CurateDrop(r.doc_id, r.stage)
      else if (entries.exists(_.docId == r.doc_id)) () // redelivery: no-op
      else {
        entries = (entries :+ CapEntry(r.doc_id, r.n_chars)).sortBy(rank)
        if (entries.size > k) {
          out += CurateDrop(entries.last.docId, "domain_cap")
          entries = entries.dropRight(1)
        }
        dirty = true
      }
    }
    if (dirty) heap.update(CapState(entries))
    out.result().iterator
  }

  override def handleExpiredTimer(key: (String, String), timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[CurateDrop] = Iterator.empty
}
