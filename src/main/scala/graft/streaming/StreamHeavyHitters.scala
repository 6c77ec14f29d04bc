package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One word-count update emitted by [[StreamHeavyHitters.countStream]]:
  * `word` has been seen `cnt` times in the stream so far. */
final case class WordCount(word: String, cnt: Long)

/** Streaming exact word-frequency maintenance — the streaming face of the
  * batch heavy-hitters pass ([[graft.api.Curation.heavyHitters]], query
  * `q_heavy_hitters`): an ingest pipeline keeps corpus token counts
  * current per micro-batch instead of re-scanning the corpus, and the
  * ≥ pct% heavy-hitter set at any instant is a filter over the maintained
  * counts ([[StreamHeavyHitters.snapshot]]).
  *
  * Shape: tokens flatMap out of each document row-wise (no shuffle), then
  * `transformWithState` keyed BY WORD — the same key the batch groupBy
  * shuffles on — with one `Long` of state per distinct word. Update-mode
  * emissions carry only the words touched by the current batch (the
  * long-tail vocabulary stays quiet), so downstream traffic per batch is
  * O(batch vocabulary), not O(corpus vocabulary).
  *
  * Scale shape: state is vocabulary-sized (8 bytes + key per distinct
  * word) and partitioned by word across the cluster — the exact-count
  * state a 1000-executor job spreads evenly; the backend must be RocksDB
  * ([[StatefulOps.useRocksDbStateStore]]) once vocabularies reach
  * billions of keys. The threshold is deliberately NOT applied inside the
  * processor: ≥ pct% is a property of the GLOBAL total, which no single
  * key owns — it belongs in the snapshot view. StreamingSpec pins the
  * snapshot bit-identical to the batch operator after every batch prefix.
  */
object StreamHeavyHitters {

  /** Maintained word counts: docs in, per-batch [[WordCount]] updates out
    * (update mode — one row per word touched per batch, cumulative count). */
  def countStream(spark: SparkSession, docs: Dataset[DocEvent]): Dataset[WordCount] = {
    import spark.implicits._
    docs
      .flatMap(d => d.text.split(" ", -1)) // Spark split() semantics: keep empties
      .groupByKey(identity)
      .transformWithState(new WordCountProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** The heavy-hitter view over an accumulated update table: latest count
    * per word (counts are monotone, so `max` = latest), exact global
    * ≥ pct% filter — operand-for-operand the batch operator's arithmetic,
    * so `frac` doubles match bit-for-bit. */
  def snapshot(updates: DataFrame, pct: Int = 1): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be 1..100, got $pct")
    val last = updates.groupBy("word").agg(max("cnt").as("cnt"))
    val total = last.agg(sum("cnt").as("total"))
    last.crossJoin(broadcast(total))
      .where(col("cnt") * 100 >= col("total") * pct)
      .select(col("word"), col("cnt"),
        (col("cnt").cast("double") / col("total")).as("frac"))
  }
}

/** Per-word running count: one `Long` of state, no timers (counts never
  * expire — dropping a word's count would corrupt the global total the
  * snapshot threshold divides by). */
private final class WordCountProcessor
  extends StatefulProcessor[String, String, WordCount] {

  @transient private var cnt: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[String],
      timers: TimerValues): Iterator[WordCount] = {
    val next = (if (cnt.exists()) cnt.get() else 0L) + rows.size
    cnt.update(next)
    Iterator.single(WordCount(key, next))
  }
}
