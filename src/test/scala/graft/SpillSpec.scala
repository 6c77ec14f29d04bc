package graft

import org.apache.spark.sql.DataFrame

/** Memory-pressure drill for the imperative (object-buffer) aggregates —
  * TopKAgg (q_grouped_topk, every ANN top-k), the inverted-index heap,
  * SimhashAgg, BloomBuildAgg. Their buffers live on-heap inside
  * ObjectHashAggregateExec, which falls back to SORT-BASED aggregation
  * once a partition exceeds
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * keys — the path a 100 TB run under memory pressure actually takes:
  * buffers get `serialize()`d, spilled through the sorter, re-read and
  * `merge()`d. Output parity under threshold=1 proves serialize/merge
  * round-trips every buffer on every group boundary (the happy-path hash
  * aggregation can hide a broken serialize entirely).
  *
  * A second leg forces WindowExec's row buffer and SortMergeJoin's match
  * buffer to spill (`spark.sql.windowExec.buffer.spill.threshold` /
  * `spark.sql.sortMergeJoinExec.buffer.spill.threshold` = 4), covering
  * the other external-buffer operators under the same discipline. */
class SpillSpec extends SparkSpec {

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).toSeq

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val drills: Seq[(String, QueryDef)] = Seq(
    "grouped_topk" -> graft.operators.Analytic.qGroupedTopk,
    "inverted_index" -> graft.operators.TextAnalysis.qInvertedIndex,
    "dedup_simhash" -> graft.operators.Dedup.qDedupSimhash,
    "bloom_join" -> graft.operators.JoinAccel.qBloomJoin)

  test("object-agg sort-fallback (threshold=1): results identical to the hash path") {
    drills.foreach { case (name, q) =>
      val want = rowsOf(q.fn(spark, sf()))
      val got = withConf(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "1") {
        rowsOf(q.fn(spark, sf()))
      }
      assert(got == want, s"$name diverged under sort-based fallback")
      info(s"$name: ${want.size} rows identical under fallback threshold 1")
    }
  }

  test("window/SMJ buffer spill (threshold=4): results identical") {
    // the other external-buffer operators under the same discipline:
    // WindowExec's row buffer and SortMergeJoin's match buffer spill to
    // disk past the threshold — every window/join query must be
    // insensitive to where that boundary falls
    val windowed: Seq[(String, QueryDef)] = Seq(
      "window_rank" -> graft.operators.Relational.qWindowRank,
      "window_median" -> graft.operators.Analytic.qWindowMedian,
      "join_shuffle" -> graft.operators.Relational.qJoinShuffle)
    windowed.foreach { case (name, q) =>
      val want = rowsOf(q.fn(spark, sf()))
      val got = withConf(
        "spark.sql.windowExec.buffer.spill.threshold" -> "4",
        "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
        "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "4",
        "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "4") {
        rowsOf(q.fn(spark, sf()))
      }
      assert(got == want, s"$name diverged under buffer-spill pressure")
      info(s"$name: ${want.size} rows identical under spill threshold 4")
    }
  }
}
