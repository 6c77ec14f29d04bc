package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the mergeable histogram-quantile state — the
  * streaming face of `operators.Analytic.qHistQuantile` (13th batch↔stream
  * parity pair). State is per-(group, bucket) bin COUNTS: associative, so
  * each micro-batch folds in as a `(grp, bucket)`-keyed sum through
  * [[IncrementalAgg.applyVersioned]]'s ledger/atomic-swap protocol, and
  * the read face ([[quantiles]]) is the exact derivation the batch query
  * uses (`Analytic.histQuantiles`) — p50/p95 per group plus the `ALL`
  * row merged from per-group bins, never from raw rows.
  *
  * The bin spec `(mn, w)` is FIXED at view creation, like every
  * production histogram MV: quantile state is only mergeable across
  * batches if all batches bucket identically. A value below `mn` lands
  * in a genuine negative bucket via explicit floor division (see
  * [[applyBatch]] — deterministic, mergeable, and consistent with
  * DuckDB's `//`); a deployment that cannot bound its domain widens
  * `w` or re-registers the view.
  *
  * Scale shape (100 TB): each micro-batch shuffles ≤ |groups|×|bins|
  * partial rows after map-side combine; the stored state is
  * O(groups × 129) longs regardless of history; any range/rollup read is
  * O(state), never a raw re-scan.
  */
object StreamHistQuantile {

  /** Fold one micro-batch of `(grpCol, viCol)` rows into the histogram
    * state at `root` (batchId-idempotent). */
  def applyBatch(batch: DataFrame, batchId: Long, root: String,
      grpCol: org.apache.spark.sql.Column, viCol: org.apache.spark.sql.Column,
      mn: Long, w: Long): Unit =
    IncrementalAgg.applyVersioned(batch, batchId, root)(
      b => b.select(grpCol.as("grp"), viCol.as("vi"))
        // explicit FLOOR division: `div` truncates toward zero, which
        // would fold stream values in (mn-w, mn) into bucket 0 alongside
        // genuine in-range values; floor semantics give them bucket -1
        // (a true negative bucket, matching DuckDB's `//` convention and
        // the scaladoc's promise)
        .groupBy(col("grp"),
          expr(s"(vi - ${mn}L) div ${w}L + " +
            s"(CASE WHEN (vi - ${mn}L) % ${w}L < 0 THEN -1 ELSE 0 END)")
            .as("bucket"))
        .agg(count(lit(1)).as("cnt")),
      (prev, partials) => prev.unionByName(partials)
        .groupBy("grp", "bucket").agg(sum(col("cnt")).as("cnt")))

  /** The maintained quantiles: per-group + `ALL` p50/p95 bin lower
    * bounds, derived from the stored bins by the SAME code path as the
    * batch query. None before the first batch. */
  def quantiles(spark: SparkSession, root: String, mn: Long, w: Long)
      : Option[DataFrame] =
    IncrementalAgg.state(spark, root)
      .map(graft.operators.Analytic.histQuantiles(_, mn, w))

  /** Wire a streaming frame of `(grpCol, viCol)` rows into the state. */
  def maintain(input: DataFrame, root: String, checkpoint: String,
      grpCol: org.apache.spark.sql.Column, viCol: org.apache.spark.sql.Column,
      mn: Long, w: Long): org.apache.spark.sql.streaming.StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) =>
        applyBatch(batch, id, root, grpCol, viCol, mn, w))
      .start()
}
