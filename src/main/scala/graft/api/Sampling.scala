package graft.api

import graft.functions.CrossHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation (down-sampling over-represented
  * strata of a training corpus without materializing a shuffle or a seed
  * table).
  *
  * The sample decision is a pure function of the row's key columns —
  * `md5`-derived ([[graft.functions.CrossHash]]), NOT `rand()` — so:
  *
  *   - task retries and speculative executions make the same decision
  *     (a `rand()` sample under replay silently duplicates/drops rows);
  *   - the sample is reproducible across runs AND engines (the DuckDB
  *     oracle replays the identical decision);
  *   - at 100 TB the filter is a narrow per-row predicate pushed into the
  *     scan stage: no shuffle, no sort, no driver coordination.
  */
object Sampling {

  /** Deterministic bucket in [0, mod) from the row's key columns. */
  def bucket(mod: Int, keys: Column*): Column = {
    require(mod > 0, s"mod $mod")
    CrossHash.md5Long(concat_ws("|", keys: _*)) % mod
  }

  /** Keep rows whose bucket falls under a per-row rate (out of `mod`) —
    * Bernoulli sampling at `rateOutOf/mod`, stratified when `rateOutOf`
    * is derived from a stratum column (e.g. `when($"lang" === "en", 50)
    * .otherwise(1000)` with mod=1000 keeps 5% of English, all else). */
  def stratified(df: DataFrame, rateOutOf: Column, mod: Int, keys: Column*): DataFrame =
    df.where(bucket(mod, keys: _*) < rateOutOf)

  /** Domain-mixture resampling with EXACT quotas: downsample each stratum
    * so kept counts are proportional to integer `weight`, at the largest
    * total the corpus supports without upsampling any stratum
    * (K = min⌊count_s / w_s⌋, quota_s = w_s · K — all integer, no float
    * rates). Selection inside a stratum is the deterministic hash order
    * (md5 of the id, ties → id), so the sample is reproducible across
    * runs, retries, and engines — Bernoulli rates would only hit quotas
    * in expectation.
    *
    * Scale shape: the in-stratum rank runs as the TWO-PHASE bucketed rank
    * (the q_pack prefix-sum pattern) — a window partitioned by the
    * stratum ALONE would sort each stratum on one reducer, collapsing
    * parallelism exactly when a source dominates the corpus. Instead the
    * 56-bit hash splits each stratum into 4096 uniform buckets: per-bucket
    * ranks run on (stratum, bucket) partitions (bounded ≈ n/4096), bucket
    * counts roll into model-sized per-stratum prefix offsets, and the
    * global rank is offset + in-bucket rank. Identical output to the
    * single-window form (the oracle replays that form and hash-matches).
    * Returns the kept rows with (stratum count, quota, rank).
    *
    * `weight` must be a POSITIVE integer, constant within each stratum:
    * w < 1 breaks the quota math (`n_avail div w0` nulls or ANSI-errors),
    * and differing weights inside one stratum would silently collapse to
    * min(w), diverging from the documented proportional-quota contract.
    * The guard is embedded in the quota projection (`raise_error` branch)
    * so it costs no extra job: any violating stratum fails the run loudly
    * instead of producing a silently-wrong mixture.
    */
  def mixture(df: DataFrame, id: Column, stratum: Column, weight: Column): DataFrame = {
    val rows = df.select(id.as("id"), stratum.as("stratum"), weight.cast("long").as("w"))
      .withColumn("h", CrossHash.md5Long(col("id").cast("string")))
      .withColumn("b", expr(s"h div ${1L << 44}")) // 56-bit hash → 4096 buckets
    val counts = rows.groupBy("stratum").agg(
      count(lit(1)).as("n_avail"), min(col("w")).as("w0"), max(col("w")).as("w1"))
    val k = counts.agg(min(expr("n_avail div w0")).as("k"))
    val quotas = counts.crossJoin(k)
      .select(col("stratum"), col("n_avail"),
        when(col("w0") >= 1 && col("w0") === col("w1"), col("w0") * col("k"))
          .otherwise(raise_error(concat_ws("",
            lit("mixture(): stratum '"), col("stratum").cast("string"),
            lit("' has weight range ["), col("w0").cast("string"),
            lit(", "), col("w1").cast("string"),
            lit("] - weights must be >= 1 and constant per stratum"))))
          .as("quota"))
    val boff = rows.groupBy("stratum", "b").agg(count(lit(1)).as("bn"))
      .withColumn("boff",
        coalesce(sum(col("bn")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("stratum").orderBy("b")
          .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select("stratum", "b", "boff")
    val inBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum", "b").orderBy("h", "id")
    rows.join(boff, Seq("stratum", "b"))
      .withColumn("rnk", (row_number().over(inBucket) + col("boff")).cast("long"))
      .join(quotas, "stratum")
      .where(col("rnk") <= col("quota"))
      .select(col("id"), col("stratum"), col("n_avail"), col("quota"), col("rnk"))
  }
}
