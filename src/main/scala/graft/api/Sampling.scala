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
}
