package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the cases AQE's runtime skew-join split
  * cannot reach (aggregations, and joins where one key dominates so hard
  * that even split partitions hot-spot).
  *
  * Salting is deterministic here (hash of the full row via xxhash64 of the
  * key + a disambiguator), not `rand()` — retries and speculative tasks
  * must route a row to the same salt bucket or results are nondeterministic
  * under task replay.
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a deterministic salt in
    * [0, buckets); the small side is replicated once per bucket. The join
    * key becomes (key, salt) so one hot key spreads over `buckets`
    * reducers. Inner join semantics. */
  def saltedJoin(
      skewed: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.toIndexedSeq.map(col): _*), lit(buckets)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. Caller supplies mergeable
    * partial/final expression pairs, e.g. partial `sum(x) as s` + final
    * `sum(s)`. A hot key's millions of rows reduce through `buckets`
    * parallel partials instead of one reducer. */
  def twoPhaseAgg(
      df: DataFrame,
      key: Column,
      buckets: Int,
      partial: Seq[Column],
      finalAgg: Seq[Column]): DataFrame = {
    require(buckets > 0 && partial.nonEmpty && finalAgg.nonEmpty)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(buckets)).cast("int"))
    salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(finalAgg.head, finalAgg.tail: _*)
      .withColumnRenamed("__key", "key")
  }
}
