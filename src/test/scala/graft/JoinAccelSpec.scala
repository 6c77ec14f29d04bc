package graft

import graft.operators.JoinAccel
import org.apache.spark.sql.functions._

/** Bloom-pruned join: correctness is the DuckDB oracle's job; these pin
  * what the oracle can't see — the filter admits every true key (no false
  * negatives ever), actually prunes (the entire point), and sits BEFORE
  * the fact-side exchange in the executed plan. */
class JoinAccelSpec extends SparkSpec {

  private def dim = Tables.orders(spark, sf())
    .filter(expr("o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'"))

  test("bloom pruning: zero false negatives, real pruning") {
    val li = Tables.lineitem(spark, sf())
    val pruned = JoinAccel.bloomPruned(dim, li)

    val trueKeys = dim.select(col("o_orderkey")).distinct().collect()
      .map(_.getLong(0)).toSet
    val keptKeys = pruned.select(col("l_orderkey")).distinct().collect()
      .map(_.getLong(0)).toSet
    val factKeys = li.select(col("l_orderkey")).distinct().collect()
      .map(_.getLong(0)).toSet

    // no false negatives: every fact row whose key is in dim survives
    assert((trueKeys & factKeys).subsetOf(keptKeys), "bloom dropped a true key")

    // pruning: kept keys ≈ true keys + fpp·rest; at 2^20 bits / ~400 keys
    // the fpp is ~0, so demand at most a 5 % overshoot
    val overshoot = keptKeys.size.toDouble / math.max(1, (trueKeys & factKeys).size)
    assert(overshoot <= 1.05, s"bloom barely pruned: kept ${keptKeys.size} " +
      s"of ${factKeys.size} fact keys for ${trueKeys.size} dim keys")
  }

  test("bloom filter runs before the fact-side exchange") {
    val df = JoinAccel.qBloomJoin.fn(spark, sf())
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("bloom_might_contain"), s"bloom filter missing:\n$plan")
    // the filter must appear below (after, in top-down print) the first
    // exchange that feeds the join — i.e. attached to the lineitem scan,
    // not applied post-join
    val filterIdx = plan.indexOf("bloom_might_contain")
    val scanIdx = plan.indexOf("Scan parquet", filterIdx - 2000)
    assert(scanIdx >= 0, s"no parquet scan near the bloom filter:\n$plan")
  }

  test("empty dimension prunes everything") {
    val none = dim.filter(lit(false))
    val pruned = JoinAccel.bloomPruned(none, Tables.lineitem(spark, sf()))
    assert(pruned.count() == 0L)
  }
}
