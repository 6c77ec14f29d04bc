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

  test("Spark's own runtime bloom filter (InjectRuntimeFilter) fires on the shuffle join") {
    // the idiomatic production path when nobody hand-builds the bloom:
    // Spark's InjectRuntimeFilter plants a BloomFilterAggregate on the
    // selectively-filtered creation side and a might_contain predicate on
    // the application side, pre-exchange — the same shuffle reduction
    // JoinAccel.bloomPruned does manually. Test SFs sit far below the
    // 10 GB application-side default, so lower the thresholds to show the
    // rule the shape a 100 TB fact presents; broadcast is disabled because
    // the rule (correctly) skips joins whose fact side never shuffles.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = Tables.lineitem(spark, sf())
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val opt = joined.queryExecution.optimizedPlan.toString()
      assert(opt.contains("might_contain"),
        s"InjectRuntimeFilter did not fire on the fact side:\n$opt")
      // semantics-preserving: same result as the un-accelerated join
      val got = joined.orderBy("l_returnflag").collect()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val exp = Tables.lineitem(spark, sf())
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag").collect()
      assert(got.toSeq == exp.toSeq, "runtime filter changed the join result")
    } finally prev.foreach { case (k, ov) =>
      ov match {
        case Some(v) => spark.conf.set(k, v)
        case None => spark.conf.unset(k)
      }
    }
  }

  test("empty dimension prunes everything") {
    val none = dim.filter(lit(false))
    val pruned = JoinAccel.bloomPruned(none, Tables.lineitem(spark, sf()))
    assert(pruned.count() == 0L)
  }

  test("array-bearing expressions compare by content, not reference") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.LongType
    import graft.functions.{BloomMightContain, PqArgmin, PqDist2}
    // reference-based equals would defeat canonicalization / subexpression
    // elimination / codegen-class reuse for semantically identical instances
    val h = BoundReference(0, LongType, nullable = true)
    val b1 = BloomMightContain(h, Array(1L, 2L, 3L), 4)
    val b2 = BloomMightContain(h, Array(1L, 2L, 3L), 4)
    assert(b1 == b2 && b1.hashCode == b2.hashCode && b1.semanticEquals(b2))
    assert(b1 != BloomMightContain(h, Array(1L, 2L, 4L), 4))

    val v = BoundReference(0, org.apache.spark.sql.types.ArrayType(LongType), nullable = true)
    val d1 = PqDist2(v, Array(10L, 20L), 0)
    val d2 = PqDist2(v, Array(10L, 20L), 0)
    assert(d1 == d2 && d1.hashCode == d2.hashCode && d1.semanticEquals(d2))
    assert(d1 != PqDist2(v, Array(10L, 21L), 0))

    val a1 = PqArgmin(v, Array(Array(1L, 2L), Array(3L, 4L)), 0)
    val a2 = PqArgmin(v, Array(Array(1L, 2L), Array(3L, 4L)), 0)
    assert(a1 == a2 && a1.hashCode == a2.hashCode && a1.semanticEquals(a2))
    assert(a1 != PqArgmin(v, Array(Array(1L, 2L), Array(3L, 5L)), 0))
  }
}
