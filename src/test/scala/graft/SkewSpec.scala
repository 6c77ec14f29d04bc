package graft

import graft.api.Skew
import org.apache.spark.sql.functions._

/** Salting utilities: results identical to the unsalted equivalents, and
  * the salted shuffle actually spreads the hot key. */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition automatically (the built-in path next to salting)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one hot key carrying ~90% of the fact side
    val fact = spark.range(0, 200000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val dim = spark.range(0, 200000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = fact.join(dim, "k")
      // execute THIS QueryExecution so AQE finalizes it (count() would
      // plan separately)
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join for splitting:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
  import spark.implicits._

  // one pathological key (90% of rows) + a uniform tail
  private lazy val skewed = spark.range(10000)
    .select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
      (col("id") % 1000).cast("double").as("v"))

  test("saltedJoin == plain join result") {
    val dim = (0L until 100L).map(k => (k, s"name_$k")).toDF("k", "name")
    val plain = skewed.join(dim, "k").groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", buckets = 8)
      .groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("twoPhaseAgg == direct aggregation") {
    val direct = skewed.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val twoPhase = Skew.twoPhaseAgg(
      skewed, col("k"), buckets = 8,
      partial = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      finalAgg = Seq(sum("pn").as("n"), sum("ps").as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(twoPhase == direct)
  }

  test("salt is deterministic (replay-safe): same row -> same bucket") {
    val a = Skew.saltedJoin(skewed, (0L until 100L).map(k => (k, k)).toDF("k", "x"),
      "k", buckets = 8).groupBy("k").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Skew.saltedJoin(skewed, (0L until 100L).map(k => (k, k)).toDF("k", "x"),
      "k", buckets = 8).groupBy("k").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
