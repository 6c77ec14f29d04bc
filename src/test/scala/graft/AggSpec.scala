package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Bounds the sketch aggregates (q_agg_approx — oracle-gated since round 8
  * via Spark-side error-bound booleans) against the exact queries, plus the
  * stream-static join. */
class AggSpec extends SparkSpec {
  import spark.implicits._

  test("q_agg_approx error-bound booleans hold and n_exact matches exact query") {
    val rows = Relational.qAggApprox.fn(spark, sf("sf0.01")).collect()
    rows.foreach { r =>
      val k = r.getString(0)
      assert(r.getAs[Boolean]("approx_users_ok"), s"$k: HLL estimate off >5%")
      assert(r.getAs[Boolean]("p50_ok"), s"$k: p50 rank outside [0.45,0.55]")
      assert(r.getAs[Boolean]("p99_ok"), s"$k: p99 rank outside [0.97,1.0]")
    }
    val exact = Relational.qAggDistinct.fn(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") == exact(r.getString(0)))
    }
  }

  test("percentile_approx brackets the true median") {
    val approx = Tables.events(spark, sf("sf0.01"))
      .groupBy("event_type")
      .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.events(spark, sf("sf0.01"))
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) / math.max(e.abs, 1.0) <= 0.05,
        s"$k: approx=${approx(k)} exact=$e")
    }
  }

  test("stream-static enrichment join broadcasts the dim side") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)](spark)
    val stream = input.toDF().toDF("user_id", "payload")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = graft.streaming.MsgPipeline.enrich(stream, dim, Seq("user_id"))
      .writeStream.outputMode("append").format("memory").queryName("enriched").start()
    input.addData((1L, "a"), (2L, "b"), (3L, "c"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("enriched").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)).getOrElse("none"))).toSet
    assert(out == Set((1L, "gold"), (2L, "basic"), (3L, "none")))
  }
}
