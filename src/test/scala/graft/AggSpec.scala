package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Bounds the sketch aggregates (q_agg_approx — no DuckDB oracle by
  * design) against the exact queries, plus the stream-static join. */
class AggSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact per group") {
    val approx = Relational.qAggApprox.fn(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_users")).toMap
    val exact = Relational.qAggDistinct.fn(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx=$a exact=$e")
    }
  }

  test("percentile_approx brackets the true median") {
    val approx = Relational.qAggApprox.fn(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p50_v")).toMap
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
