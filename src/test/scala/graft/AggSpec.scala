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

  test("q_hist_quantile: merged partials ≡ direct histogram; bounds within one bin of exact") {
    import graft.operators.Analytic
    val rows = Analytic.qHistQuantile.fn(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // recompute the scalars exactly as the query does
    val v = Tables.events(spark, sf("sf0.01"))
      .select(col("event_type"), round(col("value") * 1000).cast("long").as("vi"))
    val b = v.agg(min(col("vi")), max(col("vi"))).first()
    val mn = b.getLong(0)
    val w = math.max((b.getLong(1) - mn) / 128 + 1, 1L)
    // (a) the ALL row, derived in the query ONLY from per-type partials,
    // must equal the same derivation over a DIRECT global histogram — the
    // merge loses nothing (bins partition rows)
    val direct = v.select(expr(s"(vi - $mn) div $w").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.orderBy("bucket")))
      .crossJoin(v.agg(count(lit(1)).as("total")))
    val d50 = mn + w * direct.where(col("cum") * 2 >= col("total"))
      .agg(min("bucket")).first().getLong(0)
    val d95 = mn + w * direct.where(col("cum") * 20 >= col("total") * 19)
      .agg(min("bucket")).first().getLong(0)
    assert(rows("ALL") == ((d50, d95)),
      s"merged-partials quantiles ${rows("ALL")} != direct histogram ($d50, $d95)")
    // (b) the bin lower bound brackets the exact percentile within one bin
    val exact = v.agg(
      expr("percentile(vi, 0.5)").as("e50"),
      expr("percentile(vi, 0.95)").as("e95")).first()
    assert(math.abs(exact.getDouble(0) - d50) <= w,
      s"p50 bound $d50 not within one bin ($w) of exact ${exact.getDouble(0)}")
    assert(math.abs(exact.getDouble(1) - d95) <= w,
      s"p95 bound $d95 not within one bin ($w) of exact ${exact.getDouble(1)}")
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
