package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fault-isolation contract of the bench loops (round-10 failure class:
  * one AnalysisException in table warm-up lost ALL 138 numbers for the
  * round). These specs run the factored-out cores ([[Bench.warmTables]],
  * [[Bench.timeInventory]]) with injected failures and pin that a broken
  * loader or query plan costs exactly its own row — the run completes and
  * every other row is intact.
  */
class BenchSpec extends SparkSpec {
  import spark.implicits._

  private def okQuery(name: String): QueryDef =
    QueryDef.rowsOnly(name)((s, _) => {
      import s.implicits._
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    })

  test("warmTables survives a throwing loader and isolates it to that table") {
    val warmed = scala.collection.mutable.ArrayBuffer.empty[String]
    val loader: (SparkSession, String, String) => DataFrame = (s, _, t) =>
      if (t == "events") throw new IllegalStateException("injected loader failure")
      else { warmed += t; Seq((1L, t)).toDF("id", "t") }
    val errs = Bench.warmTables(spark, "/nonexistent-sfdir",
      tables = Seq("region", "events", "nation"), loader = loader)
    assert(errs.map(_._1) == Seq("events"), s"expected only events to fail: $errs")
    assert(errs.head._2.contains("injected loader failure"))
    assert(warmed.toSeq == Seq("region", "nation"),
      s"tables after the failure must still warm: $warmed")
  }

  test("warmTables reports a missing sf dir per table without throwing") {
    val errs = Bench.warmTables(spark, "/nonexistent-sfdir",
      tables = Seq("region", "nation"))
    assert(errs.map(_._1) == Seq("region", "nation"),
      s"both loaders read a missing path and must both report: $errs")
  }

  test("timeInventory isolates a failing query plan to its own row") {
    val defs = Seq(
      okQuery("q_ok_before"),
      // fails at analysis time — the exact round-10 failure class
      QueryDef.rowsOnly("q_broken")((s, _) =>
        s.read.parquet("/nonexistent-sfdir/nope.parquet")),
      okQuery("q_ok_after"))
    val results = Bench.timeInventory(spark, "ignored", defs, retrySlow = false)
    assert(results.map(_.name) == Seq("q_ok_before", "q_broken", "q_ok_after"),
      "every query must produce a row, failures included")
    val byName = results.map(r => r.name -> r).toMap
    assert(byName("q_ok_before").error.isEmpty)
    assert(byName("q_ok_after").error.isEmpty)
    assert(byName("q_broken").error.nonEmpty, "the broken row must carry its error")
    assert(byName("q_broken").attempts == 1, "a failed query must not retry")
    results.foreach(r => assert(r.sec >= 0 && r.median >= 0))
  }

  test("timeInventory survives a query whose fn itself throws (not just the action)") {
    val defs = Seq(
      QueryDef.rowsOnly("q_throws_eagerly")((_, _) =>
        throw new RuntimeException("boom in plan construction")),
      okQuery("q_still_runs"))
    val results = Bench.timeInventory(spark, "ignored", defs, retrySlow = false)
    assert(results.size == 2)
    assert(results.head.error.exists(_.contains("boom")))
    assert(results(1).error.isEmpty)
  }
}
