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

  private def timing(name: String, sec: Double,
      retryCalib: Option[Double] = None): Bench.QueryTiming =
    Bench.QueryTiming(name, sec, 0.0, 1, sec, None, retryCalib)

  test("assignWindows picks each query's nearest probe; retry_calib wins outright") {
    // probes: hot before q0, STALLED between q1 and q2, hot after q3 —
    // the mid-run stall the run-bracketing formula is blind to
    val probes = Seq(0 -> Bench.CalibRef, 2 -> (Bench.CalibRef * 4), 4 -> Bench.CalibRef)
    val ts = Seq(timing("q0", 1.0), timing("q1", 8.0),
      timing("q2", 8.0), timing("q3", 1.0, retryCalib = Some(Bench.CalibRef * 2)))
    val out = Bench.assignWindows(ts, probes)
    assert(out(0).winCalib == Bench.CalibRef, "q0 nearest = probe at 0")
    assert(out(1).winCalib == Bench.CalibRef * 4, "q1 nearest = stalled probe at 2")
    assert(out(2).winCalib == Bench.CalibRef * 4, "q2 nearest = stalled probe at 2")
    assert(out(3).winCalib == Bench.CalibRef * 2,
      "q3 has its own retry_calib probe — it outranks interleaved probes")
    // normalization arithmetic: the stalled queries divide by 4x, q3 by 2x
    assert(math.abs(out(1).normSec - 2.0) < 1e-9)
    assert(math.abs(out(3).normSec - 0.5) < 1e-9)
    assert(math.abs(out(0).normSec - 1.0) < 1e-9)
    // the per-query-normalized total corrects the stall block only
    val norm = out.map(_.normSec).sum
    assert(math.abs(norm - (1.0 + 2.0 + 2.0 + 0.5)) < 1e-9)
  }

  test("assignWindows with no probes leaves normSec = raw (fallback)") {
    val out = Bench.assignWindows(Seq(timing("q0", 3.0)), Nil)
    assert(out.head.winCalib == 0.0)
    assert(out.head.normSec == 3.0)
  }

  test("timeInventoryCalibrated brackets every chunk with probes and fires the chunk hook") {
    val defs = (0 until 5).map(i => okQuery(s"q$i"))
    val hooks = scala.collection.mutable.ArrayBuffer.empty[Int]
    val run = Bench.timeInventoryCalibrated(spark, "ignored", defs,
      retrySlow = false, probeEvery = 2, chunkHook = hooks += _)
    assert(run.timings.map(_.name) == defs.map(_.name))
    // probes at 0 (pre) and after each chunk of 2: positions 0,2,4,5
    assert(run.probes.map(_._1) == Seq(0, 2, 4, 5))
    assert(run.probes.forall(_._2 > 0))
    assert(hooks.toSeq == Seq(0, 2, 4, 5), "hook fires per chunk + final")
    assert(run.timings.forall(_.winCalib > 0), "every row gets a window probe")
    assert(run.totalNorm > 0 && run.totalRaw > 0)
  }
}
