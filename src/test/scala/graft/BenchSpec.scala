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

  test("assignWindows interpolates bracketing probes; retry_calib wins outright") {
    // probes: hot before q0, STALLED between q1 and q2, hot after q3 —
    // the mid-run stall the run-bracketing formula is blind to. Each query
    // sits at position i+0.5 and takes the LINEAR INTERPOLATION of the two
    // probes bracketing it (round 16; nearest-probe had a mid-gap blind
    // spot — a stall boundary inside the gap assigned the wrong side).
    val C = Bench.CalibRef
    val probes = Seq(0 -> C, 2 -> (C * 4), 4 -> C)
    val ts = Seq(timing("q0", 1.0), timing("q1", 8.0),
      timing("q2", 8.0), timing("q3", 1.0, retryCalib = Some(C * 2)))
    val out = Bench.assignWindows(ts, probes)
    // q0 at 0.5 between (0, C) and (2, 4C): C + 3C * 0.25
    assert(math.abs(out(0).winCalib - 1.75 * C) < 1e-12)
    // q1 at 1.5: C + 3C * 0.75
    assert(math.abs(out(1).winCalib - 3.25 * C) < 1e-12)
    // q2 at 2.5 between (2, 4C) and (4, C): 4C - 3C * 0.25
    assert(math.abs(out(2).winCalib - 3.25 * C) < 1e-12)
    assert(out(3).winCalib == C * 2,
      "q3 has its own retry_calib probe — it outranks interleaved probes")
    // normalization arithmetic: factor = max(1, winCalib / CalibRef)
    assert(math.abs(out(0).normSec - 1.0 / 1.75) < 1e-9)
    assert(math.abs(out(1).normSec - 8.0 / 3.25) < 1e-9)
    assert(math.abs(out(2).normSec - 8.0 / 3.25) < 1e-9)
    assert(math.abs(out(3).normSec - 0.5) < 1e-9)
    assert(math.abs(out(1).normFactor - 3.25) < 1e-9)
  }

  test("assignWindows: agreeing bracket probes reduce to the flat window") {
    val C = Bench.CalibRef
    val out = Bench.assignWindows(
      Seq(timing("q0", 2.0), timing("q1", 2.0)),
      Seq(0 -> (C * 3), 2 -> (C * 3)))
    // both probes read 3x degraded: every query in the gap gets exactly 3x
    out.foreach(t => assert(math.abs(t.normFactor - 3.0) < 1e-9))
    // hot run: the >=1 clamp keeps norm == raw even if a probe undershoots
    val hot = Bench.assignWindows(Seq(timing("q0", 2.0)),
      Seq(0 -> (C * 0.5), 1 -> (C * 0.5)))
    assert(hot.head.normSec == 2.0)
    assert(hot.head.normFactor == 1.0)
  }

  test("assignWindows with no probes leaves normSec = raw (fallback)") {
    val out = Bench.assignWindows(Seq(timing("q0", 3.0)), Nil)
    assert(out.head.winCalib == 0.0)
    assert(out.head.normSec == 3.0)
  }

  test("timeInventoryCalibrated brackets every chunk with probes and fires the query hook") {
    val defs = (0 until 5).map(i => okQuery(s"q$i"))
    val hooks = scala.collection.mutable.ArrayBuffer.empty[Int]
    val run = Bench.timeInventoryCalibrated(spark, "ignored", defs,
      retrySlow = false, probeEvery = 2, queryHook = hooks += _)
    assert(run.timings.map(_.name) == defs.map(_.name))
    // probes at 0 (pre) and after each chunk of 2: positions 0,2,4,5
    // (chunks may shrink if a probe reads degraded — then positions are a
    // superset; assert the guaranteed endpoints and monotonicity)
    assert(run.probes.head._1 == 0 && run.probes.last._1 == 5)
    assert(run.probes.map(_._1) == run.probes.map(_._1).sorted)
    assert(run.probes.forall(_._2 > 0))
    // hook fires before EVERY query (global index) + once after the last —
    // per-query granularity lets the degrade drill start/stop mid-gap
    assert(hooks.toSeq == Seq(0, 1, 2, 3, 4, 5))
    assert(run.timings.forall(_.winCalib > 0), "every row gets a window probe")
    assert(run.totalNorm > 0 && run.totalRaw > 0)
  }

  test("tailRemeasure re-runs only >2x-median readings with matching shuffle") {
    val C = Bench.CalibRef
    def t(name: String, sec: Double, shuffleMb: Double) =
      Bench.QueryTiming(name, sec, shuffleMb, 1, sec, None, winCalib = C)
    val defs = Seq(okQuery("q_stalled"), okQuery("q_moved"), okQuery("q_fine"))
    val ref = Map(
      "q_stalled" -> (1.0, 1.0), // stall: 5s reading, shuffle matches -> re-run
      "q_moved" -> (1.0, 50.0),  // 5s reading but shuffle moved -> plan change, keep
      "q_fine" -> (1.0, 1.0))    // inside 2x -> keep
    val out = Bench.tailRemeasure(spark, "ignored",
      Seq(t("q_stalled", 5.0, 1.0), t("q_moved", 5.0, 1.0), t("q_fine", 1.5, 1.0)),
      defs, ref)
    val byName = out.map(r => r.name -> r).toMap
    assert(byName("q_stalled").preTailSec.contains(5.0),
      "the stalled reading must be recorded beside the re-measure")
    assert(byName("q_stalled").sec < 5.0, "the fast re-measure must replace it")
    assert(byName("q_stalled").attempts == 2)
    assert(byName("q_moved").preTailSec.isEmpty && byName("q_moved").sec == 5.0,
      "a shuffle-moved reading is a plan change, not window noise")
    assert(byName("q_fine").preTailSec.isEmpty && byName("q_fine").sec == 1.5)
    // empty reference (first run ever) leaves everything untouched
    assert(Bench.tailRemeasure(spark, "ignored",
      Seq(t("q_stalled", 5.0, 1.0)), defs, Map.empty).head.preTailSec.isEmpty)
    // the in-run attempt median is NEVER rewritten by the tail pass
    // (ADVICE r17: the mutated field no longer meant median)
    assert(byName("q_stalled").median == 5.0,
      "median must stay the in-run reading; the swap lives in pre_tail_sec")
  }

  test("tailRemeasure is symmetric: anomalously fast readings re-run too") {
    val C = Bench.CalibRef
    def t(name: String, sec: Double, shuffleMb: Double) =
      Bench.QueryTiming(name, sec, shuffleMb, 1, sec, None, winCalib = C)
    val defs = Seq(okQuery("q_too_fast"), okQuery("q_small"), okQuery("q_fastmoved"))
    val ref = Map(
      "q_too_fast" -> (2.0, 1.0),  // 0.1s reading vs 2.0 median -> re-run
      "q_small" -> (0.3, 1.0),     // median under 0.5s: jitter, keep
      "q_fastmoved" -> (2.0, 50.0))// fast but shuffle moved -> plan change, keep
    val out = Bench.tailRemeasure(spark, "ignored",
      Seq(t("q_too_fast", 0.1, 1.0), t("q_small", 0.1, 1.0),
        t("q_fastmoved", 0.1, 1.0)), defs, ref)
    val byName = out.map(r => r.name -> r).toMap
    // the fast outlier re-measured: the fresh reading is committed
    // whichever direction it moved, the anomaly recorded beside it
    assert(byName("q_too_fast").preTailSec.contains(0.1))
    assert(byName("q_too_fast").attempts == 2)
    assert(byName("q_too_fast").median == 0.1, "median untouched")
    assert(byName("q_small").preTailSec.isEmpty && byName("q_small").sec == 0.1)
    assert(byName("q_fastmoved").preTailSec.isEmpty)
  }

  test("loadRef parses the artifact format; loadRefMedians medians across runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-ref")
    def write(name: String, norm: Double, shuffle: Double): Unit =
      java.nio.file.Files.writeString(dir.resolve(name),
        s"""{
  "queries": {
  "q_x": {"sec": ${norm * 2}, "norm_sec": $norm, "norm_factor": 2.000, "win_calib": 0.1, "median": 1.0, "shuffle_mb": $shuffle, "attempts": 1}
  }
}
""")
    write("per_query_1.json", 1.0, 4.0)
    write("per_query_2.json", 3.0, 5.0)
    write("per_query_3.json", 100.0, 6.0)
    val one = Bench.loadRef(s"$dir/per_query_2.json")
    assert(one == Map("q_x" -> (3.0, 5.0)))
    // median is robust to the one stalled artifact (100.0)
    assert(Bench.loadRefMedians(dir.toString) == Map("q_x" -> (3.0, 5.0)))
    assert(Bench.loadRef(s"$dir/absent.json").isEmpty)
    assert(Bench.loadRefMedians(s"$dir/absent").isEmpty)
  }
}
