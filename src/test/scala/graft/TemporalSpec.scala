package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

/** Semantics + plan shape for the temporal suite. Value-level parity is the
  * DuckDB oracle's job; these pin the semantics the oracle can't (as-of
  * pick rules, session boundaries) and the 100 TB plan contract (no
  * nested-loop joins for the inequality predicates). */
class TemporalSpec extends SparkSpec {

  test("as-of join: every purchase matches the latest click at-or-before it") {
    val rows = Temporal.qAsofJoin.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    // brute-force oracle in memory at sf0.001
    val e = Tables.events(spark, sf())
      .where(col("event_type").isin("click", "purchase"))
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("ts")))
    val clicks = e.filter(_._3 == "click")
    rows.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val pts = r.getAs[java.sql.Timestamp]("ts")
      val expect = clicks.filter(c => c._2 == uid && !c._4.after(pts))
        .sortBy(c => (c._4.getTime, c._1)).lastOption
      (expect, Option(r.getAs[java.lang.Long]("click_id"))) match {
        case (Some(c), Some(got)) => assert(got == c._1,
          s"purchase ${r.getAs[Long]("purchase_id")}: expected click ${c._1}, got $got")
        case (None, None) => // no preceding click, null row — correct
        case (exp, got) => fail(s"purchase ${r.getAs[Long]("purchase_id")}: $exp vs $got")
      }
    }
  }

  test("forward as-of: every click matches the earliest strictly-later purchase") {
    val rows = Temporal.qAsofForward.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    val e = Tables.events(spark, sf())
      .where(col("event_type").isin("click", "purchase"))
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("ts")))
    val purchases = e.filter(_._3 == "purchase")
    rows.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val cts = r.getAs[java.sql.Timestamp]("ts")
      val expect = purchases.filter(p => p._2 == uid && p._4.after(cts))
        .sortBy(p => (p._4.getTime, p._4.getNanos, p._1)).headOption
      (expect, Option(r.getAs[java.lang.Long]("purchase_id"))) match {
        case (Some(p), Some(got)) => assert(got == p._1,
          s"click ${r.getAs[Long]("click_id")}: expected purchase ${p._1}, got $got")
        case (None, None) => // trailing click with no later purchase — correct
        case (exp, got) => fail(s"click ${r.getAs[Long]("click_id")}: $exp vs $got")
      }
    }
  }

  test("as-of join plans as one window pass, not a nested-loop theta-join") {
    val df = Temporal.qAsofJoin.fn(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"as-of join fell back to a quadratic join:\n$p")
    assert(p.contains("Window"), s"expected the window formulation:\n$p")
  }

  test("range join: bucketed equi-join matches brute force, no BNLJ") {
    val df = Temporal.qRangeJoin.fn(spark, sf())
    val got = df.collect().map(r =>
      r.getAs[Long]("eid") -> r.getAs[Long]("n_prior")).toMap
    val evs = Tables.events(spark, sf())
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("us")))
    val acts = evs.filter(x => x._3 == "click" || x._3 == "view")
    val expect = evs.filter(_._3 == "error").flatMap { er =>
      val n = acts.count(a => a._2 == er._2 &&
        a._4 >= er._4 - 3600000000L && a._4 < er._4)
      if (n > 0) Some(er._1 -> n.toLong) else None
    }.toMap
    assert(got == expect, s"range join mismatch: got ${got.size}, expect ${expect.size}")
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"range join fell back to a quadratic join:\n$p")
  }

  test("sessionize: 30-min gaps split sessions, bounds and counts consistent") {
    val rows = Temporal.qSessionize.fn(spark, sf()).collect()
    val total = Tables.events(spark, sf()).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total,
      "every event must land in exactly one session")
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("session_seq"))
      // session_seq is 1..n dense per user
      assert(sorted.map(_.getAs[Long]("session_seq")).toSeq ==
        (1L to sorted.length).toSeq)
      sorted.foreach { s0 =>
        assert(!s0.getAs[java.sql.Timestamp]("session_start")
          .after(s0.getAs[java.sql.Timestamp]("session_end")))
      }
      // consecutive sessions are separated by more than the 30-min gap
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gapMs = b.getAs[java.sql.Timestamp]("session_start").getTime -
            a.getAs[java.sql.Timestamp]("session_end").getTime
          assert(gapMs > 30 * 60 * 1000L, s"sessions closer than the gap: $gapMs ms")
        case _ =>
      }
    }
  }

  test("hop window: every event lands in exactly window/slide = 4 windows") {
    val rows = Temporal.qHopWindow.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    // the DuckDB oracle's floor-division hop enumeration was only validated
    // on positive epochs (Temporal.scala q_hop_window caveat): fail loudly
    // if a future testdata generation introduces pre-1970 timestamps
    val minTs = Tables.events(spark, sf())
      .agg(org.apache.spark.sql.functions.min("ts")).head.getTimestamp(0)
    assert(minTs.getTime >= 0L,
      s"events.ts has pre-epoch rows (min=$minTs); re-validate the hop-window oracle")
    val nEvents = Tables.events(spark, sf()).count()
    val totalAssignments = rows.map(_.getAs[Long]("cnt")).sum
    assert(totalAssignments == 4 * nEvents,
      s"expected 4x replication, got $totalAssignments for $nEvents events")
    // window starts sit on the 15-minute hop grid, and each window's events
    // all fall inside [start, start + 1h)
    rows.foreach { r =>
      val startMs = r.getAs[java.sql.Timestamp]("win_start").getTime
      assert(startMs % (15 * 60 * 1000L) == 0, s"off-grid window start $startMs")
    }
  }
}
