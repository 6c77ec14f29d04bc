package graft

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** State FLATNESS under input growth — the scale face of the per-pair
  * state-size pins in StreamingSpec. Those pins assert `rows <= bound`
  * at one input size; a linear-in-input state leak could hide under a
  * generous bound. These cases run the same query at N and 10N input
  * rows (or 10x longer history) and assert the state footprint does not
  * grow — the claim SURVEY §2.C actually makes: state is a function of
  * (watermark window, groups, bins), never of input volume. Three
  * contrasting state shapes:
  *
  *   1. built-in windowed aggregation (hop window): state = open
  *      windows; 10x event DENSITY in the same time span leaves the
  *      final state identical while 10x the data flows through;
  *   2. `dropDuplicatesWithinWatermark`: state = keys seen within the
  *      watermark delay; 10x longer HISTORY (10x rows) leaves the max
  *      resident state under the same 2-window constant and the
  *      post-eviction state identical;
  *   3. the persisted incremental state (`StreamHistQuantile` through
  *      `IncrementalAgg`): stored rows = |groups| x |bins| exactly,
  *      whether fed 10x the rows or fed in 10 separate micro-batches.
  */
class StateScaleSpec extends SparkSpec {
  import spark.implicits._

  // stateRowsNow / maxStateRows come from SparkSpec (shared with
  // StreamingSpec's per-pair bound pins)

  /** Feed `n` events uniformly over ONE fixed hour (4 event types), close
    * every data window with two far-future sentinels, return (final state
    * rows, sum of emitted counts). Identical time span and chunk count at
    * every `n`, so the watermark trajectory — and therefore the final
    * state — must match across densities. */
  private def runHop(n: Int): (Long, Long) = {
    val input = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val name = s"hopscale$n"
    val q = StreamHopWindow.hopAgg(input.toDF().toDF("ts", "event_type", "value"))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    val base = 1700000000000L
    val evts = (0 until n).map { i =>
      (new java.sql.Timestamp(base + i.toLong * 3600 * 1000 / n), s"t${i % 4}", 1.0)
    }
    evts.grouped(n / 4).foreach { c => input.addData(c); q.processAllAvailable() }
    // sentinels past every data window's end (+1h window + delay): all
    // data windows emit and evict; only sentinel windows may stay open
    input.addData((new java.sql.Timestamp(base + 4L * 3600 * 1000), "__wm__", 0.0))
    q.processAllAvailable()
    input.addData((new java.sql.Timestamp(base + 6L * 3600 * 1000), "__wm__", 0.0))
    q.processAllAvailable()
    val st = stateRowsNow(q)
    val emitted = spark.table(name).where(col("event_type") =!= "__wm__")
      .agg(sum("cnt")).as[Long].head()
    q.stop()
    (st, emitted)
  }

  test("hop window: 10x event density, identical final state") {
    val (stA, outA) = runHop(120)
    val (stB, outB) = runHop(1200)
    // each event lands in 4 hop windows (1h window, 15m step), and the
    // sentinels closed them all — proof the 10x data actually flowed
    assert(outA == 4L * 120, s"run A emitted $outA")
    assert(outB == 4L * 1200, s"run B emitted $outB")
    info(s"hop state: n=120 -> $stA rows, n=1200 -> $stB rows")
    assert(stB == stA,
      s"state grew with input density: $stA -> $stB at identical windows")
  }

  /** `windows` bursts of the same K payloads (3 redeliveries each), 30 s
    * apart under a 10 s watermark delay: at any instant at most the last
    * two bursts' keys are resident. Returns (max observed state, state
    * after a far-future sentinel evicts everything). */
  private def runDedup(windows: Int): (Long, Long) = {
    val K = 6
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val name = s"dedupscale$windows"
    val q = StatefulOps.dedupWithinWatermark(
        input.toDF().toDF("event_time", "payload"), "10 seconds")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    (0 until windows).foreach { w =>
      val burst = (0 until K).flatMap(k =>
        Seq.fill(3)((ts(w * 30L + k), s"k$k")))
      input.addData(burst); q.processAllAvailable()
    }
    val maxSt = maxStateRows(q)
    // sentinel far past every entry's expiry: everything but it evicts
    input.addData((ts(windows * 30L + 100000L), "__wm__"))
    q.processAllAvailable()
    input.addData((ts(windows * 30L + 200000L), "__wm2__"))
    q.processAllAvailable()
    val finalSt = stateRowsNow(q)
    q.stop()
    (maxSt, finalSt)
  }

  test("watermark dedup: 10x longer history, same resident-state ceiling") {
    val (maxA, finA) = runDedup(5)   // 90 rows fed
    val (maxB, finB) = runDedup(50)  // 900 rows fed
    info(s"dedup max state: 5 windows -> $maxA, 50 windows -> $maxB (ceiling 13)")
    // at most last-burst + not-yet-evicted-previous-burst keys resident
    // (2 x K), +1 for a sentinel row: history length must not show up
    assert(maxA <= 13, s"run A max state $maxA exceeds 2K+1")
    assert(maxB <= 13, s"run B max state $maxB grew with history length")
    assert(finB == finA,
      s"post-eviction state differs with history: $finA vs $finB")
  }

  test("hist-quantile persisted state is |groups| x |bins|, flat across 10x rows") {
    // values 0..99 per 4 groups, mn=0 w=8 -> buckets 0..12: exactly
    // 4 x 13 = 52 stored bin rows at ANY row count and batch split
    def run(n: Int, batches: Int): Long = {
      val root = Files.createTempDirectory(s"histscale-$n-$batches").toString
      val per = n / batches
      (0 until batches).foreach { b =>
        val rows = spark.range(b.toLong * per, (b + 1).toLong * per).select(
          concat(lit("g"), col("id") % 4).as("grp"),
          (col("id") % 100).as("vi"))
        StreamHistQuantile.applyBatch(rows, b.toLong, root,
          col("grp"), col("vi"), mn = 0L, w = 8L)
      }
      IncrementalAgg.state(spark, root).map(_.count()).getOrElse(0L)
    }
    val a = run(400, 1)
    val b = run(4000, 1)
    val c = run(4000, 10) // merged across 10 micro-batches: still no growth
    info(s"hist state rows: 400x1 -> $a, 4000x1 -> $b, 4000x10 -> $c")
    assert(a == 52L && b == 52L && c == 52L,
      s"stored bins not flat: $a / $b / $c (expected 52 = 4 groups x 13 bins)")
  }
}
