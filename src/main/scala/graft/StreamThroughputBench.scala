package graft

import java.util.concurrent.atomic.LongAdder
import graft.operators.CodecQueries
import graft.sources.{MessageSource, MsgBroker}
import graft.streaming.{BatchedSink, MetricSink, MsgPipeline, Transport}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-node streaming THROUGHPUT benchmark over the reference's deployed
  * topology — the one number the batch benches cannot produce.
  *
  * The reference is a streaming engine (`DataStreamProcessingJob.java`):
  * 3-topic Pulsar fan-in (`run_datastream_job.sh:17,25`), fixed-width parse,
  * side-output fan-out, count-or-time batched sinks (1000 msgs / 5 s,
  * `:157-158`), 5 s EXACTLY_ONCE checkpoints (`:104-112`), parallelism 16
  * (`run_datastream_job.sh:25`). It publishes no throughput numbers
  * (BASELINE.md), so this bench RECORDS ours under the same topology:
  *
  *   - leg `fanout` — the full reference dataflow: DSv2 broker source
  *     (3 topics × 8 partitions, checkpoint-coupled ack) → guard+parse →
  *     one-pass fan-out → BatchedSink (1000/5 s thresholds) + per-batch
  *     delay aggregate. Every micro-batch commits its offsets — a STRICTER
  *     checkpoint cadence than the reference's 5 s interval.
  *   - leg `stateful` — the same source and parse feeding the watermarked
  *     10 s-window delay aggregate ([[MetricSink.windowedAvg]]) on the
  *     RocksDB state store: prices the stateful path the reference runs as
  *     a remote AVG (`ZhiYanSink.java:106`).
  *   - leg `latency` — sink-visible delay percentiles under a paced
  *     publisher (see [[runLatencyLeg]]): the reference's monitored
  *     `msg_delay` metric, measured end-to-end.
  *
  * Exactly-once accounting is asserted, not assumed: the count of records
  * entering the sink must equal the published session-message count — a
  * replayed or dropped batch fails the run. Three rates per leg:
  * `rows_per_sec` (wall-clock, includes planning + checkpoint I/O),
  * `engine_rows_per_sec` (Σ inputRows / Σ trigger-execution, excludes
  * inter-batch idle), and the headline `steady_rows_per_sec` (median of
  * per-batch rates — robust to the sandbox's contiguous stall windows the
  * way Bench's min-of-attempts is). The host-speed calibration probe
  * (BASELINE.md round 12+) brackets the run; normalization uses the BETTER
  * bracket reading so a window that degrades at one end doesn't overstate
  * hot-host throughput.
  *
  * Scale shape: the source is partition-parallel (24 input partitions →
  * local[32] threads; a cluster scales by adding broker partitions and
  * executors — nothing here is driver-bound: publish happens before the
  * clock starts, sinks run `foreachPartition` on executors, the per-batch
  * metric collect is a 1-row aggregate).
  *
  * Usage: `runMain graft.StreamThroughputBench [sfDir]`; env
  * `GRAFT_STREAM_MSGS` (default 2,000,000), `GRAFT_STREAM_JSON`
  * (default `bench_stream_r13.json`).
  */
object StreamThroughputBench {

  /** GRAFT_ROCKSDB_CHANGELOG normalized ONCE to "true"/"false": the value
    * feeds both a boolean Spark conf (which throws on "0") and a raw JSON
    * field (which any other spelling would corrupt). "0"/"false"/"off"/"no"
    * disable; everything else — including unset — keeps the measured-win
    * default ON. */
  private val ChangelogEnabled: String = {
    val v = sys.env.getOrElse("GRAFT_ROCKSDB_CHANGELOG", "true").trim.toLowerCase
    if (Set("0", "false", "off", "no").contains(v)) "false" else "true"
  }

  /** Same-JVM (local-mode) sink accounting: executors add, driver reads. */
  private val bulkPosts = new LongAdder

  private class CountingTransport extends Transport {
    override def send(payload: String): Unit = bulkPosts.increment()
  }

  final case class LegResult(
      name: String,
      msgs: Long,
      wallSec: Double,
      batches: Int,
      engineRowsPerSec: Double,
      steadyRowsPerSec: Double,
      batchMs: Seq[Long],
      deliveredLines: Long,
      posts: Long,
      stateProfile: String = "") {
    def rowsPerSec: Double = if (wallSec > 0) msgs / wallSec else 0.0
  }

  /** Where a stateful leg's time actually goes: per-run sums of the
    * trigger-phase durations and the state-store operator metrics over the
    * non-empty batches — the attribution that separates store I/O
    * (state_commit_ms), per-key update work (state_update_ms / rows),
    * watermark eviction (state_removal_ms), and micro-batch overhead
    * (wal_commit + commit_offsets + planning) from the data-plane cost
    * (add_batch minus the store times). Emitted into the leg JSON so the
    * floor is measured, not guessed. */
  private[graft] def statefulProfile(q: org.apache.spark.sql.streaming.StreamingQuery): String = {
    val ps = q.recentProgress.filter(_.numInputRows > 0)
    def phase(k: String): Long =
      ps.flatMap(p => Option(p.durationMs.get(k)).map(_.toLong)).sum
    val ops = ps.flatMap(_.stateOperators)
    s"""{"trigger_ms": ${phase("triggerExecution")}, """ +
      s""""add_batch_ms": ${phase("addBatch")}, """ +
      s""""wal_commit_ms": ${phase("walCommit")}, """ +
      s""""commit_offsets_ms": ${phase("commitOffsets")}, """ +
      s""""planning_ms": ${phase("queryPlanning")}, """ +
      s""""state_commit_ms": ${ops.map(_.commitTimeMs).sum}, """ +
      s""""state_update_ms": ${ops.map(_.allUpdatesTimeMs).sum}, """ +
      s""""state_removal_ms": ${ops.map(_.allRemovalsTimeMs).sum}, """ +
      s""""state_rows_updated": ${ops.map(_.numRowsUpdated).sum}, """ +
      s""""state_rows_last": ${ps.lastOption.flatMap(_.stateOperators.headOption)
        .map(_.numRowsTotal).getOrElse(0L)}, """ +
      s""""state_mem_last_bytes": ${ps.lastOption.flatMap(_.stateOperators.headOption)
        .map(_.memoryUsedBytes).getOrElse(0L)}}"""
  }

  /** The pipeline's routing predicate, producer-side: the same test
    * `MsgCodec.guard` + `isSession(parseModule(...))` applies row-side, so
    * the exactly-once accounting can never diverge from routing. */
  def isSessionMsg(m: String): Boolean =
    m.length > graft.operators.MsgCodec.HeaderLen &&
      m.substring(0, graft.operators.MsgCodec.FieldLen).trim == "session"

  /** Publish `n` messages round-robin across fresh brokers for `topics`
    * (3-topic fan-in, 8 partitions each — the deployed topology at the
    * bench's core count). Returns the published session-message count (the
    * fan-out's expected sink-visible lines). Cycling the base corpus reuses
    * string references, so broker memory is O(base), not O(n). */
  def publishCorpus(base: Array[String], topics: Seq[String], n: Long): Long = {
    val brokers = topics.map(t => MsgBroker.create(t, numPartitions = 8))
    var sessions = 0L
    var i = 0L
    while (i < n) {
      val m = base(((i % base.length)).toInt)
      if (isSessionMsg(m)) sessions += 1
      brokers((i % brokers.length).toInt).publish(m)
      i += 1
    }
    sessions
  }

  /** Publish `n` messages with MONOTONE synthetic event time (`stepMs`
    * apart), module/tail taken from the corpus, send_ts re-stamped. The
    * stateful leg needs this: cycling the raw corpus pins event time to
    * its fixed range, so from the second cycle on every row falls below
    * the 1-minute watermark and the leg would price late-row DROPPING,
    * not state maintenance. Monotone time means every row reaches the
    * store and windows close (eviction exercised) as the watermark
    * advances through the leg. */
  def publishMonotone(base: Array[String], topics: Seq[String], n: Long,
      startMs: Long, stepMs: Long = 10L): Long = {
    val brokers = topics.map(t => MsgBroker.create(t, numPartitions = 8))
    val h = graft.operators.MsgCodec.HeaderLen
    var sessions = 0L
    var i = 0L
    while (i < n) {
      val src = base(((i % base.length)).toInt)
      val m = wireMsg(src.substring(0, graft.operators.MsgCodec.FieldLen).trim,
        startMs + i * stepMs, src.substring(h))
      if (isSessionMsg(m)) sessions += 1
      brokers((i % brokers.length).toInt).publish(m)
      i += 1
    }
    sessions
  }

  /** (batches, engine rate = Σrows/Σexec, steady rate = median of per-batch
    * rates, per-batch exec ms). The median rate is the stall-robust number:
    * the sandbox's documented CPU-starvation windows inflate a contiguous
    * run of batches (PERF_NOTES), which a median ignores but any total —
    * wall or engine — absorbs. The streaming analog of Bench's
    * min-of-attempts methodology. */
  private[graft] def progressStats(q: org.apache.spark.sql.streaming.StreamingQuery): (Int, Double, Double, Seq[Long]) = {
    val ps = q.recentProgress.filter(_.numInputRows > 0)
    val rows = ps.map(_.numInputRows).sum
    val perBatch = ps.toSeq.flatMap(p =>
      Option(p.durationMs.get("triggerExecution")).map(ms =>
        (p.numInputRows, ms.toLong)))
    val batchMs = perBatch.map(_._2)
    val execMs = batchMs.sum
    val rates = perBatch.collect { case (r, ms) if ms > 0 => r * 1000.0 / ms }.sorted
    val steady = if (rates.isEmpty) 0.0 else rates(rates.size / 2)
    (ps.length, if (execMs > 0) rows * 1000.0 / execMs else 0.0, steady, batchMs)
  }

  /** The reference dataflow, timed end-to-end: source → parse → fan-out →
    * batched sink + per-batch delay aggregate. */
  def runFanoutLeg(spark: SparkSession, topics: Seq[String], n: Long,
      perTrigger: Long, ckpt: String, name: String = "fanout"): LegResult = {
    bulkPosts.reset()
    val sink = new BatchedSink(() => new CountingTransport, batchNum = 1000, batchTimeSec = 5)
    // record-exact sink accounting (line counts would miscount payloads
    // with embedded newlines): every record entering the sink increments
    val sunk = spark.sparkContext.longAccumulator(s"$name-sunk")
    val src = MessageSource.brokerStream(spark, topics.mkString(","), Some(perTrigger))
    val t0 = System.nanoTime()
    val q = MsgPipeline.runFanOut(
      src, ckpt, () => CodecQueries.NowMs,
      (ds, id) => { import ds.sparkSession.implicits._
        // count on the ACTION side (one add per partition inside the
        // foreachPartition drain): result-stage accumulator updates apply
        // once per partition across task retries/speculation, where a
        // transformation-side `ds.map(add)` double-counts a retried task
        // and fails the strict delivered==published require below (ADVICE
        // r13). The count still meters records ENTERING the transport.
        ds.map(_ + "\n").foreachPartition { (it: Iterator[String]) =>
          var c = 0L
          sink.writePartition(it.map { s => c += 1; s })
          sunk.add(c)
        } },
      // the ZhiYan-shape report: one 1-row aggregate per micro-batch
      (df, _) => { df.agg(count(lit(1)), avg("delay_ms")).collect(); () })
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val (batches, engineRate, steady, batchMs) = progressStats(q)
    q.stop()
    LegResult(name, n, wall, batches, engineRate, steady, batchMs,
      sunk.value, bulkPosts.sum())
  }

  /** The stateful path: watermarked 10 s tumbling delay windows on RocksDB,
    * update-mode, counted (not stored) per micro-batch. */
  def runStatefulLeg(spark: SparkSession, topics: Seq[String], n: Long,
      perTrigger: Long, ckpt: String, name: String = "stateful"): LegResult = {
    // RocksDB for the timed query only (the scale-path store); restore the
    // caller's provider after — a shared test session must not inherit it
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val partsKey = "spark.sql.shuffle.partitions"
    val prevProvider = spark.conf.getOption(providerKey)
    val prevChangelog = spark.conf.getOption(changelogKey)
    val prevParts = spark.conf.getOption(partsKey)
    graft.streaming.StatefulOps.useRocksDbStateStore(spark)
    // changelog checkpointing: per-batch durability = the delta file, not a
    // full RocksDB snapshot upload (the r14 experiment knob; default ON —
    // measured win, see PERF_NOTES; GRAFT_ROCKSDB_CHANGELOG=0 to compare)
    spark.conf.set(changelogKey, ChangelogEnabled)
    // state-store COUNT tracks the state, not the core count: the r14
    // state_profile measured per-store COMMIT fixed cost dominating the
    // leg (32 stores × 20 batches ≈ 640 commits for ~7 live window rows —
    // state_commit_ms ~80× state_update_ms). The stateful agg's partials
    // are map-side combined at full parallelism BEFORE this exchange, so
    // fewer final partitions shrink commit count without starving the
    // scan stage. Auto-sized in-engine since r16
    // (StatefulOps.statePartitionsFor over the trigger's row cap — the
    // upper bound on changed keys per batch); GRAFT_STATE_PARTITIONS
    // still overrides for sweeps.
    val autoStores = graft.streaming.StatefulOps.statePartitionsFor(perTrigger)
    spark.conf.set(partsKey,
      sys.env.getOrElse("GRAFT_STATE_PARTITIONS", autoStores.toString))
    System.err.println(s"[stb] stateful leg state partitions: " +
      s"${spark.conf.get(partsKey)} (auto rule: $autoStores)")
    try {
      val windowRows = new LongAdder
      val src = MessageSource.brokerStream(spark, topics.mkString(","), Some(perTrigger))
      val win = MetricSink.windowedAvg(
        MsgPipeline.delayStream(MsgPipeline.parse(src), CodecQueries.NowMs))
      val t0 = System.nanoTime()
      val q = win.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) => windowRows.add(b.count()); () }
        .start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val (batches, engineRate, steady, batchMs) = progressStats(q)
      val profile = statefulProfile(q)
      q.stop()
      LegResult(name, n, wall, batches, engineRate, steady, batchMs,
        windowRows.sum(), 0L, profile)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
      prevChangelog match {
        case Some(p) => spark.conf.set(changelogKey, p)
        case None => spark.conf.unset(changelogKey)
      }
      prevParts match {
        case Some(p) => spark.conf.set(partsKey, p)
        case None => spark.conf.unset(partsKey)
      }
    }
  }

  final case class LatencyResult(
      rate: Long, durationSec: Int, msgs: Long, batches: Int,
      meanMs: Double, p50Ms: Long, p95Ms: Long, maxMs: Long)

  /** Driver-side wire formatting — the PRODUCER's view of the layout the
    * Column-side [[graft.operators.MsgCodec.mkMsg]] builds (FIXTURES.md §A);
    * the latency leg's round-trip through the real parse keeps the two
    * honest against each other. */
  def wireMsg(module: String, sendTsMs: Long, tail: String): String = {
    def pad16(s: String) =
      if (s.length >= 16) s.substring(0, 16) else s + (" " * (16 - s.length))
    pad16(module) + pad16(sendTsMs.toString) + (" " * 32) + tail
  }

  /** Sink-visible latency under a PACED publisher — the reference's
    * monitored `msg_delay` metric (`ZhiYanSink.java:106`, delay computed at
    * `DataStreamProcessingJob.java:58-63`) measured for this engine: each
    * message is stamped with wall-clock send_ts at publish; the running
    * fan-out computes delay_ms against per-batch wall-clock "now". The
    * publisher paces BELOW measured capacity, so this prices the
    * micro-batch pipeline's latency floor, not queueing under overload.
    * Percentiles are over per-batch MAX delay — the SLA-relevant tail. */
  def runLatencyLeg(spark: SparkSession, topics: Seq[String],
      ratePerSec: Long, durationSec: Int, ckpt: String): LatencyResult = {
    val brokers = topics.map(t => MsgBroker.create(t, numPartitions = 8))
    val perBatch = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Long)]
    bulkPosts.reset()
    val sink = new BatchedSink(() => new CountingTransport, batchNum = 1000, batchTimeSec = 5)
    // no admission cap: each trigger drains what arrived since the last one
    val src = MessageSource.brokerStream(spark, topics.mkString(","))
    val q = MsgPipeline.runFanOut(
      src, ckpt, () => System.currentTimeMillis(),
      (ds, id) => { import ds.sparkSession.implicits._; sink.write(ds.map(_ + "\n"), id) },
      (df, _) => {
        val r = df.agg(count(lit(1)), avg("delay_ms"), max("delay_ms")).collect()(0)
        if (!r.isNullAt(1)) perBatch.add((r.getLong(0), r.getDouble(1), r.getLong(2)))
      })
    val total = ratePerSec * durationSec
    val t0 = System.nanoTime()
    var sent = 0L
    while (sent < total) {
      // publish whatever is due at this instant, then yield
      val due = math.min(total, ((System.nanoTime() - t0) / 1e9 * ratePerSec).toLong)
      while (sent < due) {
        brokers((sent % brokers.length).toInt)
          .publish(wireMsg("session", System.currentTimeMillis(), "{\"seq\":" + sent + "}"))
        sent += 1
      }
      Thread.sleep(10)
    }
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val b = perBatch.asScala.toSeq
    val msgs = b.map(_._1).sum
    val mean = if (msgs > 0) b.map(x => x._1 * x._2).sum / msgs else 0.0
    val maxes = b.map(_._3).sorted
    def pct(p: Double): Long =
      if (maxes.isEmpty) 0L else maxes(math.min(maxes.size - 1, (p * maxes.size).toInt))
    LatencyResult(ratePerSec, durationSec, msgs, b.size, mean,
      pct(0.5), pct(0.95), maxes.lastOption.getOrElse(0L))
  }

  private def num(v: Double, dp: Int): String = Bench.num(v, dp)

  private def legJson(r: LegResult): String =
    s"""{"msgs": ${r.msgs}, "wall_sec": ${num(r.wallSec, 3)}, """ +
      s""""rows_per_sec": ${num(r.rowsPerSec, 0)}, """ +
      s""""engine_rows_per_sec": ${num(r.engineRowsPerSec, 0)}, """ +
      s""""steady_rows_per_sec": ${num(r.steadyRowsPerSec, 0)}, """ +
      s""""batches": ${r.batches}, "batch_ms": [${r.batchMs.mkString(", ")}], """ +
      (if (r.stateProfile.nonEmpty) s""""state_profile": ${r.stateProfile}, """ else "") +
      s""""delivered": ${r.deliveredLines}, "posts": ${r.posts}}"""

  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_CPUS already layers in via GraftConfig.load (env beats
    // defaults); the tuned trio (pageSize/cleaner/tmpfs) comes from the one
    // shared place, Bench.tunedBuilder
    val cfg = GraftConfig.load(args,
      defaults = GraftConfig.Default.copy(parallelism = 32))
    val n = sys.env.getOrElse("GRAFT_STREAM_MSGS", "2000000").toLong
    val spark = Bench.tunedBuilder("graft-stream-bench", cfg)
      // default progress retention is 100; a small GRAFT_STREAM_TRIGGER
      // yields hundreds of batches and silent stat truncation without this
      .config("spark.sql.streaming.numRecentProgressUpdates", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the fixed-width parse path touches collation-aware string ops; pay
    // ICU's slow <clinit> before any timing (see Bench for the profile)
    Class.forName("org.apache.spark.sql.catalyst.util.CollationAwareUTF8String")

    // checkpoints on tmpfs: the per-batch offset/commit WAL writes are on
    // the timed path, and the sandbox disk has multi-second write-burst
    // stalls (PERF_NOTES) that would price the disk, not the engine. A
    // production deployment puts this WAL on HDFS/S3 and pays its real
    // latency knowingly.
    val ckptBase = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-graft"), "stb-ckpt")
    java.nio.file.Files.createDirectories(ckptBase)
    def tmp(tag: String): String =
      java.nio.file.Files.createTempDirectory(ckptBase, tag).toString

    // base corpus: the events-derived wire format at the bench SF
    val base = CodecQueries.rawMessages(spark, cfg.sfDir)
      .select("value").collect().map(_.getString(0))
    require(base.nonEmpty, s"empty corpus from ${cfg.sfDir}")

    Bench.calibProbe(spark) // JIT-warm the probe before the first reading
    val calibPre = Bench.calibrate(spark)

    // untimed warmup: JIT the parse expressions, sink path, DSv2 planning;
    // topics removed after, like the timed legs — warmup corpora must not
    // sit on the heap through the measured window
    val warmN = math.min(100000L, n)
    val warmT = Seq("stb-w0", "stb-w1", "stb-w2")
    publishCorpus(base, warmT, warmN)
    runFanoutLeg(spark, warmT, warmN,
      perTrigger = math.max(warmN / 4, 1), ckpt = tmp("warm"), name = "warmup")
    warmT.foreach(MsgBroker.remove)
    val warmS = Seq("stb-x0", "stb-x1", "stb-x2")
    publishCorpus(base, warmS, warmN)
    runStatefulLeg(spark, warmS, warmN,
      perTrigger = math.max(warmN / 4, 1), ckpt = tmp("warmstate"), name = "warmup")
    warmS.foreach(MsgBroker.remove)

    // Min-of-attempts per leg (the Bench methodology, PERF_NOTES round 5):
    // measured runs show the sandbox's ~minute-scale stall windows sweeping
    // across whichever leg is executing — a single pass rarely lands all
    // three legs clean. Each leg runs on fresh topics + checkpoint per
    // attempt; a CLEAN attempt (tight per-batch spread) stops early,
    // otherwise best-of-3 by the leg's own score.
    val Attempts = 3
    def cleanBatches(batchMs: Seq[Long]): Boolean = batchMs.size > 1 && {
      // first batch excluded: it legitimately pays one-time open costs
      // (RocksDB store load, first-plan codegen) even in a quiet window
      val sorted = batchMs.drop(1).sorted
      sorted.last <= 2.5 * math.max(1L, sorted(sorted.size / 2))
    }
    def bestOf[T](name: String)(run: Int => T)(score: T => Double, clean: T => Boolean): T = {
      // selection is MAX SCORE across attempts: a stall window can only
      // deflate a per-batch-median rate (or inflate a latency p95), never
      // the reverse, so the best score is always the honest reading. The
      // clean flag only gates early-stopping, and a UNIFORMLY degraded
      // window has a tight per-batch spread too ("clean" but slow — one
      // whole run early-stopped at 131k where hot windows read 282k), so
      // early-stop additionally requires the calibration probe to read
      // near-hot right before the accepted attempt.
      var best: Option[T] = None
      var bestTrusted = false
      var a = 0
      while (a < Attempts && !bestTrusted) {
        System.gc() // drop publish garbage before the clock starts
        // BRACKET the attempt with probes: a single pre-probe certifies
        // ~50 ms, not a 30 s leg (measured: a stall starting right after
        // a hot pre-probe produced a "trusted" 3x-degraded stateful leg)
        val calibA = Bench.calibrate(spark)
        val r = run(a)
        val calibB = Bench.calibrate(spark)
        val hot = math.max(calibA, calibB) <= 2 * Bench.CalibRef
        val better = !best.exists(b => score(b) >= score(r))
        if (better) { best = Some(r); bestTrusted = clean(r) && hot }
        if (a > 0 || !bestTrusted)
          println(s"[stb] $name attempt ${a + 1}: score=${num(score(r), 0)} " +
            s"clean=${clean(r)} calib=${num(calibA, 4)}/${num(calibB, 4)}")
        a += 1
      }
      best.get
    }

    // timed leg A: the full reference dataflow
    // 100k-msg triggers at the 2M default: ~0.3-0.4 s per batch steady —
    // an even stricter commit cadence than the reference's 5 s interval,
    // with enough batches (20) for the median to shake off stall windows
    val perTrigger = sys.env.get("GRAFT_STREAM_TRIGGER").map(_.toLong)
      .getOrElse(math.max(n / 20, 1L))
    val fan = bestOf("fanout") { a =>
      val topics = Seq(s"stb-f$a-0", s"stb-f$a-1", s"stb-f$a-2")
      val expectSessions = publishCorpus(base, topics, n)
      val r = runFanoutLeg(spark, topics, n, perTrigger, tmp("fan"))
      require(r.deliveredLines == expectSessions,
        s"sink accounting broken: delivered ${r.deliveredLines} != published sessions $expectSessions")
      topics.foreach(MsgBroker.remove)
      r
    }(_.steadyRowsPerSec, r => cleanBatches(r.batchMs))

    // timed leg B: watermarked windowed aggregate on RocksDB, fed MONOTONE
    // event time (publishMonotone) so every row reaches the state store —
    // a cycled corpus would watermark-drop cycles 2..k before the aggregate
    val st = bestOf("stateful") { a =>
      val topics = Seq(s"stb-s$a-0", s"stb-s$a-1", s"stb-s$a-2")
      val sessions = publishMonotone(base, topics, n, CodecQueries.NowMs)
      val r = runStatefulLeg(spark, topics, n, perTrigger, tmp("state"))
      require(r.deliveredLines >= sessions / 1000,
        s"stateful leg emitted ${r.deliveredLines} window rows for $sessions session msgs — watermark-dropping?")
      topics.foreach(MsgBroker.remove)
      r
    }(_.steadyRowsPerSec, r => cleanBatches(r.batchMs))

    // timed leg C: sink-visible latency at a paced rate well below the
    // measured fanout capacity (latency floor, not queueing)
    val latRate = sys.env.getOrElse("GRAFT_STREAM_RATE", "50000").toLong
    val latSec = sys.env.getOrElse("GRAFT_STREAM_LAT_SEC", "20").toInt
    val lat = bestOf("latency") { a =>
      val topics = Seq(s"stb-l$a-0", s"stb-l$a-1", s"stb-l$a-2")
      val r = runLatencyLeg(spark, topics, latRate, latSec, tmp("lat"))
      require(r.msgs == latRate * latSec,
        s"latency leg lost messages: metered ${r.msgs} != sent ${latRate * latSec}")
      topics.foreach(MsgBroker.remove)
      r
    }(r => -r.p95Ms.toDouble, r => r.maxMs <= 3 * math.max(1L, r.p50Ms))

    val calibPost = Bench.calibrate(spark)
    val calibRef = Bench.CalibRef
    // normalize by the BETTER bracket reading: a probe that degrades only
    // at one end of the run would otherwise overstate hot-host throughput
    val calibBest = math.min(if (calibPre > 0) calibPre else Double.MaxValue,
      if (calibPost > 0) calibPost else Double.MaxValue)
    val normMul = if (calibBest != Double.MaxValue) calibBest / calibRef else 1.0

    val doc =
      s"""{
  "n_msgs": $n,
  "sf": "${cfg.sfDir}",
  "topology": {"topics": 3, "partitions_per_topic": 8, "cores": ${cfg.parallelism}},
  "calib_pre_sec": ${num(calibPre, 4)},
  "calib_post_sec": ${num(calibPost, 4)},
  "calib_ref_sec": ${num(calibRef, 4)},
  "fanout": ${legJson(fan)},
  "fanout_steady_norm": ${num(fan.steadyRowsPerSec * normMul, 0)},
  "stateful": ${legJson(st)},
  "stateful_steady_norm": ${num(st.steadyRowsPerSec * normMul, 0)},
  "latency": {"rate_per_sec": ${lat.rate}, "duration_sec": ${lat.durationSec}, "msgs": ${lat.msgs}, "batches": ${lat.batches}, "mean_ms": ${num(lat.meanMs, 1)}, "p50_batchmax_ms": ${lat.p50Ms}, "p95_batchmax_ms": ${lat.p95Ms}, "max_ms": ${lat.maxMs}},
  "reference_envelope": "parallelism 16, 5s EXACTLY_ONCE checkpoints, sink flush 1000 msgs/5s (BASELINE.md); reference publishes no throughput numbers",
  "rocksdb_changelog_checkpointing": $ChangelogEnabled,
  "notes": "every micro-batch commits offsets (stricter than the 5s reference cadence); delivered==published-sessions asserted (exactly-once sink accounting); stateful leg carries a state_profile phase attribution"
}
"""
    val out = sys.env.getOrElse("GRAFT_STREAM_JSON", "bench_stream_r18.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc)
    println(s"""{"metric":"stream_throughput","value":${num(fan.steadyRowsPerSec, 0)},"unit":"rows/sec","wall":${num(fan.rowsPerSec, 0)},"stateful":${num(st.steadyRowsPerSec, 0)},"lat_p95_ms":${lat.p95Ms},"n":$n,"calib_post":${num(calibPost, 4)}}""")
    spark.stop()
  }
}
