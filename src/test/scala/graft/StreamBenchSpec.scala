package graft

import graft.operators.CodecQueries

/** Smoke-pins for [[StreamThroughputBench]] at tiny N: the bench's wiring
  * (publish → DSv2 fan-in → parse → fan-out/stateful legs → accounting)
  * must hold before its numbers mean anything. The full-size run is
  * `runMain graft.StreamThroughputBench` (artifact bench_stream_r13.json).
  */
class StreamBenchSpec extends SparkSpec {

  private lazy val base: Array[String] =
    CodecQueries.rawMessages(spark, sf()).select("value")
      .limit(2000).collect().map(_.getString(0))

  test("fanout leg: record-exact sink accounting across cycled corpus") {
    val topics = Seq("stbspec-f0", "stbspec-f1", "stbspec-f2")
    val n = 5000L // > base.length: exercises corpus cycling
    val sessions = StreamThroughputBench.publishCorpus(base, topics, n)
    assert(sessions > 0 && sessions < n, "corpus must mix session/non-session")
    val ckpt = java.nio.file.Files.createTempDirectory("stbspec-f").toString
    val r = StreamThroughputBench.runFanoutLeg(
      spark, topics, n, perTrigger = 1700, ckpt = ckpt)
    assert(r.deliveredLines == sessions,
      s"sunk ${r.deliveredLines} != published sessions $sessions")
    assert(r.batches >= 3, s"perTrigger=1700 over $n msgs should yield >=3 batches, got ${r.batches}")
    assert(r.posts > 0 && r.wallSec > 0 && r.rowsPerSec > 0)
    topics.foreach(graft.sources.MsgBroker.remove)
  }

  test("wireMsg (producer-side) builds byte-identical messages to MsgCodec.mkMsg") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cases = Seq(
      ("session", 1735689600123L, "{\"k\":1}"),
      ("heartbeat", 0L, ""),
      ("a-very-long-module-name-over-16", -42L, "tail with spaces é"))
    val viaSql = cases.toDF("m", "ts", "t")
      .select(graft.operators.MsgCodec.mkMsg(col("m"), col("ts"), col("t")))
      .as[String].collect()
    val viaDriver = cases.map { case (m, ts, t) =>
      StreamThroughputBench.wireMsg(m, ts, t) }
    assert(viaDriver == viaSql.toSeq,
      "producer-side formatting drifted from the Column-side wire builder")
  }

  test("latency leg: paced publisher round-trips the wire format, no loss") {
    val topics = Seq("stbspec-l0", "stbspec-l1", "stbspec-l2")
    val ckpt = java.nio.file.Files.createTempDirectory("stbspec-l").toString
    val r = StreamThroughputBench.runLatencyLeg(
      spark, topics, ratePerSec = 2000, durationSec = 3, ckpt = ckpt)
    assert(r.msgs == 6000, s"metered ${r.msgs} != sent 6000")
    assert(r.p50Ms > 0 && r.p50Ms <= r.p95Ms && r.p95Ms <= r.maxMs)
    assert(r.meanMs > 0 && r.batches > 0)
    topics.foreach(graft.sources.MsgBroker.remove)
  }

  test("stateful leg: monotone event time reaches the store, windows close") {
    val topics = Seq("stbspec-s0", "stbspec-s1", "stbspec-s2")
    val n = 4000L
    val sessions = StreamThroughputBench.publishMonotone(
      base, topics, n, startMs = graft.operators.CodecQueries.NowMs)
    assert(sessions > 0 && sessions < n)
    val ckpt = java.nio.file.Files.createTempDirectory("stbspec-s").toString
    val r = StreamThroughputBench.runStatefulLeg(
      spark, topics, n, perTrigger = 2000, ckpt = ckpt)
    // 10 ms steps over 4000 msgs = 40 s of event time = >=4 distinct 10 s
    // windows; update mode must emit each at least once — a cycled-corpus
    // watermark bug would emit windows for only the first batch's range
    assert(r.deliveredLines >= 4, s"only ${r.deliveredLines} window rows")
    assert(r.batches >= 2 && r.engineRowsPerSec > 0)
    topics.foreach(graft.sources.MsgBroker.remove)
  }
}
