package graft

import graft.sources.MessageSource
import graft.streaming.{BatchedSink, MsgPipeline, Transport}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Runnable end-to-end demo of the streaming pipeline: events-derived
  * wire-format corpus → file-stream source → parse/route fan-out →
  * count-or-time batched bulk sink + windowed delay metrics. Usage:
  * `runMain graft.StreamDemo [sfDir] [-c props] [-p parallelism]`
  * (config layering per [[GraftConfig]], reference R15). */
object StreamDemo {
  private val posts = new ConcurrentLinkedQueue[Int]
  private val metrics = new ConcurrentLinkedQueue[String]

  private class RecordingTransport extends Transport {
    override def send(p: String): Unit = posts.add(p.linesIterator.size)
  }

  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.load(args, defaults = GraftConfig.Default.copy(
      parallelism = 4, sfDir = "/root/testdata/sf0.001", batchNum = 100))
    val sfDir = cfg.sfDir
    val spark = cfg.sessionBuilder("graft-stream-demo").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // scale-path state store (bounded executor memory; state on local disk)
    streaming.StatefulOps.useRocksDbStateStore(spark)

    // A file-stream source path is part of the checkpoint contract: with a
    // configured checkpoint_dir but an ephemeral (per-run temp) source dir,
    // a restart would resume against the PREVIOUS run's vanished directory.
    // So: stable source + stable checkpoint → genuine resume; ephemeral
    // source → namespace the checkpoint under a per-run subdirectory.
    val dir = cfg.sourceDir.getOrElse(
      java.nio.file.Files.createTempDirectory("demo-src").toString)
    val ckpt = (cfg.checkpointDir, cfg.sourceDir) match {
      case (Some(c), Some(_)) => c
      case (Some(c), None) =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
          c, java.nio.file.Paths.get(dir).getFileName.toString)).toString
      case (None, _) =>
        java.nio.file.Files.createTempDirectory("demo-ckpt").toString
    }
    // only seed an empty source dir: a stable dir keeps its corpus so the
    // resumed query's processed-files log still matches what's on disk
    val existing = Option(new java.io.File(dir).listFiles()).map(_.length).getOrElse(0)
    if (existing == 0) MessageSource.writeReplayCorpus(spark, sfDir, dir, nFiles = 4)

    val sink = new BatchedSink(() => new RecordingTransport,
      batchNum = cfg.batchNum, batchTimeSec = cfg.batchTimeSec)
    val q = MsgPipeline.runFanOut(
      MessageSource.fileStream(spark, dir, maxFilesPerTrigger = 2),
      ckpt,
      () => operators.CodecQueries.NowMs,
      // producer contract (FIXTURES.md §A case 9): bulk fragments must be
      // newline-terminated or raw concatenation corrupts the payload
      (ds, id) => { import ds.sparkSession.implicits._; sink.write(ds.map(_ + "\n"), id) },
      (df, id) => {
        val r = df.agg(count(lit(1)).as("n"), avg("delay_ms").as("d")).collect()(0)
        metrics.add(s"batch=$id n=${r.getLong(0)} avg_delay_ms=${math.round(r.getDouble(1))}")
      })
    // watermarked windowed aggregate on the RocksDB state store, fed from
    // the same corpus replayed as a stream
    val winQ = graft.streaming.MetricSink.windowedAvg(
        graft.streaming.MsgPipeline.delayStream(
          graft.streaming.MsgPipeline.parse(
            sources.MessageSource.fileStream(spark, dir, maxFilesPerTrigger = 2)),
          operators.CodecQueries.NowMs),
        windowLen = "1 day")
      .writeStream.outputMode("append").format("memory").queryName("demo_windows")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("demo-ckpt-win").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    winQ.processAllAvailable()
    winQ.stop()
    println(s"[demo] state store: " + spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass").split('.').last)
    println(s"[demo] closed day-windows: ${spark.table("demo_windows").count()}")

    println(s"[demo] bulk POSTs: ${posts.size}, lines delivered: ${posts.asScala.map(_.toLong).sum}")
    println(s"[demo] metric reports: ${metrics.asScala.toSeq.sorted.mkString(" | ")}")

    // 3-topic broker fan-in (the reference's deployed topology,
    // run_datastream_job.sh:17,25): split the same wire corpus across three
    // in-process topics, consume them as ONE DSv2 stream with provenance,
    // and parse/count per topic. The take() is demo-fixture publishing to
    // an in-process broker, not a query pattern.
    val topics = Seq("demo-t0", "demo-t1", "demo-t2")
    val brokers = topics.map(t => sources.MsgBroker.create(t, numPartitions = 2))
    val wire = operators.CodecQueries.rawMessages(spark, sfDir)
      .select("value").limit(3000).collect().map(_.getString(0))
    wire.zipWithIndex.foreach { case (m, i) => brokers(i % 3).publish(m) }
    val perTopic = new java.util.concurrent.ConcurrentHashMap[String, Long]
    val fanIn = MessageSource.brokerStream(spark, topics.mkString(","))
    val fq = fanIn.writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("demo-ckpt-fanin").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.where(operators.MsgCodec.guard(col("value")))
          .groupBy("topic").count().collect()
          .foreach(r => perTopic.merge(r.getString(0), r.getLong(1), Long.box(_) + _))
        ()
      }.start()
    fq.processAllAvailable()
    fq.stop()
    println(s"[demo] 3-topic fan-in parsed counts: " +
      perTopic.asScala.toSeq.sorted.map { case (t, n) => s"$t=$n" }.mkString(", "))
    spark.stop()
  }
}
