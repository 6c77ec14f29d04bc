package graft.sources

import graft.operators.MsgCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source connectors for the wire-format message stream (reference R1:
  * `PulsarSource.java` — a parallel shared-subscription Pulsar consumer).
  *
  * Three sources, broadest contract first:
  *
  *   - [[brokerStream]] — the real connector: a DSv2 `MicroBatchStream`
  *     ([[MsgDataSource]], `.format("graft-msgs")`) over the in-process
  *     [[MsgBroker]], with `MessageId`-range offsets, checkpoint-coupled
  *     ack (retry loop per `PulsarSource.java:79-118`) and ack-timeout
  *     redelivery (`:149`);
  *   - [[fileStream]] — replayable file corpus for deterministic
  *     recovery tests;
  *   - [[rateStream]] — synthetic soak load.
  */
object MessageSource {

  /** Stream from a registered [[MsgBroker]] via the `graft-msgs` DSv2
    * connector. Columns: `(value STRING, partition INT, seq LONG)`.
    * `broker` may be a comma-separated topic list (the reference consumes
    * 3 topics — `run_datastream_job.sh:17`); the fan-in adds a `topic`
    * column after `value`. */
  def brokerStream(spark: SparkSession, broker: String,
      maxPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format("graft-msgs").option("broker", broker)
    maxPerTrigger.foreach(n => r.option("maxPerTrigger", n.toString))
    r.load()
  }

  /** File-stream of raw message lines (one wire-format string per line). */
  def fileStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)

  /** Soak-test source: synthesize wire-format session messages from the
    * `rate` source (rowsPerSecond msgs/s, monotone send_ts). */
  def rateStream(spark: SparkSession, rowsPerSecond: Int = 1000): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        MsgCodec.mkMsg(
          when(col("value") % 10 === 0, lit("heartbeat")).otherwise(lit("session")),
          unix_millis(col("timestamp")),
          concat(lit("""{"seq": """), col("value"), lit("}\n"))).as("value"))

  /** Batch DataFrame of wire-format messages for a replayable file-stream:
    * writes `events`-derived messages as text partitioned into `nFiles`,
    * ordered by ts — the deterministic replay corpus for streaming tests. */
  def writeReplayCorpus(spark: SparkSession, sfDir: String, outDir: String, nFiles: Int = 4): Unit = {
    graft.operators.CodecQueries.rawMessages(spark, sfDir)
      .select("value")
      .repartition(nFiles)
      .write.mode("overwrite").text(outDir)
  }
}
