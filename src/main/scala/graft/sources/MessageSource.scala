package graft.sources

import graft.operators.MsgCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source connectors for the wire-format message stream (reference R1:
  * `PulsarSource.java` — a parallel shared-subscription Pulsar consumer).
  *
  * No Pulsar broker exists in this environment (and none is buildable
  * offline), so the connector surface is modeled by the sources Spark ships
  * with, which cover the Pulsar behaviors that matter semantically
  * (SURVEY.md §7.3):
  *
  *   - earliest-offset start          → file-stream reads all existing files;
  *     `rate` source starts at t0
  *   - partitioned parallel consume   → `maxFilesPerTrigger` / `rowsPerSecond`
  *     across input partitions
  *   - redelivery & checkpoint-ack    → offset WAL + commit log under
  *     `checkpointLocation` (exactly-once source tracking)
  *
  * A production Pulsar DSv2 connector would implement `MicroBatchStream`
  * with `MessageId` ranges as offsets; the plumbing downstream of `load()`
  * is identical, which is the point of modeling it this way.
  */
object MessageSource {

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
