package graft.streaming

import org.apache.spark.sql.Dataset
import scala.collection.mutable.ArrayBuffer

/** Transport boundary of the CTSDB-shaped sink (an HTTP bulk POST in the
  * reference, `CTSDBSink.java:185-210`). One instance is created per
  * executor partition — the pooling analog of the reference's shared
  * 100-connection HttpClients manager (`CTSDBSink.java:100-105`).
  * Implementations throw on delivery failure.
  */
trait Transport extends Serializable {
  def send(payload: String): Unit
  def close(): Unit = ()
}

/** Count-or-time batched sink with the reference CTSDB semantics
  * (`CTSDBSink.java:118-183`) re-expressed for Spark's execution model:
  *
  *   - flush when `batchNum` records buffered OR `batchTimeSec` elapsed
  *     since the last flush (`CTSDBSink.java:128-135`);
  *   - records equal to the literal `"error"` are dropped
  *     (`CTSDBSink.java:120-123`);
  *   - payload is the raw concatenation of buffered records
  *     (`CTSDBSink.java:144-149`) — producers newline-terminate;
  *   - **divergences, by design** (SURVEY.md §7.3): the tail of a partition
  *     always flushes (the reference never flushes an idle stream), and a
  *     transport failure THROWS — Spark retries the task and the
  *     micro-batch WAL re-delivers, where the reference clears the buffer
  *     and loses the batch (`CTSDBSink.java:163-170,182` — `// todo throw`).
  *
  * At-least-once into the transport; `batchId` lets an idempotent receiver
  * dedup re-deliveries. Used from `foreachBatch` via [[write]]; the
  * per-partition loop never materializes more than one buffer.
  */
class BatchedSink(
    transportFactory: () => Transport,
    batchNum: Int = 1000,
    batchTimeSec: Long = 5,
    clock: () => Long = () => System.nanoTime()) extends Serializable {

  /** Drain one partition's records through a dedicated transport. */
  def writePartition(rows: Iterator[String]): Unit = {
    val transport = transportFactory()
    val buf = new ArrayBuffer[String]
    var lastEmit = clock()
    def flush(): Unit = if (buf.nonEmpty) {
      transport.send(buf.mkString) // throws on failure => task retry, no loss
      buf.clear()
      lastEmit = clock()
    }
    try {
      rows.foreach { r =>
        if (r != "error") { // CTSDBSink.java:120-123
          buf += r
          val elapsedSec = (clock() - lastEmit) / 1000000000L
          if (buf.size >= batchNum || elapsedSec >= batchTimeSec) flush()
        }
      }
      flush() // idle-tail flush: intentional upgrade over the reference
    } finally transport.close()
  }

  /** foreachBatch entry: distribute the batch across partitions. */
  def write(batch: Dataset[String], batchId: Long): Unit = {
    val self = this
    batch.foreachPartition { (it: Iterator[String]) => self.writePartition(it) }
  }
}
