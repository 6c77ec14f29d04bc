package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DSv2 micro-batch source for [[MsgBroker]] — the real connector shape of
  * the reference's Pulsar source (`PulsarSource.java:22-45`), re-expressed
  * on Spark's offset-tracking execution model:
  *
  *   - parallel partitioned consume (`ParallelSourceFunction`, shared
  *     subscription `PulsarSource.java:145`) → one [[InputPartition]] per
  *     broker partition, offsets are per-partition `(seq)` ranges;
  *   - earliest start position (`PulsarSource.java:146`) → [[initialOffset]]
  *     is the broker's earliest-retained watermark;
  *   - checkpoint-coupled ack (`acknowledgeIDs`, `PulsarSource.java:79-118`)
  *     → [[commit]]: Spark calls it only after the micro-batch's offsets are
  *     durably committed, and the connector acks the broker with the
  *     reference's 3-retry/1s-backoff loop (`:37-39,105-117`); a batch that
  *     never commits is re-planned from the WAL on restart, which the broker
  *     observes as ack-timeout redelivery (`:149`);
  *   - rate limiting (`maxPerTrigger`) via [[SupportsAdmissionControl]], the
  *     analog of the consumer's receive-queue bound;
  *   - partition discovery (`PulsarSource.java:147-148`, 30 s rediscovery
  *     loop): [[latestOffset(start:*]] re-polls the broker's partition set
  *     every micro-batch, so a partition added mid-stream enters the next
  *     batch from its earliest offset (`from.getOrElse(p, 0L)`) and is
  *     acked/checkpointed like any other — exercised by `BrokerSourceSpec`
  *     "partition appearing mid-stream".
  *
  * Usage: `spark.readStream.format("graft-msgs").option("broker", name)
  * .load()` → columns `(value STRING, partition INT, seq LONG)`.
  * The broker is resolved from the process-local registry (valid in
  * local-mode tests where executors share the JVM); a production build
  * would swap the registry lookup in [[MsgPartitionReader]] and
  * [[MsgMicroBatchStream.commit]] for network clients and change nothing
  * else — that boundary is the whole point of the DSv2 split.
  */
class MsgDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-msgs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MsgDataSource.schemaFor(MsgDataSource.topicsOf(options))
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: util.Map[String, String]): Table =
    new MsgTable(new CaseInsensitiveStringMap(properties))
}

object MsgDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("seq", LongType, nullable = false)))

  /** Multi-topic fan-in schema (the reference job consumes THREE topics
    * into one stream — `run_datastream_job.sh:17,25`): fan-in needs
    * provenance, so the union carries a `topic` column. */
  val MultiSchema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("seq", LongType, nullable = false)))

  /** Global offset-key stride: key = topicIdx * TopicStride + partition.
    * 2^20 partitions per topic is far above any real topic, and the
    * encoding keeps every per-topic key stable as partitions grow. */
  private[sources] val TopicStride = 1 << 20

  private[sources] def topicsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val b = options.get("broker")
    require(b != null, "graft-msgs requires .option(\"broker\", <registry name[,name...]>)")
    val ts = b.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(ts.nonEmpty, s"graft-msgs: empty broker list '$b'")
    require(ts.distinct.size == ts.size, s"graft-msgs: duplicate topics in '$b'")
    ts
  }

  private[sources] def schemaFor(topics: Seq[String]): StructType =
    if (topics.size > 1) MultiSchema else Schema
}

final class MsgTable(options: CaseInsensitiveStringMap) extends SupportsRead {
  private val topics = MsgDataSource.topicsOf(options)
  override def name(): String = s"graft-msgs(${topics.mkString(",")})"
  override def schema(): StructType = MsgDataSource.schemaFor(topics)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = MsgDataSource.schemaFor(topics)
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MsgMicroBatchStream(
          topics,
          ackRetries = options.getInt("ackRetries", 3),          // PulsarSource.java:38
          ackBackoffMs = options.getLong("ackBackoffMs", 1000L), // PulsarSource.java:39
          maxPerTrigger = Option(options.get("maxPerTrigger")).map(_.toLong))
    }
  }
}

/** Per-partition seq watermarks, JSON `{"0":12,"1":7}` (sorted keys). */
final case class MsgOffset(seqs: Map[Int, Long]) extends Offset {
  override def json(): String =
    seqs.toSeq.sortBy(_._1).map { case (p, s) => s""""$p":$s""" }.mkString("{", ",", "}")
}

object MsgOffset {
  def parse(json: String): MsgOffset = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    val seqs =
      if (body.isEmpty) Map.empty[Int, Long]
      else body.split(",").map { kv =>
        val Array(k, v) = kv.split(":")
        k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
      }.toMap
    MsgOffset(seqs)
  }
}

final class MsgMicroBatchStream(
    topics: Seq[String],
    ackRetries: Int,
    ackBackoffMs: Long,
    maxPerTrigger: Option[Long])
  extends MicroBatchStream with SupportsAdmissionControl {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val emitTopic = topics.size > 1
  private val Stride = MsgDataSource.TopicStride

  /** Union the per-topic offset maps into one global key space. */
  private def union(f: MsgBroker => Map[Int, Long]): Map[Int, Long] =
    topics.zipWithIndex.flatMap { case (t, i) =>
      val m = f(MsgBroker.get(t))
      require(m.keys.forall(_ < Stride), s"topic $t exceeds $Stride partitions")
      m.map { case (p, s) => (i * Stride + p) -> s }
    }.toMap

  private def topicOf(global: Int): String = topics(global / Stride)

  override def initialOffset(): Offset = MsgOffset(union(_.earliestOffsets))

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  /** Advance each partition toward the broker end, capped proportionally to
    * availability when the limit is `maxRows`. The allocation walks the
    * partitions (sorted, deterministic) with a running remainder, so the
    * batch NEVER exceeds the cap — a per-partition `max(1, share)` bump
    * without the remainder could overshoot by numPartitions-1 rows. The
    * proportional share is computed in BigInt because `avail * cap` can
    * overflow Long for a deep backlog combined with a large cap (which
    * would produce a negative take and a malformed offset). If the cap is
    * smaller than the number of backlogged partitions, trailing partitions
    * get 0 this trigger; they drain on subsequent triggers as earlier
    * partitions' backlogs shrink toward their (smaller) shares. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[MsgOffset].seqs
    val ends = union(_.endOffsets)
    val avail = ends.map { case (p, e) => p -> math.max(0L, e - from.getOrElse(p, 0L)) }
    val total = avail.values.sum
    val cap = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => r.maxRows()
      case _ => Long.MaxValue
    }
    if (total <= cap) MsgOffset(ends)
    else {
      var remaining = math.max(0L, cap)
      val takes = avail.toSeq.sortBy(_._1).map { case (p, a) =>
        val share = if (a == 0) 0L else math.max(1L, (BigInt(a) * cap / total).toLong)
        val take = math.min(math.min(share, a), remaining)
        remaining -= take
        p -> take
      }.toMap
      MsgOffset(ends.map { case (p, _) =>
        p -> (from.getOrElse(p, 0L) + takes(p))
      })
    }
  }

  override def deserializeOffset(json: String): Offset = MsgOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MsgOffset].seqs
    val e = end.asInstanceOf[MsgOffset].seqs
    e.toSeq.sortBy(_._1).collect {
      case (g, until) if until > s.getOrElse(g, 0L) =>
        MsgInputPartition(topicOf(g), g % Stride, s.getOrElse(g, 0L), until,
          emitTopic): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new MsgReaderFactory

  /** Checkpoint-coupled ack: runs only after Spark durably committed the
    * batch's offsets — the exact coupling of `acknowledgeIDs`
    * (`PulsarSource.java:79-118`). Spark invokes it when the NEXT batch is
    * constructed (or on restart), so the ack trails the commit by one
    * micro-batch — the same lag as the reference, whose ack waits for the
    * checkpoint-complete notification. Transient broker failures retry
    * `ackRetries` times with `ackBackoffMs` backoff (`:105-117`); if all
    * retries fail the messages stay retained and redeliver after the
    * broker's ack timeout, preserving at-least-once. */
  override def commit(end: Offset): Unit = {
    val upTo = end.asInstanceOf[MsgOffset].seqs
    upTo.toSeq.sortBy(_._1).foreach { case (g, seq) =>
      val topic = topicOf(g)
      val p = g % Stride
      var attempt = 0
      var done = false
      while (!done) {
        try { MsgBroker.get(topic).acknowledge(p, seq); done = true }
        catch {
          case e: AckFailedException if attempt < ackRetries =>
            attempt += 1
            log.warn(s"ack $topic/$p up to $seq failed (attempt $attempt/$ackRetries): ${e.getMessage}")
            Thread.sleep(ackBackoffMs)
          case e: AckFailedException =>
            log.error(s"ack $topic/$p up to $seq gave up after $ackRetries retries; " +
              s"messages stay retained for redelivery: ${e.getMessage}")
            done = true
        }
      }
    }
  }

  override def stop(): Unit = ()
}

final case class MsgInputPartition(
    broker: String, p: Int, from: Long, until: Long, emitTopic: Boolean = false)
  extends InputPartition

final class MsgReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val mp = partition.asInstanceOf[MsgInputPartition]
    new MsgPartitionReader(mp)
  }
}

final class MsgPartitionReader(mp: MsgInputPartition) extends PartitionReader[InternalRow] {
  // production swap point: a network consumer seeked to mp.from goes here
  private lazy val rows: Iterator[(Long, String)] =
    MsgBroker.get(mp.broker).fetch(mp.p, mp.from, mp.until).iterator
  private var current: (Long, String) = _

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false

  override def get(): InternalRow =
    if (mp.emitTopic)
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(current._2), UTF8String.fromString(mp.broker), mp.p, current._1))
    else
      new GenericInternalRow(Array[Any](UTF8String.fromString(current._2), mp.p, current._1))

  override def close(): Unit = ()
}
