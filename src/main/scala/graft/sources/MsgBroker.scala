package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import scala.collection.mutable.ArrayBuffer

/** Ack rejected by the broker (transient in the reference; the source's
  * commit path retries — `PulsarSource.java:105-117`). */
final class AckFailedException(msg: String) extends RuntimeException(msg)

/** In-process partitioned message broker — the offline stand-in for the
  * reference's Pulsar broker, modeling exactly the behaviors the source
  * connector contract depends on (`PulsarSource.java`):
  *
  *   - partitioned topic, per-partition monotone message ids (the
  *     `MessageId` analog is `(partition, seq)`);
  *   - retention until acknowledged: messages survive consumer crashes and
  *     are truncated only on ack (`consumer.acknowledge`,
  *     `PulsarSource.java:102`) — fetching below the acked watermark is an
  *     error, like reading a trimmed ledger;
  *   - ack-timeout redelivery (`ackTimeout(60s)`, `PulsarSource.java:149`):
  *     a message delivered but not acked within `ackTimeoutMs` is served
  *     again to the next fetch and counted in [[redelivered]];
  *   - transient ack failures (to exercise the consumer's 3×1s retry loop,
  *     `PulsarSource.java:37-39,105-117`) injected via [[failNextAcks]].
  *
  * Thread-safe; all per-partition ops synchronize on the partition. Brokers
  * live in a process-local registry ([[MsgBroker.create]]) so local-mode
  * executor threads (same JVM) reach them by name — a production connector
  * would replace fetch/ack with network calls and nothing else.
  */
final class MsgBroker(val name: String, initialPartitions: Int, val ackTimeoutMs: Long) {
  require(initialPartitions >= 1, s"numPartitions $initialPartitions")

  private final class Part {
    val buf = new ArrayBuffer[String]      // retained payloads, seq = firstSeq + idx
    var firstSeq = 0L                      // seq of buf.head == acked watermark
    var nextSeq = 0L                       // seq the next publish gets
    var deliveredUpTo = 0L                 // highest seq ever handed to a fetch (exclusive)
    var deliveredAt = 0L                   // wall time of the delivery that set deliveredUpTo
  }
  // growable: Pulsar topics can gain partitions while consumers run
  // (the reference re-discovers every 30 s, PulsarSource.java:147-148);
  // guarded by its own lock, per-partition state by the Part's monitor
  private val parts = ArrayBuffer.fill(initialPartitions)(new Part)
  private def part(p: Int): Part = parts.synchronized(parts(p))
  private def partIds: Range = 0 until parts.synchronized(parts.size)
  private val rr = new AtomicLong(0)

  def numPartitions: Int = parts.synchronized(parts.size)

  /** Grow the topic by `n` partitions (Pulsar partition expansion). New
    * partitions start empty at seq 0; existing ids keep their state. The
    * source discovers them on its next `latestOffset` poll — every
    * micro-batch, i.e. at least as fresh as the reference's 30 s
    * rediscovery loop — and plans them from their earliest offset. */
  def addPartitions(n: Int): Unit = {
    require(n >= 1, s"addPartitions $n")
    parts.synchronized { (0 until n).foreach(_ => parts += new Part) }
  }

  /** Transient-failure injection: the next N acknowledge calls throw. */
  val failNextAcks = new AtomicInteger(0)
  private val ackAttemptsN = new AtomicLong(0)
  private val acksN = new AtomicLong(0)
  private val redeliveredN = new AtomicLong(0)

  def publishTo(p: Int, msg: String): Unit = {
    val pt = part(p)
    pt.synchronized { pt.buf += msg; pt.nextSeq += 1 }
  }

  /** Round-robin publish across partitions. */
  def publish(msg: String): Unit =
    publishTo((rr.getAndIncrement() % numPartitions).toInt, msg)

  def publishAll(msgs: Seq[String]): Unit = msgs.foreach(publish)

  /** End-of-log (exclusive) seq per partition. */
  def endOffsets: Map[Int, Long] =
    partIds.map { p => val pt = part(p); p -> pt.synchronized(pt.nextSeq) }.toMap

  /** Earliest retained (= acked watermark) seq per partition — the Pulsar
    * `Earliest` start position (`PulsarSource.java:146`). */
  def earliestOffsets: Map[Int, Long] =
    partIds.map { p => val pt = part(p); p -> pt.synchronized(pt.firstSeq) }.toMap

  /** Serve `[from, until)` of partition `p`. Re-serving a range that was
    * already delivered but never acked counts as redelivery once the ack
    * timeout has elapsed (the broker-side view of `PulsarSource.java:149`). */
  def fetch(p: Int, from: Long, until: Long): Seq[(Long, String)] = {
    val part = this.part(p)
    part.synchronized {
      require(from >= part.firstSeq,
        s"$name/$p: fetch from $from below acked watermark ${part.firstSeq} (truncated)")
      require(until <= part.nextSeq, s"$name/$p: fetch until $until past end ${part.nextSeq}")
      val now = System.currentTimeMillis()
      val reFrom = math.min(until, part.deliveredUpTo)
      if (from < reFrom && now - part.deliveredAt >= ackTimeoutMs)
        redeliveredN.addAndGet(reFrom - from)
      if (until > part.deliveredUpTo) { part.deliveredUpTo = until; part.deliveredAt = now }
      (from until until).map(s => s -> part.buf((s - part.firstSeq).toInt))
    }
  }

  /** Acknowledge everything below `upTo` in partition `p`; truncates the
    * retained log (the consumer calls this only after the checkpoint that
    * covers these ids completed — `PulsarSource.java:79-118`). */
  def acknowledge(p: Int, upTo: Long): Unit = {
    ackAttemptsN.incrementAndGet()
    val n = failNextAcks.get()
    if (n > 0 && failNextAcks.compareAndSet(n, n - 1))
      throw new AckFailedException(s"$name/$p: injected ack failure ($n left)")
    val part = this.part(p)
    part.synchronized {
      if (upTo > part.firstSeq) {
        require(upTo <= part.nextSeq, s"$name/$p: ack $upTo past end ${part.nextSeq}")
        part.buf.remove(0, (upTo - part.firstSeq).toInt)
        part.firstSeq = upTo
      }
    }
    acksN.incrementAndGet()
  }

  def retained(p: Int): Int = { val pt = part(p); pt.synchronized(pt.buf.size) }
  def retainedTotal: Long = partIds.map(retained(_).toLong).sum
  def redelivered: Long = redeliveredN.get()
  def ackAttempts: Long = ackAttemptsN.get()
  def acks: Long = acksN.get()
}

object MsgBroker {
  private val registry = new ConcurrentHashMap[String, MsgBroker]()

  /** Create (or replace) a named broker in the process-local registry. */
  def create(name: String, numPartitions: Int = 4, ackTimeoutMs: Long = 60000L): MsgBroker = {
    val b = new MsgBroker(name, numPartitions, ackTimeoutMs)
    registry.put(name, b)
    b
  }

  def get(name: String): MsgBroker = {
    val b = registry.get(name)
    require(b != null, s"no broker named '$name' — call MsgBroker.create first")
    b
  }

  def remove(name: String): Unit = registry.remove(name)
}
