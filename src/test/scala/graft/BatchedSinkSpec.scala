package graft

import graft.streaming.{BatchedSink, Transport}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** CTSDB-sink semantics (FIXTURES.md §A case 7–9): count flush, time flush,
  * error-drop, no-loss-on-failure, idle-tail flush. Pure JVM — no Spark. */
class BatchedSinkSpec extends AnyFunSuite {

  private class Recording extends Transport {
    val sent = new ArrayBuffer[String]
    override def send(p: String): Unit = sent += p
  }

  test("count threshold: 1000 msgs flush, remainder in tail flush") {
    val t = new Recording
    val sink = new BatchedSink(() => t, batchNum = 1000, batchTimeSec = 3600)
    sink.writePartition((1 to 1500).map(i => s"m$i\n").iterator)
    assert(t.sent.size == 2)
    assert(t.sent(0).linesIterator.size == 1000)
    assert(t.sent(1).linesIterator.size == 500)
  }

  test("time threshold: flush when batchTime elapses between records") {
    var now = 0L
    val t = new Recording
    val sink = new BatchedSink(() => t, batchNum = 1000, batchTimeSec = 5,
      clock = () => now)
    val rows: Iterator[String] = List(
      () => "a\n",
      () => { now = 6L * 1000000000L; "b\n" }, // 6s later -> flush after buffering b
      () => "c\n").iterator.map(_.apply())
    sink.writePartition(rows)
    assert(t.sent.size == 2)
    assert(t.sent(0) == "a\nb\n") // reference semantics: check on arrival
    assert(t.sent(1) == "c\n")
  }

  test("literal 'error' records dropped (CTSDBSink.java:120-123)") {
    val t = new Recording
    new BatchedSink(() => t).writePartition(Iterator("a\n", "error", "b\n"))
    assert(t.sent.mkString == "a\nb\n")
  }

  test("every record lands in exactly one flush (batching invariant)") {
    val t = new Recording
    new BatchedSink(() => t, batchNum = 7)
      .writePartition((1 to 100).map(i => s"r$i\n").iterator)
    val all = t.sent.mkString.linesIterator.toSeq
    assert(all == (1 to 100).map(i => s"r$i"))
  }

  test("transport failure throws (no silent loss — fixes reference bug)") {
    val failing = new Transport {
      override def send(p: String): Unit = throw new RuntimeException("http 500")
    }
    val sink = new BatchedSink(() => failing, batchNum = 10)
    assertThrows[RuntimeException] {
      sink.writePartition((1 to 20).map(_.toString).iterator)
    }
  }

  test("idle tail flushes (reference never flushes an idle stream)") {
    val t = new Recording
    new BatchedSink(() => t, batchNum = 1000, batchTimeSec = 3600)
      .writePartition(Iterator("only\n"))
    assert(t.sent.toSeq == Seq("only\n"))
  }
}
