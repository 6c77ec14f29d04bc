package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.streaming.{BatchedSink, HttpTransport, MsgPipeline}
import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.jdk.CollectionConverters._

/** [[HttpTransport]] against a real loopback socket (JDK HttpServer):
  * bulk-body concatenation, Basic auth, timeouts, and the no-loss-on-
  * failure streaming path over real HTTP (`CTSDBSink.java:185-210`). */
class HttpTransportSpec extends SparkSpec {
  import spark.implicits._

  /** Loopback bulk endpoint; `handler` returns the status code to send. */
  private def withServer(handler: HttpExchange => Int)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/metrics/doc/_bulk", (x: HttpExchange) => {
      val code = handler(x)
      x.sendResponseHeaders(code, -1)
      x.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/metrics/doc/_bulk")
    finally server.stop(0)
  }

  private def body(x: HttpExchange): String =
    new String(x.getRequestBody.readAllBytes(), "UTF-8")

  test("bulk bodies arrive concatenated, with Basic auth") {
    val bodies = new ConcurrentLinkedQueue[String]
    val auths = new ConcurrentLinkedQueue[String]
    withServer { x =>
      bodies.add(body(x))
      auths.add(x.getRequestHeaders.getFirst("Authorization"))
      200
    } { url =>
      val sink = new BatchedSink(() => new HttpTransport(url, "user", "s3cret"), batchNum = 3)
      sink.writePartition((1 to 7).map(i => s"""{"i":$i}\n""").iterator)
    }
    assert(bodies.asScala.toSeq == Seq(
      """{"i":1}""" + "\n" + """{"i":2}""" + "\n" + """{"i":3}""" + "\n",
      """{"i":4}""" + "\n" + """{"i":5}""" + "\n" + """{"i":6}""" + "\n",
      """{"i":7}""" + "\n"))
    val expectAuth = "Basic " + java.util.Base64.getEncoder
      .encodeToString("user:s3cret".getBytes("UTF-8"))
    assert(auths.asScala.toSet == Set(expectAuth), "CTSDBSink.java:194-198 Basic auth")
  }

  test("auth rejection (401) throws — no silent loss") {
    withServer { x =>
      val ok = Option(x.getRequestHeaders.getFirst("Authorization"))
        .contains("Basic " + java.util.Base64.getEncoder
          .encodeToString("user:right".getBytes("UTF-8")))
      if (ok) 200 else 401
    } { url =>
      val bad = new BatchedSink(() => new HttpTransport(url, "user", "wrong"))
      val e = intercept[java.io.IOException] { bad.writePartition(Iterator("x\n")) }
      assert(e.getMessage.contains("401"))
      // right credentials sail through the same server
      new BatchedSink(() => new HttpTransport(url, "user", "right"))
        .writePartition(Iterator("x\n"))
    }
  }

  test("request timeout throws (CTSDBSink.java:200-205 socket timeout)") {
    withServer { _ => Thread.sleep(2000); 200 } { url =>
      val sink = new BatchedSink(
        () => new HttpTransport(url, "u", "p", requestTimeoutMs = 200L))
      intercept[java.net.http.HttpTimeoutException] {
        sink.writePartition(Iterator("x\n"))
      }
    }
  }

  test("server error (500) throws; retry delivers (no reference loss bug)") {
    val accepted = new ConcurrentLinkedQueue[String]
    val n = new AtomicInteger(0)
    withServer { x =>
      val b = body(x)
      if (n.getAndIncrement() == 0) 500
      else { accepted.add(b); 200 }
    } { url =>
      val sink = new BatchedSink(() => new HttpTransport(url, "u", "p"))
      intercept[java.io.IOException] { sink.writePartition(Iterator("a\n", "error", "b\n")) }
      assert(accepted.isEmpty, "500 must not count as delivered")
      sink.writePartition(Iterator("a\n", "error", "b\n")) // the task retry
    }
    assert(accepted.asScala.toSeq == Seq("a\nb\n"),
      "one delivery after retry; 'error' records dropped (CTSDBSink.java:120-123)")
  }

  test("streaming no-loss over real HTTP: failed batch redelivers on restart") {
    val accepted = new ConcurrentLinkedQueue[String]
    val n = new AtomicInteger(0)
    withServer { x =>
      val b = body(x)
      if (n.getAndIncrement() == 0) 500
      else { accepted.add(b); 200 }
    } { url =>
      val input = MemoryStream[String](spark)
      val ckpt = Files.createTempDirectory("ckpt-http").toString
      val sink = new BatchedSink(() => new HttpTransport(url, "u", "p"))
      def start() = MsgPipeline.runFanOut(
        input.toDF(), ckpt, () => 2000000L,
        (ds, id) => sink.write(ds, id),
        (_, _) => ())

      val q1 = start()
      input.addData(
        "session".padTo(16, ' ') + "1000000".padTo(16, ' ') + (" " * 32) + "payload-1\n")
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
        q1.awaitTermination(5000)
      }
      assert(accepted.isEmpty, "failed POST must not count as delivered")

      val q2 = start() // WAL re-delivers the batch through the same socket
      q2.processAllAvailable()
      q2.stop()
      assert(accepted.asScala.toSeq == Seq("payload-1\n"),
        "reference drops the batch on HTTP failure (CTSDBSink.java:163-170); we redeliver")
    }
  }

  test("capstone: DSv2 broker source through the real HTTP sink, acks coupled end-to-end") {
    // the full reference pipeline with every component real: partitioned
    // broker (ack/redelivery semantics) → DSv2 micro-batch source → parse/
    // route fan-out → count-or-time batched sink → pooled HTTP POST with
    // Basic auth over a live loopback socket. Broker truncation proves the
    // source acked exactly the batches whose POSTs succeeded.
    val accepted = new ConcurrentLinkedQueue[String]
    withServer { x => accepted.add(body(x)); 200 } { url =>
      val b = graft.sources.MsgBroker.create("capstone", numPartitions = 3)
      def mk(i: Int) =
        "session".padTo(16, ' ') + (1000000L + i).toString.padTo(16, ' ') +
          (" " * 32) + s"cap$i\n"
      (1 to 24).foreach(i => b.publish(mk(i)))

      val sink = new BatchedSink(() => new HttpTransport(url, "user", "s3cret"))
      val q = MsgPipeline.runFanOut(
        graft.sources.MessageSource.brokerStream(spark, "capstone"),
        Files.createTempDirectory("ckpt-capstone").toString, () => 2000000L,
        (ds, id) => sink.write(ds, id), // tails are newline-terminated bulk lines
        (_, _) => ())
      q.processAllAvailable()
      // one more batch so the tail batch's offsets commit and ack
      b.publish("flush".padTo(16, ' ') + "1".padTo(16, ' ') + (" " * 32) + "flush\n")
      q.processAllAvailable()
      q.stop()

      val lines = accepted.asScala.flatMap(_.linesIterator).toSeq
      assert(lines.sorted == (1 to 24).map(i => s"cap$i").sorted,
        s"every session payload delivered over HTTP exactly once: $lines")
      assert(b.retainedTotal == 1,
        "broker truncated to the in-flight sentinel: acks coupled to committed batches")
    }
  }
}
