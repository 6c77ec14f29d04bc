package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.Base64

/** Real HTTP wire behind [[BatchedSink]] — the reference's bulk POST
  * transport (`CTSDBSink.java:185-210`) on the JDK HTTP client:
  *
  *   - POST of the concatenated bulk payload to a fixed endpoint (the
  *     reference posts to `{addr}{metric}/doc/_bulk`, `CTSDBSink.java:74`);
  *   - Basic auth from user/password (`CTSDBSink.java:194-198`);
  *   - 5 s connect and request timeouts by default (`CTSDBSink.java:44-46,
  *     200-205`);
  *   - pooled connections: one JVM-wide [[HttpClient]] per timeout config
  *     shared by every partition's transport — the analog of the
  *     reference's shared 100-connection `HttpClients` manager
  *     (`CTSDBSink.java:43,100-105`). The client is thread-safe and keeps
  *     alive/reuses sockets across partitions and micro-batches.
  *
  * Failure semantics: non-2xx status or any transport error (timeout,
  * refused connection) THROWS — [[BatchedSink]] then fails the task and
  * Spark's WAL redelivers the batch. The reference instead clears its
  * buffer and silently loses the batch (`CTSDBSink.java:163-170,182`);
  * keeping the throw is the deliberate no-loss upgrade.
  */
final class HttpTransport(
    endpoint: String,
    user: String,
    password: String,
    connectTimeoutMs: Long = 5000L,
    requestTimeoutMs: Long = 5000L) extends Transport {

  private val auth =
    "Basic " + Base64.getEncoder.encodeToString(s"$user:$password".getBytes("UTF-8"))

  override def send(payload: String): Unit = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("Authorization", auth)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(payload))
      .build()
    val resp = HttpTransport.pooledClient(connectTimeoutMs)
      .send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"POST $endpoint -> HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
  }
}

object HttpTransport {
  // JVM-wide client pool, keyed by connect timeout: every partition-local
  // Transport on an executor shares sockets, like the reference's pooled
  // connection manager (CTSDBSink.java:100-105).
  private val clients = new java.util.concurrent.ConcurrentHashMap[Long, HttpClient]()
  private def pooledClient(connectTimeoutMs: Long): HttpClient =
    clients.computeIfAbsent(connectTimeoutMs,
      ct => HttpClient.newBuilder().connectTimeout(Duration.ofMillis(ct)).build())
}
