package graft.streaming

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.zip.GZIPInputStream

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.engine.Constraints
import graft.fixtures.WebGen

/** S11: batched HTTP alert push against a local in-process server. */
class AlertSinkSpec extends SparkSpec {

  private def withServer(f: (Int, ConcurrentLinkedQueue[(String, String, String)]) => Unit): Unit = {
    val received = new ConcurrentLinkedQueue[(String, String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/alerts", (ex: HttpExchange) => {
      val enc = Option(ex.getRequestHeaders.getFirst("Content-Encoding")).getOrElse("")
      val raw = ex.getRequestBody.readAllBytes()
      val body =
        if (enc == "gzip")
          new String(new GZIPInputStream(new java.io.ByteArrayInputStream(raw)).readAllBytes(), "UTF-8")
        else new String(raw, "UTF-8")
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      received.add((auth, enc, body))
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    server.start()
    try f(server.getAddress.getPort, received)
    finally server.stop(0)
  }

  private def violations = {
    val wp = WebGen.generate(spark, 500, flags = WebGen.Flags(nullText = true))
      .withColumnRenamed("p_day", "partition")
    Constraints.NotNull("text").violations(wp)
  }

  test("pushViolations: batched JSON POSTs with bearer auth, all rows arrive") {
    withServer { (port, received) =>
      val v = violations
      val expected = v.count()
      val posts = AlertSink.pushViolations(
        v, s"http://127.0.0.1:$port/alerts", bearerToken = Some("tok"), batchSize = 3)
      assert(posts > 0)
      val msgs = received.asScala.toSeq
      assert(msgs.size == posts)
      assert(msgs.forall(_._1 == "Bearer tok"))
      val totalRows = msgs.map(m => "\"violation_id\"".r.findAllIn(m._3).size).sum
      assert(totalRows == expected)
      // every batch respects the size cap and is a JSON array
      assert(msgs.forall(m => m._3.startsWith("[") && m._3.endsWith("]")))
      assert(msgs.forall(m => "\"violation_id\"".r.findAllIn(m._3).size <= 3))
    }
  }

  test("pushViolations: gzip bodies decode to the same rows") {
    withServer { (port, received) =>
      val v = violations
      val expected = v.count()
      AlertSink.pushViolations(
        v, s"http://127.0.0.1:$port/alerts", gzipBody = true, batchSize = 100)
      val msgs = received.asScala.toSeq
      assert(msgs.forall(_._2 == "gzip"))
      val totalRows = msgs.map(m => "\"violation_id\"".r.findAllIn(m._3).size).sum
      assert(totalRows == expected)
    }
  }
}
