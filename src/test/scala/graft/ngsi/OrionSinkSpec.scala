package graft.ngsi

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ListBuffer

import com.sun.net.httpserver.HttpServer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.NgsiStreams

/** Delivery tests for the HTTP write-back sink: an embedded receiver
  * captures what actually arrives on the wire (method, path, content type,
  * body) — the loop the reference validates manually with curl against a
  * live broker (`README.md:341-345`). */
class OrionSinkSpec extends SparkSpec {
  import spark.implicits._

  case class Received(method: String, path: String, contentType: String, body: String)

  private def withReceiver[A](f: (Int, ListBuffer[Received]) => A): A = {
    val got = ListBuffer.empty[Received]
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", exchange => {
      val body = new String(exchange.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      got.synchronized {
        got += Received(exchange.getRequestMethod, exchange.getRequestURI.getPath,
          Option(exchange.getRequestHeaders.getFirst("Content-Type")).getOrElse(""), body)
      }
      exchange.sendResponseHeaders(204, -1)
      exchange.close()
    })
    server.start()
    try f(server.getAddress.getPort, got) finally server.stop(0)
  }

  test("writeBatch posts each record to its per-record URL, PATCH included") {
    withReceiver { (port, got) =>
      val updates = Seq(
        OrionSinkRecord("""{"temperature_min":{"value":19.5,"type":"Float"}}""",
          s"http://127.0.0.1:$port/v2/entities/R1/attrs"),
        OrionSinkRecord("""{"temperature_min":{"value":7.0,"type":"Float"}}""",
          s"http://127.0.0.1:$port/v2/entities/R2/attrs", method = "PATCH")
      ).toDF()
      OrionSink.writeBatch(updates)
      val seen = got.synchronized(got.toList)
      assert(seen.map(_.path).toSet ==
        Set("/v2/entities/R1/attrs", "/v2/entities/R2/attrs"))
      assert(seen.map(_.method).toSet == Set("POST", "PATCH"))
      assert(seen.forall(_.contentType == "application/json"))
      assert(seen.exists(_.body.contains(""""value":19.5""")))
    }
  }

  test("streaming example2 loop: notification in -> NGSI update out over HTTP") {
    withReceiver { (port, got) =>
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(String, Long)]
      val raw = mem.toDF()
        .select(col("_1").as("value"), timestamp_millis(col("_2")).as("recvTime"))
      val minDf = NgsiStreams.minTemperatureStream(raw)
      val updates = NgsiPipelines.toOrionUpdates(minDf,
        s"http://127.0.0.1:$port/v2/entities/")
      val q = NgsiStreams.start(NgsiStreams.toOrion(updates))
      try {
        val body =
          """{"subscriptionId":"sub1","data":[{"id":"Room1","type":"Room",
            |"temperature":{"type":"Float","value":23.5,"metadata":{}}}]}"""
            .stripMargin.replace("\n", "")
        mem.addData(body -> 1700000000000L)
        q.processAllAvailable()
        val seen = got.synchronized(got.toList)
        assert(seen.nonEmpty)
        assert(seen.forall(_.path == "/v2/entities/Room1/attrs"))
        assert(seen.forall(_.body.contains(""""temperature_min"""")))
        assert(seen.forall(_.body.contains("23.5")))
      } finally q.stop()
    }
  }
}
