package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.NgsiStreams

/** End-to-end: HTTP POST (the reference's curl simulator shape,
  * `files/example1/curl_Notification.sh`) -> DataSourceV2 micro-batch source
  * -> parse -> memory sink. */
class NgsiHttpSourceSpec extends SparkSpec {

  private val notification =
    """{"subscriptionId":"57458eb60962ef754e7c0998",
      |"data":[{"id":"R1","type":"Room",
      |"temperature":{"type":"Float","value":21.5,"metadata":{}}}]}"""
      .stripMargin.replace("\n", "")

  private def freePort(): Int = {
    val ss = new java.net.ServerSocket(0)
    try ss.getLocalPort finally ss.close()
  }

  private def post(port: Int, body: String, headers: Map[String, String]): Int = {
    val b = HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port/notify"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    HttpClient.newHttpClient()
      .send(b.build(), HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  test("HTTP notifications flow through the micro-batch source") {
    val port = freePort()
    val raw = NgsiStreams.fromHttp(spark, port)
    val q = raw.writeStream
      .format("memory").queryName("ngsi_http_raw")
      .outputMode(OutputMode.Append())
      .start()
    try {
      assert(post(port, notification,
        Map("Fiware-Service" -> "demo", "Fiware-ServicePath" -> "/test")) == 200)
      assert(post(port, notification, Map.empty) == 200)
      q.processAllAvailable()
      val rows = spark.table("ngsi_http_raw").collect()
      assert(rows.length == 2)
      assert(rows.forall(_.getAs[String]("value").contains("57458eb60962ef754e7c0998")))
      assert(rows.map(_.getAs[String]("service")).toSet == Set("demo", ""))
      assert(rows.forall(_.getAs[java.sql.Timestamp]("recvTime") != null))
    } finally q.stop()
  }

  test("source composes with the example1 pipeline (parse -> window -> min)") {
    val port = freePort()
    val out = NgsiStreams.minTemperatureStream(NgsiStreams.fromHttp(spark, port))
    val q = out.writeStream
      .format("memory").queryName("ngsi_http_min")
      .outputMode(OutputMode.Update())
      .start()
    try {
      post(port, notification, Map.empty)
      post(port, notification.replace("21.5", "19.5"), Map.empty)
      q.processAllAvailable()
      val rows = spark.table("ngsi_http_min")
        .select(col("id"), col("temperature_min")).collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getString(0) == "R1"))
      assert(rows.map(_.getFloat(1)).min == 19.5f)
    } finally q.stop()
  }

  test("sustains a burst of 500 notifications without loss") {
    val port = freePort()
    val raw = NgsiStreams.fromHttp(spark, port)
    val q = raw.writeStream
      .format("memory").queryName("ngsi_http_burst")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val client = HttpClient.newHttpClient()
      (1 to 500).foreach { i =>
        val req = HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port/notify"))
          .POST(HttpRequest.BodyPublishers.ofString(
            notification.replace("R1", s"R$i")))
          .build()
        assert(client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode() == 200)
      }
      q.processAllAvailable()
      val got = spark.table("ngsi_http_burst").count()
      assert(got == 500L, s"ingested $got of 500")
    } finally q.stop()
  }

  test("offset contract: restart rebase delivers post-restart notifications") {
    val port = freePort()
    val stream = new NgsiHttpMicroBatchStream(port)
    try {
      // notifications can arrive BEFORE Spark restores the checkpoint —
      // they are post-restart data and must not be lost by the rebase
      post(port, notification, Map.empty)
      // simulate the restart: the checkpoint holds offset 100 from the
      // previous incarnation; this fresh instance has numbered from 0
      val restored = stream.deserializeOffset("100")
      assert(restored.asInstanceOf[SeqOffset].n == 100L)
      post(port, notification, Map.empty)
      val latest = stream.latestOffset().asInstanceOf[SeqOffset]
      assert(latest.n == 102L,
        s"expected rebase to 100 + 2 surviving arrivals, got ${latest.n}")
      // a second restore call (e.g. the batch's end offset) must NOT rebase again
      stream.deserializeOffset("101")
      assert(stream.latestOffset().asInstanceOf[SeqOffset].n == 102L)
      val parts = stream.planInputPartitions(SeqOffset(100L), latest)
      val rows = parts.flatMap(_.asInstanceOf[NgsiHttpInputPartition].rows)
      assert(rows.length == 2)
      stream.commit(latest)
      assert(stream.latestOffset().asInstanceOf[SeqOffset].n == 102L)
      assert(stream.planInputPartitions(latest, latest).isEmpty)
    } finally stream.stop()
  }

  test("non-POST requests are rejected, stream unaffected") {
    val port = freePort()
    val raw = NgsiStreams.fromHttp(spark, port)
    val q = raw.writeStream
      .format("memory").queryName("ngsi_http_405")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val get = HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port/")).GET().build()
      val code = HttpClient.newHttpClient()
        .send(get, HttpResponse.BodyHandlers.discarding()).statusCode()
      assert(code == 405)
      post(port, notification, Map.empty)
      q.processAllAvailable()
      assert(spark.table("ngsi_http_405").count() == 1)
    } finally q.stop()
  }
}
