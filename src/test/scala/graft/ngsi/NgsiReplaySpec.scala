package graft.ngsi

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.streaming.NgsiStreams

/** Batch replay contract: a capture directory of raw notifications replayed
  * through [[NgsiPipelines.replayCaptured]] must produce exactly the same
  * windowed result as streaming the same notifications — Structured
  * Streaming's unified model, proven rather than assumed. */
class NgsiReplaySpec extends SparkSpec with Matchers {

  private val bodies = Seq(
    (NgsiFixtures.flatSensorAt("R1", 30.0), 0L),
    (NgsiFixtures.flatSensorAt("R1", 22.0), 1000L),
    (NgsiFixtures.flatSensorAt("R2", 45.0), 1500L),
    (NgsiFixtures.flatSensorAt("R2", 41.5), 6000L),
    // pretty-printed (embedded newlines) — a CSV capture quotes the field
    // across lines, so replay must read with multiLine
    (NgsiFixtures.flatSensorAt("R3", 17.5).replace(",", ",\n"), 2500L))

  private def resultKey(rows: Array[org.apache.spark.sql.Row]) =
    rows.map { r =>
      val w = r.getStruct(r.fieldIndex("window"))
      ((w.getTimestamp(0).getTime, w.getTimestamp(1).getTime,
        r.getAs[String]("id")), r.getAs[Float]("temperature_min"))
    }.toMap

  test("replayed capture == streamed notifications for the example1 pipeline") {
    val s = spark
    import s.implicits._

    // 1. capture: persist the raw notification bodies as parquet (what a
    //    foreachBatch capture sink of the HTTP source would write)
    val dir = Files.createTempDirectory("ngsi-capture").toFile
    dir.deleteOnExit()
    val capture = bodies.toDF("value", "ms")
      .select(col("value"), timestamp_millis(col("ms")).as("recvTime"))
    capture.write.mode("overwrite").parquet(dir.getAbsolutePath)

    // 2. batch replay through the identical pipeline
    val batch = NgsiPipelines.minTemperature(
      NgsiPipelines.replayCaptured(s, dir.getAbsolutePath),
      windowDur = "5 seconds", slide = "5 seconds")
      .collect()

    // 3. stream the same bodies
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, Long)]
    val raw = mem.toDF()
      .select(col("_1").as("value"), timestamp_millis(col("_2")).as("recvTime"))
    val out = NgsiStreams.minTemperatureStream(raw, "10 seconds", "5 seconds", "5 seconds")
    val q = out.writeStream.format("memory").queryName("ngsi_replay_stream")
      .outputMode("update").start()
    val streamed =
      try {
        mem.addData(bodies: _*)
        q.processAllAvailable()
        s.table("ngsi_replay_stream").collect()
      } finally q.stop()

    val batchMap = resultKey(batch)
    val streamMap = resultKey(streamed)
    batchMap should not be empty
    batchMap shouldBe streamMap
  }

  test("JSON and CSV captures replay identically to parquet") {
    val s = spark
    import s.implicits._
    val capture = bodies.toDF("value", "ms")
      .select(col("value"), timestamp_millis(col("ms")).as("recvTime"))
    def replayVia(format: String): Map[(Long, Long, String), Float] = {
      val dir = Files.createTempDirectory(s"ngsi-capture-$format").toFile
      dir.deleteOnExit()
      format match {
        case "csv" => capture.write.mode("overwrite")
          .option("header", "true").csv(dir.getAbsolutePath)
        case f => capture.write.mode("overwrite").format(f).save(dir.getAbsolutePath)
      }
      resultKey(NgsiPipelines.minTemperature(
        NgsiPipelines.replayCaptured(s, dir.getAbsolutePath, format),
        windowDur = "5 seconds", slide = "5 seconds").collect())
    }
    val viaParquet = replayVia("parquet")
    viaParquet should not be empty
    replayVia("json") shouldBe viaParquet
    replayVia("csv") shouldBe viaParquet
  }
}
