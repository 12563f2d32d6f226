package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import StatefulOps._

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("firstSeen: duplicates dropped within and across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Keyed]
    val q = firstSeen(in.toDS(), idleTimeout = None).writeStream
      .format("memory").queryName("first_seen")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData(Keyed("h1", "a"), Keyed("h1", "b"), Keyed("h2", "c"))
      q.processAllAvailable()
      in.addData(Keyed("h1", "d"), Keyed("h3", "e"))
      q.processAllAvailable()
      val out = spark.table("first_seen").as[Keyed].collect()
      assert(out.map(_.key).sorted.toSeq == Seq("h1", "h2", "h3"))
      // the FIRST payload won for h1, both in-batch and cross-batch
      assert(out.find(_.key == "h1").get.payload == "a")
    } finally q.stop()
  }

  test("firstSeenBySignature: signature-identical docs deduped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = firstSeenBySignature(in.toDS(), idleTimeout = None).writeStream
      .format("memory").queryName("sig_dedup")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val text = "key agg row scan slow fast table value part hash merge batch"
      in.addData(Doc(1, text), Doc(2, "totally different words in this one here yes"))
      q.processAllAvailable()
      in.addData(Doc(3, text), Doc(4, "short")) // exact re-arrival + short doc
      q.processAllAvailable()
      in.addData(Doc(5, "short")) // short-doc exact dup
      q.processAllAvailable()
      val out = spark.table("sig_dedup").as[Doc].collect().map(_.doc_id).sorted.toSeq
      assert(out == Seq(1L, 2L, 4L), s"got $out")
    } finally q.stop()
  }

  test("runningMin: minimum tightens monotonically per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedValue]
    val q = runningMin(in.toDS(), idleTimeout = None).writeStream
      .format("memory").queryName("running_min")
      .outputMode(OutputMode.Update())
      .start()
    try {
      in.addData(KeyedValue("R1", 21.5f), KeyedValue("R1", 19.0f), KeyedValue("R2", 30.0f))
      q.processAllAvailable()
      in.addData(KeyedValue("R1", 20.0f), KeyedValue("R2", 25.5f))
      q.processAllAvailable()
      val rows = spark.table("running_min").as[RunningMin].collect()
      // batch 1: R1 -> 19.0, R2 -> 30.0 ; batch 2: R1 stays 19.0, R2 -> 25.5
      val byBatchR1 = rows.filter(_.key == "R1").map(_.min).toSeq
      assert(byBatchR1 == Seq(19.0f, 19.0f))
      val byBatchR2 = rows.filter(_.key == "R2").map(_.min).toSeq
      assert(byBatchR2 == Seq(30.0f, 25.5f))
    } finally q.stop()
  }
}
