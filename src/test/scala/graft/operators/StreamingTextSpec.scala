package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Unified-model proof for the LLM-pipeline extensions: the quality filter
  * chain is a pure narrow projection, so the SAME function runs on a batch
  * frame and a stream and yields identical rows — the property that lets a
  * 100 TB backfill and the live ingest filter share one code path. */
class StreamingTextSpec extends SparkSpec with Matchers {

  test("gopher quality rules produce identical results on batch and stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val docs = Seq(
      // 80 tokens: INSIDE the 20-90 band, so only rep_ratio can fail it
      (1L, Seq.fill(20)("alpha beta gamma delta").mkString(" ")), // repetitive
      (2L, (1 to 40).map(i => s"tok$i").mkString(" ")),           // diverse
      (3L, "short doc"),                                          // too short
      (4L, (1 to 60).map(i => s"w$i!!").mkString(" ")))           // symbol-heavy

    val batch = TextAnalysis.gopherRules(docs.toDF("doc_id", "text")).collect()

    val mem = MemoryStream[(Long, String)]
    val q = TextAnalysis.gopherRules(
        mem.toDF().select(col("_1").as("doc_id"), col("_2").as("text")))
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    val streamed =
      try {
        mem.addData(docs: _*)
        q.processAllAvailable()
        s.table("gopher_stream").collect()
      } finally q.stop()

    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap

    val b = key(batch)
    b should have size 4
    key(streamed) shouldBe b
    // sanity on the rules themselves: doc 1 is inside every band EXCEPT
    // rep_ratio, so the failure is attributable to that rule alone
    assert(b(1L)._1 >= 20 && b(1L)._1 <= 90)
    assert(b(1L)._4 > 0.2 && !b(1L)._5, "repetitive doc must fail rep_ratio")
    assert(b(3L)._1 < 20 && !b(3L)._5, "short doc must fail the token band")
  }
}
