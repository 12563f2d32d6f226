package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The at-least-once -> exactly-once upgrade: replayed batch ids are
  * no-ops, uncommitted data is invisible, crash-between-write-and-commit
  * recovers without duplication. */
class ExactlyOnceSinkSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch replays and half-written batches never duplicate rows") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("eos").toString
    val mem = MemoryStream[Long]
    val q = mem.toDF().select(col("value"))
      .writeStream
      .foreachBatch(ExactlyOnceSink.writer(root))
      .option("checkpointLocation", s"$root/_ckpt")
      .start()
    try {
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
      mem.addData(10L, 20L)
      q.processAllAvailable()
    } finally q.stop()
    val after2 = ExactlyOnceSink.read(spark, root)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after2 == Seq(1L, 2L, 3L, 10L, 20L))

    // REPLAY batch 0 with different content (the at-least-once failure
    // mode): the committed id must make it a no-op.
    ExactlyOnceSink.writer(root)(
      Seq(99L, 98L).toDF("value"), 0L)
    val afterReplay = ExactlyOnceSink.read(spark, root)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(afterReplay == Seq(1L, 2L, 3L, 10L, 20L),
      "replayed batch id must not change committed output")

    // crash-between-write-and-commit: data present, no marker -> invisible;
    // the retry (same id, overwrite) commits exactly once.
    Seq(7L).toDF("value").write.mode("overwrite")
      .parquet(s"$root/data/batch=5")
    assert(ExactlyOnceSink.read(spark, root)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 10L, 20L),
      "uncommitted data must be invisible to readers")
    ExactlyOnceSink.writer(root)(Seq(7L, 8L).toDF("value"), 5L)
    assert(ExactlyOnceSink.read(spark, root)
      .collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 7L, 8L, 10L, 20L))
    // and a second retry of the now-committed batch is a no-op
    ExactlyOnceSink.writer(root)(Seq(55L).toDF("value"), 5L)
    assert(ExactlyOnceSink.read(spark, root).count() == 7)
  }
}
