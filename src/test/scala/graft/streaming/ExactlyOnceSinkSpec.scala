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

  test("retractable MV: deletes retract count/sum AND resurface prior min/max") {
    import StatefulOps.{CdcOp, retractableMvStream}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[CdcOp]
    val q = retractableMvStream(mem.toDS())
      .writeStream.format("memory").queryName("rmv")
      .outputMode("update").start()
    def latest(): Map[Long, (Long, Long, Option[Long], Option[Long])] =
      spark.table("rmv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .groupBy(_._1).view
        // update mode appends rows to the memory sink; per user keep the
        // LAST emission — states are cumulative so n identifies recency
        // only per batch; use table order instead
        .mapValues(rows => rows.last).toMap
        .map { case (k, v) => k -> (v._2, v._3, v._4, v._5) }
    try {
      // user 1: values 10, 20, 30 → min 10 max 30
      mem.addData(CdcOp(1, 1, "I", 10), CdcOp(1, 2, "I", 20),
        CdcOp(1, 3, "I", 30))
      q.processAllAvailable()
      assert(latest()(1L) == ((3L, 60L, Some(10L), Some(30L))))
      // delete the MIN and the MAX: second-smallest/-largest resurface
      mem.addData(CdcOp(1, 4, "D", 10), CdcOp(1, 5, "D", 30))
      q.processAllAvailable()
      assert(latest()(1L) == ((1L, 20L, Some(20L), Some(20L))))
      // duplicate value counts: two 20s, deleting one keeps min/max
      mem.addData(CdcOp(1, 6, "I", 20), CdcOp(1, 7, "D", 20))
      q.processAllAvailable()
      assert(latest()(1L) == ((1L, 20L, Some(20L), Some(20L))))
      // delete-to-empty and a stray delete of a non-live value (ignored)
      mem.addData(CdcOp(1, 8, "D", 20), CdcOp(1, 9, "D", 999))
      q.processAllAvailable()
      assert(latest()(1L) == ((0L, 0L, None, None)))
    } finally q.stop()
  }

  test("retractable MV equals a batch recompute of the live set on real events") {
    import StatefulOps.{CdcOp, retractableMvStream}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select("user_id", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(2).*(100).toLongExact))
      .sortBy(_._2)
    // CDC log: insert everything in event order, then delete every 3rd row
    val inserts = ev.zipWithIndex.map { case ((u, _, c), i) =>
      CdcOp(u, i.toLong, "I", c) }
    val deletes = ev.zipWithIndex.collect { case ((u, _, c), i) if i % 3 == 0 =>
      CdcOp(u, (ev.length + i).toLong, "D", c) }
    val live = ev.zipWithIndex.collect { case ((u, _, c), i) if i % 3 != 0 =>
      (u, c) }
    val expected = live.groupBy(_._1).view.mapValues { g =>
      val cs = g.map(_._2)
      (cs.length.toLong, cs.sum, Some(cs.min), Some(cs.max))
    }.toMap
    val mem = MemoryStream[CdcOp]
    val q = retractableMvStream(mem.toDS())
      .writeStream.format("memory").queryName("rmv2")
      .outputMode("update").start()
    val got = try {
      mem.addData(inserts.toSeq); q.processAllAvailable()
      mem.addData(deletes.toSeq); q.processAllAvailable()
      spark.table("rmv2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .groupBy(_._1).view.mapValues(_.last).toMap
        .map { case (k, v) => k -> (v._2, v._3, v._4, v._5) }
    } finally q.stop()
    // every user had at least one delete (i % 3 == 0 hits each user with
    // >= 3 events almost surely) — compare the final row per user
    val gotLive = got.filter { case (_, (n, _, _, _)) => n > 0 }
    assert(gotLive == expected.filter(_._2._1 > 0))
  }
}
