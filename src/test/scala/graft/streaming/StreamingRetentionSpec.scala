package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._

import graft.SparkSpec
import StatefulOps._

/** Batch==stream for weekly cohort retention: the real sf0.001 events
  * replayed ts-ordered across micro-batches through [[StatefulOps
  * .retentionStream]] must produce an Append-mode (user, cohort, offset)
  * activation log whose census equals batch q79_retention_cohorts exactly
  * — same cohorts, same offsets, same distinct-user counts. */
class StreamingRetentionSpec extends SparkSpec {
  import spark.implicits._

  test("streamed retention census equals batch q79 on ts-ordered replay") {
    implicit val sqlCtx = spark.sqlContext

    val ev = graft.Tables.load(spark, sfDir, "events")
      .selectExpr("user_id", "datediff(cast(ts as date), date'1970-01-01') as day",
        "ts")
      .orderBy(col("ts"))
      .select(col("user_id"), col("day"))
      .as[(Long, Long)].collect().map { case (u, d) => RetEvent(u, d) }

    val in = MemoryStream[RetEvent]
    val q = retentionStream(in.toDS()).writeStream
      .format("memory").queryName("retention_rows")
      .outputMode(OutputMode.Append())
      .start()
    try {
      var lastCount = 0L
      ev.grouped((ev.length + 2) / 3).foreach { chunk =>
        in.addData(chunk.toSeq)
        q.processAllAvailable()
        // append-only: the emitted log only grows
        val n = spark.table("retention_rows").count()
        assert(n >= lastCount)
        lastCount = n
      }
      val rows = spark.table("retention_rows").as[RetRow].collect()
      // one row per (user, offset): a user's week activates exactly once
      assert(rows.map(r => (r.user_id, r.offset_weeks)).distinct.length == rows.length)
      val census = rows.groupBy(r => (r.cohort_day, r.offset_weeks))
        .map { case ((cd, off), v) =>
          (java.time.LocalDate.ofEpochDay(cd).toString, off) -> v.length.toLong
        }
      val batch = graft.operators.Relational
        .queries("q79_retention_cohorts")(spark, sfDir)
        .selectExpr("cast(cohort_week as date) as cw", "week_offset", "n_users")
        .collect()
        .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
      assert(census == batch)
    } finally q.stop()
  }

  test("pre-1970 cohorts keep one stable Monday-aligned cohort across batches") {
    implicit val sqlCtx = spark.sqlContext
    // 1969-12-27 is a Saturday: epoch-day −5, whose Monday is −10
    // (1969-12-22). Under the old negative-sentinel state every batch
    // re-initialized the cohort (cohortDay < 0 always true) and the signed
    // `%` mis-aligned the week to Wednesday; this pins the fixed contract:
    // ONE cohort, Monday-aligned, no duplicate (user, offset) rows.
    val in = MemoryStream[RetEvent]
    val q = retentionStream(in.toDS()).writeStream
      .format("memory").queryName("retention_pre1970")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData(RetEvent(7L, -5L)); q.processAllAvailable()  // Sat 1969-12-27
      in.addData(RetEvent(7L, -3L)); q.processAllAvailable()  // Mon 1969-12-29
      in.addData(RetEvent(7L, 4L));  q.processAllAvailable()  // Mon 1970-01-05
      val rows = spark.table("retention_pre1970").as[RetRow].collect().sortBy(_.offset_weeks)
      assert(rows.forall(_.cohort_day == -10L),
        s"cohort must stay pinned to Monday 1969-12-22 (−10): ${rows.toSeq}")
      assert(rows.map(_.offset_weeks).toSeq == Seq(0L, 1L, 2L), rows.toSeq)
      assert(rows.map(r => (r.user_id, r.offset_weeks)).distinct.length == rows.length)
    } finally q.stop()
  }
}
