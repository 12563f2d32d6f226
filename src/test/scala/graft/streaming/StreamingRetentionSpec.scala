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
}
