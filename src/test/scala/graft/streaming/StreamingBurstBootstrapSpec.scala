package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import StatefulOps._

/** Batch==stream twins for the round-10 monitoring tier: the term-burst
  * board (q224) and the Poisson-bootstrap CI (q223), both replayed from
  * the real sf-dir events through their stateful operators and compared
  * to the batch queries row for row.
  *
  * The two twins pin OPPOSITE state disciplines: bursts need an ORDERED
  * replay (the verdict for a day freezes once the day leaves the pruned
  * horizon — exactly the batch-parity window the operator documents),
  * while the bootstrap is replayed SHUFFLED on purpose — every piece of
  * its state is a commutative integer sum, so arrival order must not be
  * able to move a single bit of the emitted CI. */
class StreamingBurstBootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("streamed bursts equal batch q224 on day-ordered replay") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("item"),
        unix_date(to_date(col("ts"))).cast("long").as("day"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._2, t._3))
      .map(t => BurstEvent(t._1, t._2))
    val mind = ev.map(_.day).min
    val chunks = ev.grouped((ev.length + 2) / 3).toSeq

    val in = MemoryStream[BurstEvent]
    val q = burstStream(in.toDS(), mind).writeStream
      .format("memory").queryName("burst_rows")
      .outputMode("update").start()
    val streamed = try {
      chunks.foreach { c => in.addData(c.toSeq); q.processAllAvailable() }
      spark.table("burst_rows").collect()
    } finally q.stop()
    // update mode re-emits refreshed rows; keep the LAST per (item, day)
    val finalRows = streamed.zipWithIndex
      .groupBy(r => (r._1.getLong(0), r._1.getLong(1))).view
      .mapValues { rs =>
        val r = rs.maxBy(_._2)._1
        (r.getLong(2), r.getLong(3), r.getBoolean(4))
      }.toMap
    val batch = graft.operators.Relational
      .queries("q224_term_bursts")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(finalRows == batch)
    assert(finalRows.values.exists(_._3))
  }

  test("bootCiPick degenerate arms mirror the batch rank lookup") {
    // no real md5 weight stream can reach <3 live replicas (prob ~1e-27),
    // so the guard is pinned on the factored-out pure function instead:
    // 0/1 means → NULL CI and NULL verdict (batch: rank 2 / rank n−1
    // don't exist); exactly 2 → CROSSED bounds lo=means(1), hi=means(0),
    // the literal batch rank lookup; ≥3 → the normal percentile pick.
    assert(StatefulOps.bootCiPick(Vector.empty, 5L) == (None, None, None))
    assert(StatefulOps.bootCiPick(Vector(7L), 5L) == (None, None, None))
    assert(StatefulOps.bootCiPick(Vector(3L, 9L), 5L) ==
      (Some(9L), Some(3L), Some(false)))
    assert(StatefulOps.bootCiPick(Vector(1L, 4L, 9L, 12L), 5L) ==
      (Some(4L), Some(9L), Some(true)))
    assert(StatefulOps.bootCiPick(Vector(1L, 4L, 9L, 12L), 20L) ==
      (Some(4L), Some(9L), Some(false)))
  }

  test("streamed bootstrap CI equals batch q223 under SHUFFLED replay") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("event_id"), col("value"))
      .collect().map(r => BootEvent(r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(2).*(100).toLongExact))
    // deliberate disorder: shuffle with a fixed seed, then chunk
    val shuffled = new scala.util.Random(7).shuffle(ev.toSeq)
    val chunks = shuffled.grouped((shuffled.length + 2) / 3).toSeq

    val in = MemoryStream[BootEvent]
    val q = bootstrapCiStream(in.toDS()).writeStream
      .format("memory").queryName("bootci_rows")
      .outputMode("update").start()
    val streamed = try {
      chunks.foreach { c => in.addData(c); q.processAllAvailable() }
      spark.table("bootci_rows").collect()
    } finally q.stop()
    val finalRows = streamed.zipWithIndex
      .groupBy(_._1.getString(0)).view
      .mapValues { rs =>
        val r = rs.maxBy(_._2)._1
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6))
      }.toMap
    val batch = graft.operators.Relational
      .queries("q223_bootstrap_ci")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(finalRows == batch)
  }
}
