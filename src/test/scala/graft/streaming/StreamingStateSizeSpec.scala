package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec
import StatefulOps._

/** MEASURED streaming state size — the state-store numbers behind the
  * prose claims, read from `StreamingQueryProgress.stateOperators`
  * (`numRowsTotal` / `memoryUsedBytes`, the same metrics a production
  * monitor alerts on), not asserted from the operator's design.
  *
  * Two state disciplines, two claims:
  *  - bootstrapCiStream: state is (n, Σc, Σw[B], Σwc[B]) per event_type —
  *    FIXED width per group forever. Measured: state rows == group count
  *    after every chunk, and stay flat when the corpus doubles.
  *  - retentionStream: state is (cohort, emitted-offset set) per user —
  *    rows grow with the KEY domain (users), never with event volume.
  *    Measured: rows == distinct users, flat under replayed extra events
  *    for the same users.
  *
  * The 100 TB reading: these are exactly the two shapes that survive an
  * unbounded stream — O(groups)- or O(keys)-sized stores that a state
  * backend shards by key — and the measurement here is the local[4]
  * witness that no per-event residue accumulates. */
class StreamingStateSizeSpec extends SparkSpec {
  import spark.implicits._

  private def stateRowsAndBytes(q: StreamingQuery): (Long, Long) = {
    val ops = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
    assert(ops.nonEmpty, "no stateOperators progress reported")
    (ops.map(_.numRowsTotal).max, ops.map(_.memoryUsedBytes).max)
  }

  test("bootstrap CI state is fixed-width per group: rows == groups, flat as the corpus doubles (measured)") {
    implicit val sqlCtx = spark.sqlContext
    val types = (0 until 5).map(t => s"ty$t")
    def chunk(base: Long, n: Int): Seq[BootEvent] =
      (0 until n).map(i =>
        BootEvent(types((i % types.size)), base + i, 100L + i % 37))

    val in = MemoryStream[BootEvent]
    val q = bootstrapCiStream(in.toDS()).writeStream
      .format("memory").queryName("state_bootci")
      .outputMode("update").start()
    try {
      in.addData(chunk(0, 400)); q.processAllAvailable()
      val (rows1, bytes1) = stateRowsAndBytes(q)
      assert(rows1 == types.size.toLong,
        s"state rows $rows1 != ${types.size} groups")
      // double the corpus: state must NOT move — same groups, same width
      in.addData(chunk(1000, 400)); q.processAllAvailable()
      in.addData(chunk(2000, 800)); q.processAllAvailable()
      val (rows2, bytes2) = stateRowsAndBytes(q)
      assert(rows2 == types.size.toLong,
        s"state rows grew with corpus: $rows2 after 4x the events")
      info(f"bootstrap CI state: $rows2 rows, $bytes2%,d B after 1,600 events " +
        f"(${bytes2 / rows2}%,d B/group, B=${graft.operators.Relational.BootReplicas} replicas; " +
        f"first-chunk $bytes1%,d B)")
      // sanity ceiling: 2·B longs + key + row overhead, generously 64 KiB/group
      assert(bytes2 / rows2 < 65536, s"per-group state unexpectedly fat: ${bytes2 / rows2} B")
    } finally q.stop()
  }

  test("retention state is key-domain-sized: rows == users, flat under replayed event volume (measured)") {
    implicit val sqlCtx = spark.sqlContext
    val users = 50
    def events(base: Long): Seq[RetEvent] =
      (0 until users).flatMap(u =>
        (0 until 8).map(k => RetEvent(u.toLong, base + (u + k * 3) % 28)))

    val in = MemoryStream[RetEvent]
    val q = retentionStream(in.toDS()).writeStream
      .format("memory").queryName("state_retention")
      .outputMode("append").start()
    try {
      in.addData(events(19000)); q.processAllAvailable()
      val (rows1, _) = stateRowsAndBytes(q)
      assert(rows1 == users.toLong, s"state rows $rows1 != $users users")
      // 3x more events, SAME users/weeks: state rows must not move
      (1 to 3).foreach { _ => in.addData(events(19000)); q.processAllAvailable() }
      val (rows2, bytes2) = stateRowsAndBytes(q)
      assert(rows2 == users.toLong,
        s"state rows grew with event volume: $rows2")
      info(f"retention state: $rows2 rows, $bytes2%,d B " +
        f"(${bytes2 / rows2}%,d B/user) after 4x replay of ${users * 8} events")
      assert(bytes2 / rows2 < 16384, s"per-user state unexpectedly fat: ${bytes2 / rows2} B")
    } finally q.stop()
  }
}
