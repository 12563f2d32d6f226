package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.{Relational, Sketches, TextFns}
import StatefulOps._

/** Batch==stream parity for the newest curation operators (funnel, CMS),
  * extending the proof StreamingTextSpec gives for gopherRules: the same
  * semantics hold whether the events arrive as a table or as a replayed
  * log of micro-batches. */
class StreamingFunnelCmsSpec extends SparkSpec with Matchers {

  test("streaming funnel matches the batch funnel on a ts-ordered replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val batchRows = Relational.queries("q68_funnel")(s, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getTimestamp(1), Option(r.getTimestamp(2)).orNull,
          Option(r.getTimestamp(3)).orNull, r.getLong(4))).toMap
    assert(batchRows.nonEmpty)

    // replay the events table as a time-ordered log in three micro-batches
    val log = graft.Tables.load(s, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .orderBy(col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .collect()
      .map { case (u, t, ts) => FunnelEvent(u, t, ts) }
    val chunks = log.grouped((log.length + 2) / 3).toSeq

    val mem = MemoryStream[FunnelEvent]
    val q = funnelStream(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    val streamed =
      try {
        chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
        s.table("funnel_stream").collect()
      } finally q.stop()

    // update-mode emissions are strictly stage-increasing per user, so the
    // max-stage row is each user's final funnel state
    val finalRows = streamed
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4)))
      .groupBy(_._1).map { case (u, rows) => u -> {
        val last = rows.maxBy(_._5)
        (last._2, last._3, last._4, last._5)
      } }
    finalRows should have size batchRows.size.toLong
    finalRows.foreach { case (u, got) =>
      assert(got == batchRows(u), s"user $u: stream=$got batch=${batchRows(u)}")
    }
  }

  test("streaming transitions match the batch q92 matrix on a ts-ordered replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val batchCounts = Relational.queries("q92_event_transitions")(s, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(batchCounts.nonEmpty)

    val log = graft.Tables.load(s, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .orderBy(col("ts"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long)]
      .collect()
      .map { case (u, t, ts, id) => TransEvent(u, t, ts, id) }
    val chunks = log.grouped((log.length + 2) / 3).toSeq

    val mem = MemoryStream[TransEvent]
    val q = transitionStream(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("trans_stream")
      .outputMode("append").start()
    val streamed =
      try {
        chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
        s.table("trans_stream").collect()
      } finally q.stop()

    val streamCounts = streamed
      .map(r => (r.getString(1), r.getString(2)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(streamCounts == batchCounts)
  }

  test("streaming SCD2 matches the batch q122 closed intervals on a ts-ordered replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // batch truth: q122's rows with valid_to set (the open run per user
    // is stream STATE, not output — it has no valid_to yet)
    val batchClosed = Relational.queries("q122_scd2_compact")(s, sfDir)
      .filter(col("valid_to").isNotNull).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4))).toSet
    assert(batchClosed.nonEmpty)

    val log = graft.Tables.load(s, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .orderBy(col("ts"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long)]
      .collect()
      .map { case (u, t, ts, id) => Scd2Event(u, t, ts, id) }
    val chunks = log.grouped((log.length + 2) / 3).toSeq

    val mem = MemoryStream[Scd2Event]
    val q = scd2Stream(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("scd2_stream")
      .outputMode("append").start()
    val streamed =
      try {
        chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
        s.table("scd2_stream").collect()
      } finally q.stop()

    val streamSet = streamed.map(r => (r.getLong(0), r.getString(1),
      r.getTimestamp(2), r.getTimestamp(3), r.getLong(4))).toSet
    assert(streamSet == batchClosed)
  }

  test("streaming MV refresh matches batch q146 bit-for-bit under a SHUFFLED replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val batch = Relational.queries("q146_mv_refresh")(s, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(batch.nonEmpty)

    // deliberately NOT time-ordered: md5-shuffled replay — the mergeable
    // state has no ordering contract, so the result must still be exact
    val log = graft.Tables.load(s, sfDir, "events")
      .select(col("user_id"), col("value"))
      .orderBy(md5(concat_ws("|", col("event_id"), col("user_id"))))
      .as[(Long, Double)].collect()
      .map { case (u, v) => MvEvent(u, v) }
    val chunks = log.grouped((log.length + 3) / 4).toSeq

    val mem = MemoryStream[MvEvent]
    val q = mvRefreshStream(mem.toDS())
      .writeStream.format("memory").queryName("mv_stream")
      .outputMode("update").start()
    val streamed =
      try {
        chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
        // update mode re-emits a key's row each batch it changes in; the
        // LAST emission per key is the final state
        s.table("mv_stream").collect()
      } finally q.stop()
    val finalPerKey = streamed.zipWithIndex
      .groupBy(_._1.getLong(0))
      .map { case (uid, rows) =>
        val r = rows.maxBy(_._2)._1
        uid -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      }
    assert(finalPerKey == batch)
  }

  test("streaming coverage matches the batch q89 interval union on a ts-ordered replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val batchRows = Relational.queries("q89_interval_union")(s, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(batchRows.nonEmpty)

    val log = graft.Tables.load(s, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"))
      .orderBy(col("unix_micros(ts)"), col("event_id"))
      .as[(Long, Long, Long)]
      .collect()
      .map { case (u, st, id) => CoverageEvent(u, st, id) }
    val chunks = log.grouped((log.length + 2) / 3).toSeq

    val mem = MemoryStream[CoverageEvent]
    val q = coverageStream(mem.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("coverage_stream")
      .outputMode("update").start()
    val streamed =
      try {
        chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
        s.table("coverage_stream").collect()
      } finally q.stop()

    // n_events grows monotonically, so the max-n_events row is final state
    val finalRows = streamed
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).map { case (u, rows) => u -> {
        val last = rows.maxBy(_._3)
        (last._2, last._3, last._4)
      } }
    assert(finalRows == batchRows)
  }

  test("watermarked funnel matches batch under shuffled-within-horizon replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val batchRows = Relational.queries("q68_funnel")(s, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getTimestamp(1), Option(r.getTimestamp(2)).orNull,
          Option(r.getTimestamp(3)).orNull, r.getLong(4))).toMap
    assert(batchRows.nonEmpty)

    // replay the events table bucketed by day with EVERY bucket internally
    // shuffled (seeded) — worst-case disorder inside the watermark horizon;
    // the 49h delay exceeds any possible regression across adjacent buckets
    val log = graft.Tables.load(s, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .collect()
      .map { case (u, t, ts) => FunnelEvent(u, t, ts) }
    val rnd = new scala.util.Random(42)
    val buckets = log.groupBy(_.ts.getTime / (24L * 3600 * 1000)).toSeq
      .sortBy(_._1)
      .map { case (_, evs) => rnd.shuffle(evs.toSeq) }
    assert(buckets.size > 3, "expected a multi-day event log")

    val mem = MemoryStream[FunnelEvent]
    val q = funnelStreamWatermarked(mem.toDS(), delay = "49 hours")
      .writeStream.format("memory").queryName("funnel_wm_stream")
      .outputMode("update").start()
    val streamed =
      try {
        buckets.foreach { b => mem.addData(b); q.processAllAvailable() }
        // sentinel far past the horizon: pushes the watermark over every
        // held event so the buffered tail folds and emits via timeouts
        val maxTs = log.map(_.ts.getTime).max
        mem.addData(Seq(FunnelEvent(-1L, "noop",
          new java.sql.Timestamp(maxTs + 80L * 3600 * 1000))))
        q.processAllAvailable()
        s.table("funnel_wm_stream").collect()
      } finally q.stop()

    val finalRows = streamed
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4)))
      .groupBy(_._1).map { case (u, rows) => u -> {
        val last = rows.maxBy(_._5)
        (last._2, last._3, last._4, last._5)
      } }
    finalRows should have size batchRows.size.toLong
    finalRows.foreach { case (u, got) =>
      assert(got == batchRows(u), s"user $u: stream=$got batch=${batchRows(u)}")
    }
  }

  test("watermarked funnel heals a view arriving before its signup") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

    val mem = MemoryStream[FunnelEvent]
    val q = funnelStreamWatermarked(mem.toDS(), delay = "1 hour")
      .writeStream.format("memory").queryName("funnel_heal")
      .outputMode("update").start()
    try {
      // the view (t=10) arrives a batch BEFORE the signup (t=5): the plain
      // funnelStream would discard it (no signup yet) and stop at stage 1
      mem.addData(Seq(FunnelEvent(7L, "view", ts(10))))
      q.processAllAvailable()
      mem.addData(Seq(FunnelEvent(7L, "signup", ts(5)),
        FunnelEvent(7L, "purchase", ts(20))))
      q.processAllAvailable()
      mem.addData(Seq(FunnelEvent(-1L, "noop", ts(600)))) // flush horizon
      q.processAllAvailable()
      val last = s.table("funnel_heal").collect()
        .filter(_.getLong(0) == 7L).maxBy(_.getLong(4))
      assert(last.getLong(4) == 3L,
        s"expected full funnel after healing, got stage ${last.getLong(4)}")
      assert(last.getTimestamp(1) == ts(5) && last.getTimestamp(2) == ts(10) &&
        last.getTimestamp(3) == ts(20))
    } finally q.stop()
  }

  test("streaming CMS matches the batch sketch and the merge law holds") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val docs = graft.Tables.load(s, sfDir, "documents")
    val terms = docs.select(explode(TextFns.toks(col("text"))).as("term"))
    val batchTable = Sketches.cmsTable(
        terms.groupBy(col("term")).agg(count(lit(1)).as("n")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

    val raw = terms.as[String].collect()
    val mem = MemoryStream[String]
    val q = Sketches.cmsFromTerms(mem.toDF().select(col("value").as("term")))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    val cells =
      try {
        raw.grouped((raw.length + 2) / 3).foreach { c =>
          mem.addData(c.toSeq); q.processAllAvailable()
        }
        s.table("cms_stream").collect() match {
          case Array(row) => row.getSeq[Long](0)
          case other => fail(s"expected one complete-mode row, got ${other.length}")
        }
      } finally q.stop()
    val streamTable = Sketches.cellsToTable(cells)
      .map { case (r, b, n) => (r, b.toLong, n) }.toSet
    assert(streamTable == batchTable)

    // merge law: chunked reduce + merge == one-pass reduce (the property
    // that makes partial aggregation and cross-batch state sound)
    val onePass = raw.foldLeft(Sketches.CmsAggregate.zero)(Sketches.CmsAggregate.reduce)
    val merged = raw.grouped(997)
      .map(c => c.foldLeft(Sketches.CmsAggregate.zero)(Sketches.CmsAggregate.reduce))
      .reduce(Sketches.CmsAggregate.merge)
    assert(onePass.sameElements(merged))
  }

  test("streaming Misra-Gries upholds the guarantee; exact pass-2 equals batch q121") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val raw = graft.Tables.load(s, sfDir, "events")
      .select(col("user_id").cast("string").as("k")).as[String].collect()
    val mem = MemoryStream[String]
    val q = Sketches.mgFromKeys(mem.toDF().select(col("value").as("k")))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    val summary =
      try {
        raw.grouped((raw.length + 3) / 4).foreach { c =>
          mem.addData(c.toSeq); q.processAllAvailable()
        }
        s.table("mg_stream").collect() match {
          case Array(row) => row.getMap[String, Long](0).toMap
          case other => fail(s"expected one complete-mode row, got ${other.length}")
        }
      } finally q.stop()

    val trueCounts = raw.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val total = raw.length.toLong
    // bounded state, whatever the micro-batch split
    assert(summary.size <= Sketches.MgK)
    // the MG guarantee: every heavy key survives the stream's merges
    val heavy = trueCounts.filter { case (_, n) => n * (Sketches.MgK + 1) > total }
    assert(heavy.nonEmpty, "events user_ids must contain heavy hitters")
    heavy.foreach { case (k, _) =>
      assert(summary.contains(k), s"heavy key $k evicted — guarantee broken")
    }
    // weights undercount only, by at most total/(MgK+1)
    summary.foreach { case (k, w) =>
      val n = trueCounts.getOrElse(k, 0L)
      assert(w <= n, s"key $k overcounted: $w > $n")
      assert(n - w <= total / (Sketches.MgK + 1), s"key $k undercount too deep")
    }
    // exact pass-2 census over the STREAMED candidates == batch q121
    val streamed = summary.keySet.map(k => (k, trueCounts.getOrElse(k, 0L), total))
      .filter { case (_, n, t) => n * (Sketches.MgK + 1) > t }
    val batch = Sketches.queries("q121_heavy_hitters")(s, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("streaming decayed counts match batch q188 on a ts-ordered replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val batch = Relational.queries("q188_decayed_counts")(s, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(batch.nonEmpty)

    def mic(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    val dayUs = 86400L * 1000000
    val log = graft.Tables.load(s, sfDir, "events")
      .select(col("event_type"), col("ts"), col("value"), col("event_id"))
      .collect()
      .map { r =>
        val us = mic(r.getTimestamp(1))
        (DecayEvent(r.getString(0), (us - Math.floorMod(us, dayUs)) / dayUs,
          BigDecimal(r.getDouble(2)).setScale(2).*(100).toLongExact),
          us, r.getLong(3))
      }
      .sortBy(e => (e._2, e._3)).map(_._1)
    val chunks = log.grouped((log.length + 2) / 3).toSeq

    val mem = MemoryStream[DecayEvent]
    val q = decayedCountsStream(mem.toDS())
      .writeStream.format("memory").queryName("decay_stream")
      .outputMode("update").start()
    val streamed = try {
      chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
      s.table("decay_stream").collect()
    } finally q.stop()
    // update mode appends each emission; keep the LAST row per type
    val finalRows = streamed.zipWithIndex
      .groupBy(_._1.getString(0)).view
      .mapValues { rs =>
        val r = rs.maxBy(_._2)._1
        (r.getLong(1), r.getDouble(2), r.getDouble(3))
      }.toMap
    assert(finalRows == batch)
    // state boundedness: the decay map can never exceed 31 day slots —
    // structurally guaranteed by the eviction filter; pin the horizon math
    assert(log.map(_.day_idx).distinct.length > 1)
  }
}
