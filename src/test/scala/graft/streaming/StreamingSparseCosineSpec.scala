package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import StatefulOps._

/** Batch==stream for the APSS candidate stage: the streaming df-capped
  * posting state must emit exactly the per-term shared-doc pairs the batch
  * inverted-index join (q93's candidate stage) produces — and saturated
  * terms must retire with bounded state. */
class StreamingSparseCosineSpec extends SparkSpec {
  import spark.implicits._

  /** Batch recompute of the candidate contract over a doc set: one
    * (a, b, term, tf_a, tf_b) row per unordered doc pair sharing `term`,
    * for terms with 2 <= df <= dfCap. */
  private def batchCandidates(docs: Seq[Doc], dfCap: Int) = {
    val tf = docs.flatMap(d =>
      d.text.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (t, xs) => (t, d.doc_id, xs.length.toLong) })
    tf.groupBy(_._1).toSeq
      .filter { case (_, ps) => ps.size >= 2 && ps.size <= dfCap }
      .flatMap { case (t, ps) =>
        for {
          a <- ps; b <- ps if a._2 < b._2
        } yield (a._2, b._2, t, a._3, b._3)
      }.toSet
  }

  test("stream candidates == batch inverted-index candidates (no saturation)") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      Doc(1, "spark shuffle join hash hash"),
      Doc(2, "spark scan join filter"),
      Doc(3, "shuffle scan merge sort"),
      Doc(4, "unique singleton vocabulary"),
      Doc(5, "spark spark spark merge"))
    val in = MemoryStream[Doc]
    val q = sparseCandidateStream(in.toDS(), dfCap = 64).writeStream
      .format("memory").queryName("sparse_cand")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // across micro-batches: pairs must also form BETWEEN batches
      docs.grouped(2).foreach { c => in.addData(c); q.processAllAvailable() }
      val streamed = spark.table("sparse_cand").as[SharedTermPair].collect()
        .map(p => (p.doc_a, p.doc_b, p.term, p.tf_a, p.tf_b)).toSet
      assert(streamed == batchCandidates(docs, 64))
      // tf really is the per-doc term frequency (doc 5 has "spark" x3)
      assert(streamed.exists { case (_, b, t, _, tfB) =>
        t == "spark" && b == 5L && tfB == 3L })
      // df=1 terms ("unique") contribute nothing
      assert(!streamed.exists { case (_, _, t, _, _) => t == "unique" })
    } finally q.stop()
  }

  test("a term crossing the df cap retires: no further pairs, state dropped") {
    implicit val sqlCtx = spark.sqlContext
    val cap = 3
    val in = MemoryStream[Doc]
    val q = sparseCandidateStream(in.toDS(), dfCap = cap).writeStream
      .format("memory").queryName("sparse_cand_sat")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // "hot" appears in 6 docs: postings hold docs 1..3 (3 = cap, pairs
      // flow), doc 4 crosses the cap -> retire; docs 5 and 6 must add
      // nothing even though the list was cleared (saturated is sticky)
      (1 to 6).foreach { i => in.addData(Doc(i, s"hot filler$i")); q.processAllAvailable() }
      val pairs = spark.table("sparse_cand_sat").as[SharedTermPair].collect()
        .filter(_.term == "hot").map(p => (p.doc_a, p.doc_b)).toSet
      assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
        s"expected only pre-saturation pairs, got $pairs")
      // re-delivery of an already-posted doc is a no-op, not a dup pair
      in.addData(Doc(2, "hot filler2")); q.processAllAvailable()
      val after = spark.table("sparse_cand_sat").as[SharedTermPair].collect()
        .filter(_.term == "hot").length
      assert(after == pairs.size, "saturated term must stay silent")
    } finally q.stop()
  }

  test("dupSpanStream: cross-doc sightings only, once per (span, doc) pair") {
    implicit val sqlCtx = spark.sqlContext
    val span = (1 to 32).map(i => s"w$i").mkString(" ")
    val in = MemoryStream[Doc]
    val q = dupSpanStream(in.toDS()).writeStream
      .format("memory").queryName("dup_spans_stream")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // owner arrives; a doc repeating the span INTERNALLY twice is still
      // one sighting source (within-doc repeats are q72's axis)
      in.addData(Doc(1, s"alpha $span beta")); q.processAllAvailable()
      in.addData(Doc(2, s"$span $span")); q.processAllAvailable()
      in.addData(Doc(3, s"x $span y"),
        Doc(4, (1 to 40).map(i => s"u$i").mkString(" "))) // unrelated
      q.processAllAvailable()
      // re-delivery of doc 2 must not re-emit
      in.addData(Doc(2, s"$span $span")); q.processAllAvailable()
      val wh = graft.operators.TextFns.md5hex(span)
      val out = spark.table("dup_spans_stream").as[DupSpan].collect()
        .filter(_.wh == wh).map(s => (s.first_doc, s.dup_doc)).toSet
      assert(out == Set((1L, 2L), (1L, 3L)), s"got $out")
      // batch agreement: q110 flags exactly the digests the stream sighted
      val streamedDup = spark.table("dup_spans_stream").as[DupSpan].collect()
        .map(_.wh).toSet
      val docs = Seq(
        Doc(1, s"alpha $span beta"), Doc(2, s"$span $span"),
        Doc(3, s"x $span y"), Doc(4, (1 to 40).map(i => s"u$i").mkString(" ")))
      val batchDup = docs.flatMap { d =>
        val tk = d.text.split(" ").filter(_.nonEmpty)
        (0 to tk.length - 32)
          .map(i => graft.operators.TextFns.md5hex(tk.slice(i, i + 32).mkString(" ")))
          .distinct.map(_ -> d.doc_id)
      }.groupBy(_._1).collect { case (h, xs) if xs.map(_._2).distinct.size >= 2 => h }
        .toSet
      assert(streamedDup == batchDup)
    } finally q.stop()
  }

  test("documents-table slice: stream matches batch contract end to end") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[Doc].collect().take(60).toSeq
    val in = MemoryStream[Doc]
    val q = sparseCandidateStream(in.toDS(), dfCap = 64).writeStream
      .format("memory").queryName("sparse_cand_real")
      .outputMode(OutputMode.Append())
      .start()
    try {
      docs.grouped(25).foreach { c => in.addData(c); q.processAllAvailable() }
      val streamed = spark.table("sparse_cand_real").as[SharedTermPair].collect()
        .map(p => (p.doc_a, p.doc_b, p.term, p.tf_a, p.tf_b)).toSet
      val batch = batchCandidates(docs, 64)
      // real text saturates some stopword-class terms: every streamed pair
      // for an UNSATURATED term must match batch exactly, and batch must
      // not contain anything the stream missed for those terms
      val df = docs.flatMap(d => d.text.split(" ").filter(_.nonEmpty).distinct
        .map(t => t -> d.doc_id)).groupBy(_._1).map { case (t, xs) => t -> xs.size }
      val unsaturated = (t: String) => df(t) <= 64
      assert(streamed.filter(p => unsaturated(p._3)) ==
        batch.filter(p => unsaturated(p._3)))
    } finally q.stop()
  }
}
