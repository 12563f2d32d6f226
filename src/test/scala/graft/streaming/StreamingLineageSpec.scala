package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup => D}

/** The live lineage-refresh story: a replayed corpus split streams through
  * [[NearDupLineageStream]], and the folded label table must equal batch
  * connected components over the full corpus — the incremental==from-scratch
  * identity (DedupSpec's updateLabels test) driven from an actual
  * Structured Streaming query instead of a hand-fed increment. */
class StreamingLineageSpec extends SparkSpec {

  private def batchLabels(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    D.connectedComponents(
        D.lshNearDupPairs(df, n = 3, numHashes = D.NumHashes,
          bandSize = D.BandSize, seedBase = 0,
          tNum = D.TrigramTNum, tDen = D.TrigramTDen)
          .select(col("i"), col("j")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed lineage equals batch CC after every micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val all = graft.Tables.load(s, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val docs = all.as[(Long, String)].collect().sortBy(_._1)
    assert(batchLabels(all).nonEmpty, "testdata must contain near-dup pairs")

    val mem = MemoryStream[(Long, String)]
    val lineage = new NearDupLineageStream(s)
    val q = lineage.attach(mem.toDF().toDF("doc_id", "text"))
    try {
      // three batches; after EACH, the folded labels must equal batch CC
      // over the prefix absorbed so far (the mid-stream check is what
      // separates true incremental folding from an at-the-end rebuild)
      val chunks = docs.grouped((docs.length + 2) / 3).toSeq
      var seen = Vector.empty[(Long, String)]
      chunks.foreach { c =>
        mem.addData(c.toSeq)
        q.processAllAvailable()
        seen = seen ++ c
        val expected = batchLabels(seen.toDF("doc_id", "text"))
        val got = lineage.labels.collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == expected,
          s"after ${seen.size} docs: ${got.diff(expected)} / ${expected.diff(got)}")
      }
    } finally { q.stop(); lineage.close() }
  }

  test("arrival order does not matter: shuffled replay converges to the same labels") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val all = graft.Tables.load(s, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val expected = batchLabels(all)
    // deterministic shuffle (md5 of doc_id) — later-endpoint pair surfacing
    // must be order-independent because least/greatest canonicalizes edges
    val docs = all.as[(Long, String)].collect()
      .sortBy(d => graft.operators.TextFns.md5hex(d._1.toString))

    val mem = MemoryStream[(Long, String)]
    val lineage = new NearDupLineageStream(s)
    val q = lineage.attach(mem.toDF().toDF("doc_id", "text"))
    try {
      docs.grouped((docs.length + 3) / 4).foreach { c =>
        mem.addData(c.toSeq); q.processAllAvailable()
      }
      val got = lineage.labels.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally { q.stop(); lineage.close() }
  }
}
