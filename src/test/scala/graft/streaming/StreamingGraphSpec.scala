package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Graph

/** Batch==stream for the live provenance-graph ranking: the sf0.001
  * customer–supplier observations replayed in shuffled, OVERLAPPING
  * micro-batches (every batch repeats a slice of the previous one — replay
  * and at-least-once delivery must be no-ops) must yield, after every
  * batch, exactly the batch q201 fixpoint over the distinct pairs observed
  * so far; after the final batch, exactly the committed q201 result. */
class StreamingGraphSpec extends SparkSpec {

  test("streamed edge folds reproduce batch PageRank after every micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val raw = graft.Tables.load(s, sfDir, "orders")
      .join(graft.Tables.load(s, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
      .as[(Long, Long)].collect().toSeq
    // deterministic shuffle, then 3 chunks with overlap: each batch
    // re-delivers the tail quarter of its predecessor
    val shuffled = raw.sortBy(p => graft.operators.TextFns.md5hex(p.toString))
    val n = shuffled.length
    val bounds = Seq((0, n / 3), (n / 4, 2 * n / 3), (n / 2, n))
    val mem = MemoryStream[(Long, Long)]
    val grs = new GraphRankStream(s)
    val q = grs.attach(mem.toDF().toDF("o_custkey", "l_suppkey"))
    try {
      var seen = Set.empty[(Long, Long)]
      bounds.foreach { case (lo, hi) =>
        val chunk = shuffled.slice(lo, hi)
        seen ++= chunk
        mem.addData(chunk)
        q.processAllAvailable()
        val expected = Graph.pagerankOn {
          val p = seen.toSeq.toDF("ck", "sk")
            .select((col("ck") * 2).as("c"), (col("sk") * 2 + 1).as("sp"))
            .distinct()
          p.select(col("c").as("src"), col("sp").as("dst"))
            .unionByName(p.select(col("sp").as("src"), col("c").as("dst")))
        }.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        val got = grs.ranks.collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        assert(got == expected)
      }
      // after full replay: bit-identical to the committed batch q201/q208
      val batch = Graph.queries("q201_bipartite_pagerank")(s, sfDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      val fin = grs.ranks.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(fin == batch)
      val batchHits = Graph.queries("q208_hits")(s, sfDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      val finHits = grs.hits.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(finHits == batchHits)
    } finally { q.stop(); grs.close() }
  }
}
