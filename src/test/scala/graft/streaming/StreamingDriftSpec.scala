package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch==stream for the q206 drift monitor: the real sf0.001 documents
  * replayed across micro-batches through [[DriftStream]] must, after the
  * last batch, produce the IDENTICAL pairwise TVD table to batch
  * q206_tvd_drift — and every intermediate answer must be internally
  * consistent (num ≤ den, complete pair set over sources seen so far).
  * Counts are commutative, so batch boundaries cannot perturb any TVD —
  * the spec replays in shuffled order to prove it. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("streamed TVD equals batch q206 after shuffled replay; consistent mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("lang")).as[(String, String)].collect()
    val shuffled = new scala.util.Random(7).shuffle(docs.toSeq)

    val in = MemoryStream[(String, String)]
    val ds = new DriftStream(spark)
    val q = ds.attach(in.toDF().select(col("_1").as("source"), col("_2").as("lang")))
    try {
      shuffled.grouped((shuffled.length + 3) / 4).foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
        val mid = ds.tvd.collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        val seen = chunkSources(mid)
        assert(mid.length == seen * (seen - 1) / 2)
        mid.foreach { case (sa, sb, num, den) =>
          assert(sa < sb && num >= 0 && num <= den)
        }
      }
      val streamed = ds.tvd.collect().map(_.toString).sorted.toSeq
      val batch = graft.operators.TextAnalysis
        .queries("q206_tvd_drift")(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
    } finally { q.stop(); ds.close() }
  }

  private def chunkSources(rows: Array[(String, String, Long, Long)]): Int =
    (rows.map(_._1) ++ rows.map(_._2)).distinct.length
}
