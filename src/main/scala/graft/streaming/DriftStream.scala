package graft.streaming

import graft.Pinned._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Live distribution-drift monitor — the streaming twin of q206: document
  * observations (source, lang) arrive in micro-batches, fold into a
  * persistent (source, lang) count table, and [[tvd]] answers the
  * IDENTICAL exact total-variation-distance computation
  * ([[graft.operators.TextAnalysis]] q206) over everything absorbed so
  * far. The production shape: a mixture pipeline watches its incoming
  * source mix drift against itself pair-by-pair and reweighs when a
  * threshold trips.
  *
  * Incremental-maintenance discipline (the [[GraphRankStream]] rules):
  *  - the count table is the ONLY accumulating state — (sources × langs)
  *    rows, folded by one groupBy-sum per batch and eagerly
  *    localCheckpoint-ed, so lineage stays O(1) in batch count and state
  *    stays histogram-sized FOREVER (counts are commutative, so
  *    micro-batch boundaries cannot change any TVD);
  *  - [[tvd]] is pull-based: TVD is a whole-histogram computation with no
  *    pair-sized foldable delta (one new doc moves every pair involving
  *    its source), so the honest incremental unit is the count table and
  *    the (dimension-sized) comparison re-runs over it on demand;
  *  - superseded count-table checkpoints retire through the bounded
  *    [[RetiredFrames]] window, never unpersisted under a live reader. */
class DriftStream(spark: SparkSession) {
  import spark.implicits._

  @volatile private var counts: DataFrame =
    Seq.empty[(String, String, Long)].toDF("source", "lang", "c")
      .pin(true)

  private val retired = new RetiredFrames()

  /** Fold one micro-batch of (source, lang) document observations. */
  def absorb(batchDocs: DataFrame): Unit = synchronized {
    if (!batchDocs.isEmpty) {
      val prev = counts
      counts = prev
        .unionByName(batchDocs.select(col("source"), col("lang"))
          .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c")))
        .groupBy(col("source"), col("lang")).agg(sum(col("c")).as("c"))
        .pin(true)
      retired.retire(prev)
    }
  }

  /** Pairwise exact TVD over every document absorbed so far —
    * bit-identical to batch q206 run over the same documents: the plan IS
    * [[graft.operators.TextAnalysis.tvdOn]], applied to the maintained
    * count table instead of a fresh corpus scan. */
  def tvd: DataFrame = graft.operators.TextAnalysis.tvdOn(counts)

  /** Attach to a streaming (source, lang) frame. */
  def attach(docs: DataFrame): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => absorb(batch) }
      .start()

  /** Releases every retained checkpoint; previously returned frames are
    * invalid afterwards. */
  def close(): Unit = synchronized {
    retired.closeAll(counts)
  }
}
