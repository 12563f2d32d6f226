package graft.streaming

import graft.Pinned._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Live near-dup lineage — the streaming driver of [[Dedup.updateLabels]]
  * and the "materialize once, refresh incrementally" story of SCALE.md made
  * continuous: a document stream lands in micro-batches, each batch's LSH
  * pairs fold into a persistent cluster-label table, and no old document is
  * ever re-shingled or re-signed.
  *
  * Per micro-batch:
  *   1. sign + band ONLY the increment ([[Dedup.bandedSignatures]]);
  *   2. new edges = increment × (index ∪ increment) band collisions,
  *      size-prefiltered + Jaccard-verified ([[Dedup.incrementPairs]]) —
  *      every pair surfaces exactly when its later endpoint arrives;
  *   3. labels ← [[Dedup.updateLabels]](labels, new edges) — CC over label
  *      edges + increment pairs, pair-sized;
  *   4. the increment's banded rows append to the signature index.
  *
  * Convergence: pair membership is pairwise, so the union of per-batch edge
  * sets equals the from-scratch corpus pair list, and updateLabels's
  * spanning-forest identity makes the folded labels equal the batch CC
  * labels after every batch — not just at the end (StreamingLineageSpec
  * pins both, on a replayed corpus split).
  *
  * State discipline: the index and the label table are the ONLY
  * accumulating state; both are eagerly localCheckpoint-ed each batch so
  * lineage stays O(1) in batch count (a thousand-batch stream would
  * otherwise carry a thousand-union plan). Superseded label checkpoints
  * retire through the bounded [[RetiredFrames]] window; internal frames
  * are unpersisted immediately — same block-hygiene rule as the CC
  * rounds. At cluster scale the two tables would live as real
  * checkpointed/Delta tables; the shapes are unchanged.
  *
  * Driver-side coordination only touches handles, never data: foreachBatch
  * is the documented Structured Streaming idiom for maintaining a
  * materialized view that needs full-DataFrame operators (CC is a
  * multi-join fixpoint — far outside flatMapGroupsWithState's per-key
  * state model). */
class NearDupLineageStream(spark: SparkSession) {
  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")

  @volatile private var index: DataFrame =
    Dedup.bandedSignatures(emptyDocs).pin(true)
  @volatile private var labelTable: DataFrame =
    Seq.empty[(Long, Long)].toDF("doc_id", "component").pin(true)

  // Superseded label tables are RETIRED through the bounded
  // [[RetiredFrames]] window, not unpersisted in place: a [[labels]]
  // reader from the previous batch may still be running an action on the
  // old (lineage-truncated) frame. The index and per-batch increment stay
  // eagerly unpersisted: they never escape this class, so no reader can
  // hold them.
  private val retired = new RetiredFrames()

  /** Fold one micro-batch of (doc_id, text) into the lineage. Synchronized:
    * micro-batches arrive serially per query, but the label table must
    * never be read mid-fold by [[labels]] consumers racing a batch. */
  def absorb(batchDocs: DataFrame): Unit = synchronized {
    if (!batchDocs.isEmpty) {
      val inc = Dedup.bandedSignatures(
        batchDocs.select("doc_id", "text")).pin(true)
      val newPairs = Dedup.incrementPairs(index, inc)
      val prevLabels = labelTable
      // updateLabels returns a frame backed by CC's own eager checkpoint
      labelTable = Dedup.updateLabels(prevLabels, newPairs)
      val prevIndex = index
      index = prevIndex.unionByName(inc).pin(true)
      graft.FrameBlocks.release(prevIndex)
      graft.FrameBlocks.release(inc)
      retired.retire(prevLabels)
    }
  }

  /** Releases the retained label-table checkpoints, the current one, and
    * the signature index. Call after the stream and any [[labels]] reader
    * have stopped; previously returned frames are invalid afterwards. */
  def close(): Unit = synchronized {
    retired.closeAll(labelTable, index)
  }

  /** The current cluster-label table (doc_id, component) — equal to batch
    * CC over every document absorbed so far; docs in no near-dup pair are
    * absent (singletons), exactly as in the batch framing. */
  def labels: DataFrame = labelTable

  /** Attach to a streaming (doc_id, text) frame: every micro-batch is
    * folded via [[absorb]]. */
  def attach(docs: DataFrame): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => absorb(batch) }
      .start()
}
