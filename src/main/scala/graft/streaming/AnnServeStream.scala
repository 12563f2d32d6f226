package graft.streaming

import graft.Pinned._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.operators.Similarity

/** Streaming ANN serving over a FROZEN IVF-PQ index — the production shape
  * batch q137 only simulates: the index (coarse centroids, residual
  * codebooks, corpus PQ-code frame) is built ONCE and never changes while
  * query vectors arrive live in micro-batches.
  *
  * Per batch, [[Similarity.serveIvfPq]] broadcasts the batch's query side
  * (probed lists + ADC distance tables — tiny: batch_size × nProbe rows)
  * against the static code frame, so each micro-batch costs one equi join
  * over the probed lists' 2-byte codes, independent of stream history. No
  * cross-batch state exists at all — queries are answered within their
  * batch — which is why this is `foreachBatch` rather than
  * `mapGroupsWithState`: the per-batch work is a full top-k DataFrame plan
  * (window rank over join results), not per-key state folding.
  *
  * At cluster scale the answered batches would feed a real sink (Kafka
  * topic, serving store); here each batch's results append to a memoized
  * results table the spec reads back ([[results]]), checkpointed per batch
  * so lineage stays O(1) in batch count (the [[NearDupLineageStream]]
  * block-hygiene discipline). */
class AnnServeStream(spark: SparkSession, dir: String) {
  import spark.implicits._

  @volatile private var answered: DataFrame =
    Seq.empty[(Long, Long, Long, Long, Double)]
      .toDF("query_id", "nn_rank", "vec_id", "list_id", "adc")
      .pin(true)

  // Superseded checkpointed frames are RETIRED, not unpersisted in place:
  // a caller that grabbed results() before this batch may still be running
  // an action on the old frame, and localCheckpoint truncated its lineage,
  // so an eager unpersist would leave that frame unrecoverable (missing
  // blocks). [[RetiredFrames]] bounds the window: a snapshot stays valid
  // for at least 2 subsequent batches, older generations are released as
  // the stream advances (total block storage stays O(1) in batch count,
  // not quadratic); everything else is released in [[close]].
  private val retired = new RetiredFrames()

  /** Answer one micro-batch of (query_id, qv) and fold the results in.
    * Synchronized: micro-batches arrive serially per query, but [[results]]
    * readers must never observe a mid-fold frame. */
  def absorb(batchQueries: DataFrame): Unit = synchronized {
    if (!batchQueries.isEmpty) {
      val out = Similarity.serveIvfPq(spark, dir, batchQueries)
      val prev = answered
      answered = prev.unionAll(out).pin(true)
      retired.retire(prev)
    }
  }

  /** All (query_id, nn_rank, vec_id, list_id, adc) answered so far.
    * A snapshot: it stays valid for at least the next 2 batches (the
    * [[RetiredFrames]] window), then may be released — re-fetch to observe
    * later batches or to hold results longer. */
  def results: DataFrame = answered

  /** Releases every checkpointed frame this serve loop created. Call after
    * the streaming query (and any reader of a [[results]] snapshot) has
    * stopped; every previously returned frame is invalid afterwards. */
  def close(): Unit = synchronized {
    retired.closeAll(answered)
  }

  /** Wires a streaming (query_id, qv) frame into the serve loop. */
  def writer(queries: DataFrame): DataStreamWriter[Row] =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => absorb(batch) }

  def start(queries: DataFrame): StreamingQuery = writer(queries).start()
}
