package graft.streaming

import org.apache.spark.sql.DataFrame

/** The shared release discipline for streams that maintain an eagerly
  * checkpointed cumulative frame (AnnServeStream / GraphRankStream /
  * NearDupLineageStream): a superseded checkpoint must not be unpersisted
  * under a reader that obtained it before the current batch, but keeping
  * every generation until close() makes total block storage quadratic in
  * batch count. The contract is therefore a bounded window: the last
  * `keep` superseded generations stay valid (a snapshot frame survives at
  * least `keep` subsequent batches), older ones are released as new
  * batches retire their predecessors. Readers that need a frame for
  * longer than `keep` batches must re-fetch. */
private[streaming] final class RetiredFrames(keep: Int = 2) {
  private val buf = scala.collection.mutable.Queue.empty[DataFrame]

  /** Retire a superseded checkpoint; releases generations older than
    * `keep`. */
  def retire(df: DataFrame): Unit = synchronized {
    buf.enqueue(df)
    while (buf.size > keep) {
      graft.FrameBlocks.release(buf.dequeue())
    }
  }

  /** Releases every retained generation plus the given current frames;
    * every previously returned frame is invalid afterwards. */
  def closeAll(current: DataFrame*): Unit = synchronized {
    (buf.toSeq ++ current).foreach(graft.FrameBlocks.release)
    buf.clear()
  }
}
