package graft.streaming

import graft.Pinned._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Graph

/** Live provenance-graph ranking — the streaming twin of q201: edge
  * observations (customer, supplier key pairs) arrive in micro-batches,
  * fold into a persistent DISTINCT pair table, and [[ranks]] answers the
  * identical integer PageRank fixpoint ([[Graph.pagerankOn]]) over the
  * graph absorbed so far.
  *
  * Incremental-maintenance discipline (the [[NearDupLineageStream]]
  * rules):
  *  - the pair table is the ONLY accumulating state, deduplicated on fold
  *    (re-observed edges are no-ops, so replay/overlap cannot perturb the
  *    graph) and eagerly localCheckpoint-ed each batch — lineage stays
  *    O(1) in batch count;
  *  - rank computation is pull-based ([[ranks]] builds the plan on
  *    demand), because PageRank is a whole-graph fixpoint: unlike the CC
  *    labels there is no pair-sized delta that folds an old rank table
  *    forward — a new edge re-weights every walk through both endpoints —
  *    so the honest incremental unit is the edge set, and the fixpoint
  *    re-runs over it (3 edge-sized joins; at cluster scale, the nightly
  *    rank refresh over a continuously-maintained edge table);
  *  - superseded pair-table checkpoints are RETIRED through the bounded
  *    [[RetiredFrames]] window, never unpersisted under a possibly live
  *    reader (the AnnServeStream rule), with O(1) retained generations.
  */
class GraphRankStream(spark: SparkSession) {
  import spark.implicits._

  @volatile private var pairTable: DataFrame =
    Seq.empty[(Long, Long)].toDF("c", "sp").pin(true)

  private val retired = new RetiredFrames()

  /** Fold one micro-batch of raw (o_custkey, l_suppkey) observations. */
  def absorb(batchPairs: DataFrame): Unit = synchronized {
    if (!batchPairs.isEmpty) {
      val prev = pairTable
      pairTable = prev
        .unionByName(batchPairs.select(
          (col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp")))
        .distinct()
        .pin(true)
      retired.retire(prev)
    }
  }

  /** Top-[[Graph.PrTopN]] integer PageRank over every edge absorbed so far
    * — bit-identical to batch q201 run over the same pair set. */
  def ranks: DataFrame = {
    val p = pairTable
    Graph.pagerankOn(
      p.select(col("c").as("src"), col("sp").as("dst"))
        .unionByName(p.select(col("sp").as("src"), col("c").as("dst"))))
  }

  /** Top hubs & authorities over every edge absorbed so far —
    * bit-identical to batch q208 run over the same pair set (HITS wants
    * the DIRECTED customer→supplier orientation, which is exactly the
    * pair table itself). */
  def hits: DataFrame = {
    val p = pairTable
    Graph.hitsOn(p.select(col("c").as("src"), col("sp").as("dst")))
  }

  /** Attach to a streaming (o_custkey, l_suppkey) frame. */
  def attach(pairs: DataFrame): StreamingQuery =
    pairs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => absorb(batch) }
      .start()

  /** Releases every retained checkpoint; previously returned [[ranks]]
    * frames are invalid afterwards. */
  def close(): Unit = synchronized {
    retired.closeAll(pairTable)
  }
}
