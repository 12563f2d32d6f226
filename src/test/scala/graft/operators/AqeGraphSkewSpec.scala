package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The AQE tier under the graph catalog's MANUAL skew machinery: the
  * GraphSkewSpec planted-hub workload (one supplier on half of all edges)
  * run through un-hinted plans, proving (a) AQE's runtime skew split
  * actually fires on the hot contribution-join partition, and (b) the
  * un-hinted AQE-planned fixpoint produces bit-identical ranks to the
  * hint-pinned production plan — possible to assert exactly BECAUSE the
  * fixpoint is integer arithmetic (a float PageRank would differ in the
  * last ulps between plans and the comparison would prove nothing).
  *
  * Division of labor this pins (documented in SCALE.md): AQE absorbs
  * skew REACTIVELY (post-shuffle partition splits, only where runtime
  * sizes trip the threshold) and is the right default for one-shot
  * fact-fact joins; the manual tier (q158 deterministic salting, the
  * graph family's hint-pinned shuffle-hash builds) stays preferred where
  * the skew is STRUCTURAL and known — an iterative fixpoint re-shuffles
  * the same hub every round, and a deterministic layout keeps plans
  * replayable and checkpoint-reusable instead of re-detected per run. */
class AqeGraphSkewSpec extends SparkSpec {
  import spark.implicits._

  private val nCust = 20000

  /** GraphSkewSpec's planted hub, sized up so the hot key's partition
    * trips cluster-scale byte thresholds (shrunk below to test scale). */
  private def plantedEdges(): DataFrame = {
    val pairs = (0 until nCust).flatMap { i =>
      Seq((i.toLong, 0L), (i.toLong, 1L + (i % 40).toLong))
    }.distinct
    val p = pairs.toDF("ck", "sk")
      .select((col("ck") * 2).as("c"), (col("sk") * 2 + 1).as("sp"))
    p.select(col("c").as("src"), col("sp").as("dst"))
      .unionByName(p.select(col("sp").as("src"), col("c").as("dst")))
  }

  private def withSkewConf[A](work: => A): A = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try work
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE splits the hub's contribution-join partition at runtime") {
    withSkewConf {
      val e = plantedEdges().localCheckpoint(true)
      // One un-hinted contribution sweep with the per-round rank STATE
      // materialized as its own checkpoint — the hitsOn/CC round shape.
      // The checkpoint is load-bearing for AQE here, and that is itself a
      // finding this spec pins: OptimizeSkewedJoin only splits a join
      // whose children are BARE ENSURE_REQUIREMENTS shuffle stages, so an
      // iteration that feeds the join straight from an aggregate (the
      // un-checkpointed formulation) is structurally invisible to it —
      // with round-materialized state the children are plain scans and
      // the hub partition splits at runtime.
      val rank = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(col("src").as("node"), col("deg"), lit(Graph.Scale).as("r"))
        .localCheckpoint(true)
      val contrib = rank
        .join(e, col("node") === col("src"))
        .select(col("dst"), expr("r div deg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("cin"))
      assert(contrib.collect().nonEmpty)
      val s = contrib.queryExecution.executedPlan.toString
      assert(s.startsWith("AdaptiveSparkPlan isFinalPlan=true"), s.take(200))
      assert(s.contains("(skew=true)"),
        s"AQE did not mark the hub join as skew-handled:\n${s.take(1200)}")
      assert(s.contains("AQEShuffleRead skewed"),
        s"expected the skewed shuffle read split:\n${s.take(1200)}")
      graft.FrameBlocks.release(rank)
      graft.FrameBlocks.release(e)
    }
  }

  test("un-hinted AQE fixpoint equals the hint-pinned plan bit for bit") {
    withSkewConf {
      val e = plantedEdges().localCheckpoint(true)
      val hinted = Graph.pagerankOn(e).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      val aqe = Graph.pagerankOn(e, hinted = false).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(hinted == aqe)
      // and the hub still dominates (same invariant as GraphSkewSpec)
      assert(hinted.head._1 == 1L && hinted.head._2 == "supplier")
      graft.FrameBlocks.release(e)
    }
  }
}
