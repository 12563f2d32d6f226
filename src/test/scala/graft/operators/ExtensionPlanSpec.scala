package graft.operators

import graft.SparkSpec

/** Plan-shape assertions for the LLM-pipeline operators: the properties
  * that make them viable at 100 TB, checked on the actual physical plans.
  */
class ExtensionPlanSpec extends SparkSpec {

  private def plan(m: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame],
                   name: String): String =
    m(name)(spark, sfDir).queryExecution.executedPlan.toString

  // q42 is memoized+checkpointed in the query map (shared near-dup
  // lineage), so its QUERY plan is a checkpoint scan; the LSH plan shape
  // is asserted on the un-memoized pipeline it wraps.
  private def trigramPipeline =
    Dedup.lshNearDupPairs(graft.Tables.load(spark, sfDir, "documents"),
      n = 3, numHashes = Dedup.NumHashes, bandSize = Dedup.BandSize,
      seedBase = 0, tNum = Dedup.TrigramTNum, tDen = Dedup.TrigramTDen)

  test("near-dup pipelines never plan a cartesian or nested-loop join") {
    val plans = Seq(
      "q42 (un-memoized trigram pipeline)" ->
        trigramPipeline.queryExecution.executedPlan.toString,
      "q44_dedup_ngram_jaccard" -> plan(Dedup.queries, "q44_dedup_ngram_jaccard"),
      "q45_dedup_embcos" -> plan(Dedup.queries, "q45_dedup_embcos"))
    plans.foreach { case (q, p) =>
      assert(!p.contains("CartesianProduct"), s"$q:\n${p.take(600)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n${p.take(600)}")
    }
  }

  test("LSH banded self-join reuses one exchange when too big to broadcast") {
    // At 100 TB the banded side exceeds any broadcast threshold and the
    // candidate join becomes a shuffle join on (b, k); both sides are the
    // same subplan, so the CPU-heavy signature pass must be computed ONCE
    // (ReusedExchange), not twice. Simulate scale by disabling broadcast.
    val conf = spark.conf
    val old = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // AQE applies exchange reuse at stage materialization, so execute
      // first and inspect the final adaptive plan.
      val df = trigramPipeline
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.startsWith("AdaptiveSparkPlan isFinalPlan=true"), p.take(200))
      assert(p.contains("ReusedExchange"), p.take(1500))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("LSH knn candidates come from an equi-join on the bucket key") {
    val p = plan(Similarity.queries, "q51_knn_lsh")
    // candidate generation must be a hash-key join, not an all-pairs compare
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("brute-force knn broadcasts the query side (corpus never shuffles)") {
    val p = plan(Similarity.queries, "q50_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("native vector expressions are in the scoring plans") {
    Seq(plan(Similarity.queries, "q50_knn_brute"),
      plan(Dedup.queries, "q45_dedup_embcos")).foreach { p =>
      assert(p.contains("graft_dot") && p.contains("graft_l2norm"), p.take(800))
    }
  }

  test("exact dedup is one hash aggregation, no join") {
    val p = plan(Dedup.queries, "q40_dedup_exact")
    assert(p.contains("HashAggregate"), p.take(600))
    assert(!p.contains("Join"), p.take(600))
  }
}
