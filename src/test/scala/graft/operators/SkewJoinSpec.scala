package graft.operators



import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proof that the catalog's stated skew absorber — AQE splitting hot
  * partitions at runtime — actually engages, not just that the config is
  * on. A web-scale join always has a boilerplate key (the empty referrer,
  * the default template); this is the 100 TB failure mode q04/q05-class
  * fact-fact joins rely on AQE to absorb. */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    // shrink the thresholds so test-sized data exhibits cluster-scale skew
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      import spark.implicits._
      // 50k rows on ONE hot key + uniform tail, joined against a small-but-
      // not-broadcastable dim carrying the same key distribution shape
      val fact = spark.range(0, 50000).select(lit(0L).as("k"), col("id").as("payload"))
        .union(spark.range(0, 5000).select((col("id") % 100 + 1).as("k"), col("id").as("payload")))
      val dim = (0L to 100L).map(k => (k, s"dim$k")).toDF("k", "name")
        .repartition(8)
      val joined = fact.join(dim, "k")
      // collect() (not count()) so THIS query execution runs and AQE
      // finalizes the inspected plan
      assert(joined.collect().length == 55000)
      // query-stage wrappers hide their subtrees from collect, so assert on
      // the final adaptive plan's rendering
      val s = joined.queryExecution.executedPlan.toString
      assert(s.startsWith("AdaptiveSparkPlan isFinalPlan=true"), s.take(200))
      assert(s.contains("SortMergeJoin(skew=true)"),
        s"AQE did not mark the hot-key join as skew-handled:\n${s.take(1200)}")
      assert(s.contains("AQEShuffleRead skewed"),
        s"expected the skewed shuffle read split:\n${s.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
