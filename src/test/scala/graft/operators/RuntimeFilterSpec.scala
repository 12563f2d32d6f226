package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proof that Catalyst's runtime bloom-filter injection engages on the
  * catalog's join shape: a selective dimension filter is turned into a
  * bloom filter applied to the fact side BEFORE its shuffle, so at 100 TB
  * the fact scan's non-matching rows die at the map side instead of
  * crossing the wire. Complements SkewJoinSpec (skew absorber) and
  * BucketingSpec (shuffle elimination) as the third join-family absorber.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter on the fact side") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // test-sized data is far below the production 10 GB probe-side bar
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    try {
      val li = graft.Tables.load(spark, sfDir, "lineitem")
      val ord = graft.Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      assert(joined.collect().nonEmpty)
      // the injection is an optimizer rewrite: the fact side gains a
      // might_contain(bloom_filter_agg(dim keys)) filter under the join
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n${plan.take(1500)}")
      // the probe hashes the FACT side's join key (not the dim's): the
      // injected predicate is might_contain(<bloom>, xxhash64(l_orderkey...))
      assert("might_contain\\([^)]*\\]\\s*,\\s*xxhash64\\(l_orderkey".r
        .findFirstIn(plan).isDefined,
        s"bloom probe not keyed on the fact join key:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
