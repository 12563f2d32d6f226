package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketing = the co-located-join story at scale: pre-hash-partitioning
  * both fact tables on the join key at write time removes the per-query
  * shuffle entirely. This spec proves the plan property Spark gives us:
  * a join of two tables bucketed on the join key has NO Exchange. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables runs without a shuffle") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
        .write.format("parquet")
        .option("path", s"$warehouse/li_b")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_b")
      Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.format("parquet")
        .option("path", s"$warehouse/ord_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_b")

      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(1200)}")
      // and it still computes the right thing
      val n = joined.count()
      val expected = Tables.load(spark, sfDir, "lineitem")
        .join(Tables.load(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
