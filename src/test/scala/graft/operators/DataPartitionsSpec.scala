package graft.operators

import graft.SparkSpec

/** Pins the data-proportional partition helper the graph edge memos use
  * (the sf10→sf100 decade's q201 catch: a cpuPartitions-pinned edge
  * layout means the shuffle-hash build side grows linearly with the
  * corpus on a fixed heap). The helper must floor at defaultParallelism
  * for small inputs (the AQE-must-not-coalesce-to-one-task rationale),
  * scale with plan-statistics bytes WITHOUT running a job, and stay
  * deterministic. */
class DataPartitionsSpec extends SparkSpec {

  test("small inputs floor at defaultParallelism") {
    val small = spark.range(0, 1000).toDF() // stats: 8 KB
    assert(TextFns.dataPartitions(small) ==
      spark.sparkContext.defaultParallelism)
  }

  test("large inputs get one partition per 32 MB of source bytes, no job runs") {
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    // range stats are exact (8 B/row): 2^30 rows = 8 GiB -> 256 partitions
    val big = spark.range(0, 1L << 30).toDF()
    val n = TextFns.dataPartitions(big)
    assert(n == 256, s"expected 256 partitions for 8 GiB of stats, got $n")
    assert(sc.statusTracker.getJobIdsForGroup(null).length == before,
      "dataPartitions scheduled a job — it must price from plan statistics")
  }

  test("a statistics-less source falls back to cpuPartitions instead of " +
    "trusting the defaultSizeInBytes sentinel") {
    // LogicalRDD has no real statistics: its sizeInBytes is the
    // spark.sql.defaultSizeInBytes sentinel (Long.MaxValue by default),
    // which naively priced would pin 32768 partitions on 3 rows
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val rdd = spark.sparkContext.parallelize(
      Seq(1L, 2L, 3L).map(org.apache.spark.sql.Row(_)))
    val statless = spark.createDataFrame(rdd, schema)
    assert(statless.queryExecution.optimizedPlan.stats.sizeInBytes >=
      BigInt(org.apache.spark.sql.internal.SQLConf.get.defaultSizeInBytes),
      "fixture no longer statistics-less — pick a different plan shape")
    assert(TextFns.dataPartitions(statless) ==
      spark.sparkContext.defaultParallelism)
    // one unknown source poisons the sum, so the mix also falls back
    val big = spark.range(0, 1L << 30).toDF()
    assert(TextFns.dataPartitions(big, statless) ==
      spark.sparkContext.defaultParallelism)
  }

  test("multiple sources sum; the cap holds") {
    val a = spark.range(0, 1L << 30).toDF() // 8 GiB
    val b = spark.range(0, 1L << 30).toDF() // 8 GiB
    assert(TextFns.dataPartitions(a, b) == 512)
    val huge = spark.range(0, 1L << 42).toDF() // 32 TiB of stats -> capped
    assert(TextFns.dataPartitions(huge) == 32768)
  }
}
