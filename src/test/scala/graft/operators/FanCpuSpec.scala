package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins both directions of [[TextFns.fanCpu]] (the r17 gate on the CPU-fan
  * repartitions in q223/q73/q76): a scan whose planned split count is below
  * the core count gets the explicit hash fan (the small-file LOCAL artifact
  * the fan exists to fix), while a many-split scan passes through with NO
  * added Exchange — at 100 TB the corpus-wide shuffle that existed only for
  * local parallelism must vanish from the plan. Results are identical by
  * construction (a repartition never changes row content); the spec asserts
  * it anyway on a checksum aggregate. */
class FanCpuSpec extends SparkSpec {

  private def docs = Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))

  private def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = df.select(xxhash64(col("doc_id"), col("text")).as("h"))
      .agg(expr("bit_xor(h)").as("h"), count(lit(1)).as("c")).head()
    (r.getLong(0), r.getLong(1))
  }

  private def estSplits(df: org.apache.spark.sql.DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes /
      BigInt(org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes)

  test("sub-core-count scan gets the fan (local small-file artifact)") {
    val fanned = TextFns.fanCpu(docs, col("doc_id"))
    assert(estSplits(docs) < TextFns.cpuPartitions,
      "precondition: the sf0.001 scan must price below the core count")
    assert(fanned.queryExecution.executedPlan.toString.contains("Exchange"),
      "expected the explicit hash fan on a sub-core-count scan")
    assert(fanned.rdd.getNumPartitions == TextFns.cpuPartitions)
    assert(checksum(fanned) == checksum(docs))
  }

  test("many-split scan passes through with no added Exchange") {
    val conf = spark.conf
    val saved = Seq("spark.sql.files.maxPartitionBytes")
      .map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try {
      val many = docs
      assert(estSplits(many) >= TextFns.cpuPartitions,
        "precondition: the shrunken split size must out-split the cores")
      val gated = TextFns.fanCpu(many, col("doc_id"))
      assert(gated eq many, "gate must return the input frame untouched")
      assert(!gated.queryExecution.executedPlan.toString.contains("Exchange"),
        "a many-split input must not pay an added Exchange")
      assert(checksum(gated) == checksum(docs))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
