package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Output-layout story for pipeline results: writing partitioned by a
  * low-cardinality column makes downstream readers prune whole directories
  * — at 100 TB the difference between scanning a corpus and scanning one
  * source's slice. The driver testdata is unpartitioned, so this writes a
  * partitioned copy and asserts the pruning actually happens in the plan. */
class PartitionPruningSpec extends SparkSpec {

  test("partitioned write -> read-back with filter prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    try { runPruningCheck(dir) } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  private def runPruningCheck(dir: String): Unit = {
    Tables.load(spark, sfDir, "documents")
      .write.partitionBy("source").parquet(s"$dir/docs_by_source")

    val filtered = spark.read.parquet(s"$dir/docs_by_source")
      .filter(col("source") === "src1")
    val plan = filtered.queryExecution.executedPlan.toString

    // the source predicate must be a PartitionFilter (directory pruning),
    // not a PushedFilter (row-group filtering after listing everything)
    assert(plan.contains("PartitionFilters: [isnotnull(source"), plan.take(900))
    // and only src1's files are read
    val scanned = filtered.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty)
    assert(scanned.forall(_.contains("source=src1")), scanned.take(3).mkString(","))
    // correctness of the round-trip
    val expected = Tables.load(spark, sfDir, "documents")
      .filter(col("source") === "src1").count()
    assert(filtered.count() == expected)
  }
}
