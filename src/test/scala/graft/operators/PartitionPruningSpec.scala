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

  test("dynamic partition pruning: a selective dim join prunes partitions at RUNTIME") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    try {
      Tables.load(spark, sfDir, "events")
        .write.partitionBy("event_type").parquet(s"$dir/ev_by_type")
      val fact = spark.read.parquet(s"$dir/ev_by_type")
      // dim carries the partition key; the filter is on a NON-key column,
      // so static pruning can't see it — only DPP's runtime subquery can
      import spark.implicits._
      // two traps this spec pins: (1) the dim must be a FILE relation —
      // over a LocalRelation Catalyst folds the filter into the literal
      // rows (ConvertToLocalRelation) and DPP never sees a predicate;
      // (2) the dim predicate must survive BooleanSimplification as a
      // shape isLikelySelective recognizes — `flag = true` simplifies to
      // a bare attribute, which does NOT qualify, so the filter column is
      // a string tier compared by equality
      Seq(("click", "hot"), ("view", "cold"), ("purchase", "cold"),
        ("signup", "cold"), ("error", "cold")).toDF("event_type", "tier")
        .write.parquet(s"$dir/dim")
      val dim = spark.read.parquet(s"$dir/dim")
      // NOTE: the fact side must stay a bare scan below the join —
      // injecting input_file_name() here would add a non-deterministic
      // Project that findExpressionAndTrackLineageDown refuses to walk,
      // silently disabling DPP; runtime pruning is verified through the
      // scan node's numOutputRows metric instead
      val joined = fact.join(dim, Seq("event_type")).filter(col("tier") === "hot")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"), plan.take(1200))
      val expected = Tables.load(spark, sfDir, "events")
        .filter(col("event_type") === "click").count()
      // drive THIS queryExecution (count() would spawn a separate one and
      // leave these metrics untouched)
      assert(joined.collect().length.toLong == expected)
      // runtime effect: the fact scan emitted ONLY the pruned partition's
      // rows — without DPP it would emit every partition's
      def walk(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          p +: walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: walk(q.plan)
        case other => other +: other.children.flatMap(walk)
      }
      val factScan = walk(joined.queryExecution.executedPlan)
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.toString.contains("ev_by_type") => f }
      assert(factScan.nonEmpty, "no fact scan found")
      assert(factScan.map(_.metrics("numOutputRows").value).sum == expected,
        "fact scan read rows beyond the DPP-selected partition")
    } finally {
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
