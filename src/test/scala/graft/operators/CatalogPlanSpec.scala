package graft.operators

import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.window.WindowExec

import graft.SparkSpec

/** Catch-all physical-plan audit over the ENTIRE query catalog — the
  * regression classes the round-1 review flagged (single-task global
  * windows; accidental cartesians) can never come back silently, because
  * every current and future `SparkEntry.queries` entry is checked here.
  * AQE is disabled for the traversal so the plan tree is walkable
  * (AdaptiveSparkPlanExec hides its subtree from collect). */
class CatalogPlanSpec extends SparkSpec {

  // The only sanctioned nested-loop joins by NAME: the brute-force ANN
  // baselines broadcast a tiny query set over the corpus by design. A BNL
  // whose broadcast side is a no-grouping-key aggregate (a computed 1-row
  // scalar, e.g. q20's avg price or q34's corpus doc count) is sanctioned
  // structurally — that shape is really a filter against a constant.
  private val bnlAllowed = Set("q50_knn_brute", "q54_knn_quantized")

  // Sanctioned build sides: a no-grouping-key aggregate (1-row scalar) or a
  // LocalTableScan (driver-local literal model state, e.g. q52's learned
  // centroid table) — both are O(model) small by construction, never data.
  // ReusedExchange is a leaf that hides its subtree from collect; unwrap it.
  private def hasTinyLeaf(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
    p.collectFirst {
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty => a
      case l: org.apache.spark.sql.execution.LocalTableScanExec => l
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec
          if hasTinyLeaf(r.child) => r
    }.isDefined

  private def isScalarBuild(j: BroadcastNestedLoopJoinExec): Boolean =
    hasTinyLeaf(if (j.buildSide == BuildLeft) j.left else j.right)

  private def withPlans(f: (String, org.apache.spark.sql.execution.SparkPlan) => Unit): Unit = {
    val conf = spark.conf
    val old = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        f(name, fn(spark, sfDir).queryExecution.executedPlan)
      }
    } finally conf.set("spark.sql.adaptive.enabled", old)
  }

  test("no query plans a cartesian product; BNL only in the brute-force baselines") {
    withPlans { (name, plan) =>
      assert(!plan.toString.contains("CartesianProduct"),
        s"$name plans a cartesian product")
      if (!bnlAllowed(name)) {
        val bad = plan.collect {
          case j: BroadcastNestedLoopJoinExec if !isScalarBuild(j) => j
        }
        assert(bad.isEmpty, s"$name plans a non-scalar nested-loop join")
      }
    }
  }

  test("no query uses a partition-less window (the single-task sort killer)") {
    withPlans { (name, plan) =>
      val global = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(global.isEmpty,
        s"$name sorts all rows in one task via a no-partition window")
    }
  }
}
