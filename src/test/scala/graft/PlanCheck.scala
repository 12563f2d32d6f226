package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Shared plan-inspection helpers for the layout/bucketing specs — one
  * AQE-aware walker and one catalog-read matcher, so a Spark upgrade
  * that changes `AdaptiveSparkPlanExec`/`QueryStageExec` shapes or the
  * catalog relation classes is fixed in ONE place instead of silently
  * weakening whichever copied spec was missed. */
object PlanCheck {

  /** Every physical node of an EXECUTED plan, descending through AQE
    * wrappers and materialized query stages. */
  def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
    case q: QueryStageExec => p +: walk(q.plan)
    case other => other +: other.children.flatMap(walk)
  }

  /** Shuffle-exchange count of `df`'s executed plan (run an action first
    * so AQE has materialized its stages). */
  def shuffles(df: DataFrame): Int =
    walk(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeLike])

  /** Whether `df`'s analyzed plan reads catalog table `table` (either
    * relation shape Spark may resolve a saved table to). */
  def isCatalogRead(df: DataFrame, table: String): Boolean =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.catalyst.catalog.HiveTableRelation
        if r.tableMeta.identifier.table == table => r
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
        if l.catalogTable.exists(_.identifier.table == table) => l
    }.nonEmpty
}
