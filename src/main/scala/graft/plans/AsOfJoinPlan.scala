package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native backward as-of join — the whole-operator Catalyst extension tier
  * (logical node + planner strategy + physical operator), for the one
  * time-series operator Spark's built-in joins cannot express without a
  * detour: "each left row picks up the LATEST right row of the same key
  * with right.time <= left.time".
  *
  * The composed alternative (q48: union both sides + one last-ignore-nulls
  * window) is scale-correct but pays a union materialization and a window
  * buffer; this operator is the shape a native engine (kdb aj, DuckDB
  * ASOF, QuestDB) uses: shuffle both sides by key, sort each partition by
  * (key, time), then ONE forward-only merge pass per partition — O(n+m),
  * zero buffered state beyond the single candidate row.
  *
  * Scale contract: requiredChildDistribution makes Catalyst co-partition
  * both sides on the key (the same EnsureRequirements path SortMergeJoin
  * rides, including AQE); requiredChildOrdering makes it sort-once. The
  * merge never holds more than one right row, so a key of any skew streams.
  *
  * Semantics (DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`):
  * left-outer; ties at equal time match; null key or null time on either
  * side never matches; among right rows with identical (key, time) the
  * last in sort order wins — callers that need full determinism dedup the
  * right side per (key, time) first (q48/q183 do, via max(value)).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {

  /** User-facing constructor: backward as-of join `left` to `right` on
    * equal key columns and `right.time <= left.time`. Output = all left
    * columns, then all right columns (nullable). */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    graft.functions.GraftFunctions.register(left.sparkSession)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"asofJoin: no column '$n' in ${p.output.map(_.name)}"))
    org.apache.spark.sql.graft.Bridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTime), attr(rp, rightTime)))
  }
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. Registered both through
  * `SparkSessionExtensions.injectPlannerStrategy` ([[graft.functions
  * .GraftExtensions]]) and imperatively via `experimental.extraStrategies`
  * ([[graft.functions.GraftFunctions.register]]). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge backward as-of join. Children are key-clustered and
  * (key, time)-sorted by EnsureRequirements; each partition runs one
  * forward merge holding a single candidate right row. Time expressions
  * must be TimestampType/LongType (microsecond order). */
case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // One output row per left row, in left order: both left properties hold.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // Standard operator observability: row/match counts surface in the SQL
  // UI and via plan.metrics like any built-in join's.
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val lOut = left.output
    val rOut = right.output
    val lKey = leftKey
    val rKey = rightKey
    val lTime = leftTime
    val rTime = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(lKey.dataType))
      val lkProj = UnsafeProjection.create(Seq(lKey), lOut)
      val rkProj = UnsafeProjection.create(Seq(rKey), rOut)
      val ltEval = BindReferences.bindReference(lTime, lOut)
      val rtEval = BindReferences.bindReference(rTime, rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      // Lookahead right row (copied — child iterators reuse row buffers).
      var curR: InternalRow = null
      var curRK: UnsafeRow = null
      var curRT: Long = 0L
      def advanceRight(): Unit = {
        curR = null
        while (curR == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rkProj(r)
          val t = rtEval.eval(r)
          if (!k.isNullAt(0) && t != null) {
            curR = r.copy()
            curRK = k.copy()
            curRT = t.asInstanceOf[Long]
          }
        }
      }
      advanceRight()

      // Latest right row at or before the current left row's time, same key.
      var cand: InternalRow = null
      var candK: UnsafeRow = null

      lIter.map { l =>
        numOutputRows += 1
        val lk = lkProj(l)
        val lt = ltEval.eval(l)
        if (lk.isNullAt(0) || lt == null) {
          resultProj(joined(l, nullRight))
        } else {
          val ltv = lt.asInstanceOf[Long]
          var cont = curR != null
          while (cont) {
            val c = keyOrd.compare(curRK, lk)
            if (c < 0 || (c == 0 && curRT <= ltv)) {
              if (c == 0) { cand = curR; candK = curRK }
              advanceRight()
              cont = curR != null
            } else cont = false
          }
          if (cand != null && keyOrd.compare(candK, lk) == 0) {
            numMatchedRows += 1
            resultProj(joined(l, cand))
          } else resultProj(joined(l, nullRight))
        }
      }
    }
  }
}
