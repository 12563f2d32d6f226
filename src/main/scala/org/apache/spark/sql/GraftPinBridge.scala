package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Filter, LogicalPlan, Project, RepartitionByExpression}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Partitioning-preserving frame pinning.
  *
  * `Dataset.localCheckpoint` / `Dataset.checkpoint` in Spark 4.x build
  * the result `LogicalRDD` with `UnknownPartitioning` (measured on
  * 4.1.2 — see graft's `PinnedLayoutSpec`), so a memo that was
  * explicitly `repartition(n, key)`-ed before pinning LOSES the layout
  * metadata it just paid a shuffle for: every later key-aligned join or
  * aggregation against the pinned frame re-shuffles it from scratch. At
  * corpus scale that is a materialized-frame-sized exchange per
  * consumer per action — the single largest avoidable shuffle class in
  * graft's memo-heavy pipelines (the q78 verify joins re-shuffled the
  * whole digest memo by doc_id twice per shard).
  *
  * This bridge lives in `org.apache.spark.sql` so it can rebuild the
  * pinned `LogicalRDD` with the hash partitioning the frame actually
  * has. The claim is never taken on faith: [[verifiedLayout]] walks the
  * frame's ANALYZED plan down through layout-preserving nodes
  * (Project/Filter/Aggregate-on-superset/Deduplicate-on-superset) to the
  * `RepartitionByExpression` that established the layout, and only
  * claims `HashPartitioning(keys, n)` when the keys pass through that
  * whole chain UNCHANGED (same `exprId`) and are exactly the repartition
  * expressions. A frame whose lineage doesn't prove the layout pins
  * WITHOUT partitioning metadata — identical to stock behavior, never
  * wrong, just unoptimized.
  */
object GraftPinBridge {

  /** The hash layout `df` provably carries, or None. */
  private def verifiedLayout(
      plan: LogicalPlan, keys: Seq[Attribute]): Option[HashPartitioning] =
    plan match {
      case p: Project =>
        // keys must flow through as bare attributes (same exprId)
        val passed = keys.forall(k => p.projectList.exists {
          case a: AttributeReference => a.exprId == k.exprId
          case al: org.apache.spark.sql.catalyst.expressions.Alias =>
            al.child match {
              case a: AttributeReference => a.exprId == k.exprId
              case _ => false
            }
          case _ => false
        })
        if (passed) verifiedLayout(p.child, keys) else None
      case f: Filter => verifiedLayout(f.child, keys)
      case a: Aggregate =>
        // a hash aggregate whose grouping is a superset of the keys
        // plans inside the existing layout (ClusteredDistribution is
        // satisfied by a subset hash partitioning) — layout flows through
        val groupAttrs = a.groupingExpressions.collect {
          case ar: AttributeReference => ar.exprId
        }.toSet
        if (keys.forall(k => groupAttrs.contains(k.exprId)))
          verifiedLayout(a.child, keys)
        else None
      case d: Deduplicate =>
        if (keys.forall(k => d.keys.exists(_.exprId == k.exprId)))
          verifiedLayout(d.child, keys)
        else None
      case r: RepartitionByExpression =>
        val reparAttrs = r.partitionExpressions.collect {
          case ar: AttributeReference => ar.exprId
        }
        // HashPartitioning's murmur3 hash is ORDER-sensitive (it hashes
        // the expression sequence), so the requested keys must match the
        // repartition expressions exactly — same attributes, same order,
        // same multiplicity. A set comparison here would let
        // pinSerKeyed("b","a") over repartition(n, a, b) claim a layout
        // whose hash function differs from the physical row placement,
        // and a downstream join would skip a required exchange and
        // silently return wrong rows.
        val exact = reparAttrs.size == r.partitionExpressions.size &&
          reparAttrs == keys.map(_.exprId)
        (exact, r.optNumPartitions) match {
          case (true, Some(n)) => Some(HashPartitioning(keys, n))
          case _ => None
        }
      case _ => None
    }

  /** Pin `df` (localCheckpoint, or reliable checkpoint) and KEEP the
    * hash layout established by the `repartition(n, keys…)` in its
    * lineage, so key-aligned consumers of the memo plan with no
    * exchange. Falls back to a plain (layout-less) pin when the lineage
    * doesn't prove the claim — see class doc. */
  def pinKeepingLayout(df: DataFrame, keys: Seq[String], eager: Boolean,
      reliable: Boolean, level: Option[StorageLevel]): DataFrame = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val keyAttrs = keys.map(k =>
      cds.queryExecution.analyzed.output.find(_.name == k).getOrElse(
        throw new IllegalArgumentException(
          s"pinKeepingLayout: no output column named '$k'")))
    val layout = verifiedLayout(cds.queryExecution.analyzed, keyAttrs)
    val pinned = (reliable, level) match {
      case (true, _) => cds.checkpoint(eager)
      case (false, Some(l)) => cds.localCheckpoint(eager, l)
      case (false, None) => cds.localCheckpoint(eager)
    }
    layout match {
      case None => pinned
      case Some(hp) =>
        val pds = pinned.asInstanceOf[classic.Dataset[Row]]
        val lr = pds.queryExecution.analyzed.asInstanceOf[LogicalRDD]
        // the pinned plan re-ids its output attributes; remap the
        // partitioning expressions onto the new ids POSITIONALLY —
        // checkpoint preserves schema order, so the attribute at index i
        // of the pinned output is the attribute at index i of the
        // analyzed output. A by-name map would pick the wrong column on
        // frames with duplicate output names (legal through a Project).
        val origOutput = cds.queryExecution.analyzed.output
        val newKeys = keyAttrs.map { k =>
          lr.output(origOutput.indexWhere(_.exprId == k.exprId))
        }
        // carry the original pin's statistics and constraints through the
        // rebuild — dropping them resets the memo to defaultSizeInBytes
        // and a small memo silently stops broadcasting (measured: q78's
        // in-board verify joins fell from broadcast to sort-merge and the
        // query nearly doubled)
        val rebuilt = LogicalRDD(lr.output, lr.rdd,
          HashPartitioning(newKeys, hp.numPartitions),
          lr.outputOrdering, lr.isStreaming, lr.stream)(
          pds.sparkSession, Some(lr.computeStats()), Some(lr.constraints))
        classic.Dataset.ofRows(pds.sparkSession, rebuilt)
    }
  }
}
