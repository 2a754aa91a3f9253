package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning,
  RangePartitioning, RoundRobinPartitioning, SinglePartition}
import org.apache.spark.sql.execution.{FileSourceScanExec, InputAdapter,
  SortExec, SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec,
  ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec,
  ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
  BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec,
  SortMergeJoinExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Canonicalized physical-plan fingerprints — the plan-regression gate.
  *
  * PLANS.md documents plan shapes by hand after the fact; this is the
  * mechanical version: a stable, diff-able rendering of the decisions
  * that matter at 100 TB — join strategy + build side, exchange count
  * and partitioning kind, window partition-spec arity (a 0-key Window
  * is the single-partition scale bug), aggregate key arity, scan column
  * width + pushed filters, top-K vs global sort. Everything
  * run-dependent (expression ids, partition COUNTS — which follow
  * spark.sql.shuffle.partitions — statistics, codegen stage ids) is
  * stripped, so the fingerprint is stable across JVMs for a fixed
  * dataset + session conf, and a broadcast→SortMergeJoin flip or a new
  * exchange shows up as a one-line diff in `PlanSnapshotSpec` at review
  * time instead of in a bench postmortem.
  *
  * Fingerprints read the STATIC pre-runtime plan — the deterministic
  * artifact; AQE's runtime re-plans (auto-broadcast, skew splits) are
  * measured by the bench, not pinned here. PlanSnapshotSpec pins with
  * AQE disabled on a dedicated session; calling from an AQE-on session
  * still works (the adaptive wrapper is descended into its initial
  * plan, never fingerprinted as a leaf), but pinned snapshots should
  * stay AQE-off for stability.
  */
object PlanFingerprint {

  def fingerprint(df: DataFrame): String =
    render(df.queryExecution.executedPlan, 0).mkString("\n")

  private def render(p: SparkPlan, depth: Int): Seq[String] = p match {
    // codegen collapse wrappers are transparent: whether a stage fuses
    // is worth watching in bench, but pinning it would make every
    // snapshot churn on unrelated operator-support changes
    case w: WholeStageCodegenExec => render(w.child, depth)
    case i: InputAdapter => render(i.child, depth)
    // AdaptiveSparkPlanExec is a LEAF node (its plan is not a child), so
    // without this case an AQE-enabled caller would get a one-line
    // fingerprint for every query and the gate would pass vacuously
    // (review finding). Descend into executedPlan — before execution
    // that is the deterministic INITIAL physical plan, so fingerprints
    // from an AQE-on session match the AQE-off static plan.
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      render(a.executedPlan, depth)
    case _ =>
      (("  " * depth) + label(p)) +: p.children.flatMap(render(_, depth + 1))
  }

  private def strip(s: String): String =
    s.replaceAll("#\\d+[L]?", "").replaceAll("\\s+", " ").trim

  private def label(p: SparkPlan): String = p match {
    case j: BroadcastHashJoinExec =>
      s"BroadcastHashJoin(${j.joinType}, build=${j.buildSide})"
    case j: ShuffledHashJoinExec =>
      s"ShuffledHashJoin(${j.joinType}, build=${j.buildSide})"
    case j: SortMergeJoinExec => s"SortMergeJoin(${j.joinType})"
    case j: BroadcastNestedLoopJoinExec =>
      s"BroadcastNestedLoopJoin(${j.joinType}, build=${j.buildSide})"
    case _: CartesianProductExec => "CartesianProduct"
    case e: ShuffleExchangeExec => e.outputPartitioning match {
      case h: HashPartitioning => s"Exchange(hash, keys=${h.expressions.size})"
      case r: RangePartitioning => s"Exchange(range, keys=${r.ordering.size})"
      case _: RoundRobinPartitioning => "Exchange(roundrobin)"
      case SinglePartition => "Exchange(single)"
      case other => s"Exchange(${other.getClass.getSimpleName})"
    }
    case _: BroadcastExchangeExec => "BroadcastExchange"
    case _: ReusedExchangeExec => "ReusedExchange"
    case w: WindowExec => s"Window(partitionKeys=${w.partitionSpec.size})"
    case w: WindowGroupLimitExec =>
      s"WindowGroupLimit(partitionKeys=${w.partitionSpec.size})"
    case a: HashAggregateExec => s"HashAggregate(keys=${a.groupingExpressions.size})"
    case a: ObjectHashAggregateExec =>
      s"ObjectHashAggregate(keys=${a.groupingExpressions.size})"
    case a: SortAggregateExec => s"SortAggregate(keys=${a.groupingExpressions.size})"
    case s: SortExec => s"Sort(global=${s.global})"
    case _: TakeOrderedAndProjectExec => "TakeOrderedAndProject"
    case s: FileSourceScanExec =>
      val pushed = strip(s.metadata.getOrElse("PushedFilters", "[]"))
      s"FileScan(cols=${s.output.size}, pushed=$pushed)"
    case other => strip(other.nodeName)
  }
}
