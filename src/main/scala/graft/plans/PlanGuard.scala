package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalTableScanExec}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Opt-in physical-plan lint (`spark.graft.planGuard.enabled=true`,
  * injected via `injectQueryStagePrepRule`): FAIL LOUD before execution
  * when a plan contains an UNBOUNDED nested-loop join — the operator that
  * silently turns a typo'd join condition into a corpus² job at 100 TB.
  * Turns the PLANS.md audit invariant ("no CARTESIAN/BNLJ except over
  * bounded frames") from a per-round human check into an enforced
  * runtime gate for production jobs.
  *
  * Allowed shapes (the engine's own legitimate uses):
  *   - a side whose subtree contains an aggregation with NO grouping
  *     expressions — exactly one row by construction (the broadcast
  *     1-row-aggregate crossJoin pattern every drift/stats fold uses);
  *   - a side under a `Limit` (bounded by the literal);
  *   - a side that is a `LocalTableScan` (driver-literal frame).
  *
  * Everything else raises with the offending operator's one-line
  * rendering and the remediation hint. The rule only observes — passing
  * plans are returned untouched, so enabling the guard can never change
  * results. Registered through [[graft.functions.GraftExtensions]];
  * note `injectQueryStagePrepRule` hooks run under ADAPTIVE execution
  * (Spark's default) — with AQE disabled the guard is inert.
  */
case class PlanGuardRule(session: SparkSession) extends Rule[SparkPlan] {

  private def enabled: Boolean =
    session.conf.getOption("spark.graft.planGuard.enabled")
      .exists(_.equalsIgnoreCase("true"))

  /** Bounded = some node in the subtree caps the row count statically. */
  private def bounded(p: SparkPlan): Boolean = {
    var found = false
    p.foreach {
      case h: HashAggregateExec if h.groupingExpressions.isEmpty => found = true
      case o: ObjectHashAggregateExec if o.groupingExpressions.isEmpty => found = true
      case s: SortAggregateExec if s.groupingExpressions.isEmpty => found = true
      case _: GlobalLimitExec => found = true
      case _: LocalTableScanExec => found = true
      case _ =>
    }
    found
  }

  private def fail(kind: String, node: SparkPlan): Nothing =
    throw new IllegalStateException(
      s"graft plan guard: $kind over unbounded inputs — at 100 TB this is " +
        s"a corpus-squared job. Offending operator: ${node.nodeName}. " +
        "Fix the join condition (missing/typo'd equi-key?), broadcast a " +
        "bounded (ungrouped-aggregate or limited) frame, or disable " +
        "spark.graft.planGuard.enabled for this query.")

  override def apply(plan: SparkPlan): SparkPlan = {
    if (enabled) plan.foreach {
      case c: CartesianProductExec
          if !bounded(c.left) && !bounded(c.right) =>
        fail("CartesianProduct", c)
      case b: BroadcastNestedLoopJoinExec =>
        val build = b.buildSide match {
          case BuildLeft => b.left
          case BuildRight => b.right
        }
        if (!bounded(build)) fail("BroadcastNestedLoopJoin", b)
      case _ =>
    }
    plan
  }
}
