package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension surface (SURVEY §2.12(c)): grouped top-k as
  * a first-class plan node — custom LogicalPlan + SparkStrategy +
  * physical SparkPlan, registered through experimental.extraStrategies
  * (or GraftExtensions.injectPlannerStrategy).
  *
  * Semantics: keep the first k rows of each group under the given
  * ordering, passing FULL rows through (the window-rank pattern
  * materializes a rank column and filters it; the TopKByScore aggregate
  * returns packed (score,payload) arrays — this node is the row-
  * preserving form).
  *
  * Scale shape: the exec node declares ClusteredDistribution(group) +
  * (group, order) child ordering and nothing else — Spark's own
  * EnsureRequirements plans the single hash exchange + sort, AQE still
  * coalesces partitions, and the operator itself is a streaming O(1)-
  * state filter over each sorted partition (no rank column, no second
  * pass, no per-group buffering).
  */
case class GroupTopKPlan(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKPlan =
    copy(child = newChild)
}

case class GroupTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // one hash exchange on the group key; EnsureRequirements inserts it
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  // groups contiguous, rows best-first within each group
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(groupExprs.map(e => SortOrder(e, Ascending)) ++ order)

  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    // normalize float/double group keys (-0.0 → 0.0, canonical NaN):
    // Spark's NormalizeFloatingNumbers rule only rewrites built-in
    // Aggregate/Join/Window nodes, and without it 0.0 vs -0.0 compare
    // equal in the sort (groups stay contiguous) but differ in key
    // BYTES, which would split the run and emit extra rows
    val groupLocal = groupExprs.map(
      org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize)
    val outLocal = child.output
    val kLocal = k
    child.execute().mapPartitionsInternal { it =>
      val keyProj = UnsafeProjection.create(groupLocal, outLocal)
      var currentKey: UnsafeRow = null
      var seen = 0
      it.filter { row =>
        val key = keyProj(row)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy() // projection reuses its buffer
          seen = 1
        } else {
          seen += 1
        }
        seen <= kLocal
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}

/** Column pruning through the custom node: Catalyst's own ColumnPruning
  * stops at operators it doesn't know, so `topk(df, …).select(cols)`
  * would read EVERY column of the child into the exchange. This rule
  * pushes a pruning projection below GroupTopKPlan keeping only the
  * columns the parent projects plus the node's own group/order
  * references — with it, the parquet ReadSchema shrinks to the used
  * columns (asserted in PlanSpec).
  */
object GroupTopKPruning extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projectList, g @ GroupTopKPlan(groups, order, k, child)) =>
      val needed = AttributeSet(projectList.flatMap(_.references)) ++
        AttributeSet(groups.flatMap(_.references)) ++
        AttributeSet(order.flatMap(_.references))
      val keep = child.output.filter(needed.contains)
      if (keep.size == child.output.size) p
      else Project(projectList, GroupTopKPlan(groups, order, k, Project(keep, child)))
  }
}

object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKPlan(g, o, k, child) => GroupTopKExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object GroupTopK {
  /** topk(df, k, groups, (col, desc)*): first k rows per group under the
    * given ordering. Column references are built as genuine Catalyst
    * UnresolvedAttributes (the Spark-4 Column API wraps expressions in
    * ColumnNode adapters that the analyzer only unwraps inside built-in
    * operators — inside a custom node they would reach execution
    * unevaluated). Registers the planner strategy on the session once. */
  def topk(df: DataFrame, k: Int,
      groups: Seq[String], order: Seq[(String, Boolean)]): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.Descending
    val spark = df.sparkSession
    // check-then-append on the session-global experimental lists is racy
    // under concurrent query construction; the rules are idempotent, so a
    // session-scoped lock is cheap insurance against double registration
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GroupTopKStrategy
      }
      if (!spark.experimental.extraOptimizations.contains(GroupTopKPruning)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ GroupTopKPruning
      }
    }
    val ord = order.map { case (name, desc) =>
      SortOrder(UnresolvedAttribute.quoted(name), if (desc) Descending else Ascending)
    }
    Bridge.ofRows(spark,
      GroupTopKPlan(groups.map(UnresolvedAttribute.quoted), ord, k,
        df.queryExecution.logical))
  }
}
