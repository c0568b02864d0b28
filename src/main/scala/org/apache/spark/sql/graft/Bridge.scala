package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 split the public Column API from Catalyst Expressions; the
  * converters live in `private[sql]` ExpressionUtils. This bridge sits
  * in an org.apache.spark.sql subpackage (the standard extension
  * technique) to expose exactly the two conversions graft's custom
  * expressions need.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a (possibly custom) logical plan — the constructor
    * custom operators like GroupTopK need. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Release the block storage behind a localCheckpoint()ed Dataset.
    *
    * Dataset.localCheckpoint materializes the query to cached RDD blocks
    * and returns a plan over a LogicalRDD — but offers no public way to
    * free those blocks before the driver GC + ContextCleaner get around
    * to it. Iterative operators (graft.llm.Cluster) checkpoint per round
    * and must drop the superseded round's blocks eagerly, or a long
    * session carries every round's labels in storage memory (VERDICT r03
    * item 1). Traverses the analyzed plan and unpersists every LogicalRDD
    * it finds — call ONLY on frames whose checkpoint data is no longer
    * referenced by any live plan (local checkpoints cannot be recomputed).
    */
  def uncheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Non-hanging read of an Observation's metrics: returns the metric
    * map if the observation event has fired (parking ≤ 100 ms on the
    * monitor — it wakes immediately on the notify), else empty.
    * `Observation.getOrEmpty` is `private[sql]` in Spark 4; the public
    * `get` blocks forever when the event never fires, which is exactly
    * the failure mode graft.llm.Cluster's bounded-wait loop defends
    * against (ADVICE r14). */
  def observedOrEmpty(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getOrEmpty.toMap

  /** Register graft's custom expressions as SQL functions on an existing
    * session (the SparkSessionExtensions route in graft.GraftExtensions
    * only applies to sessions built with .withExtensions). */
  def registerFunctions(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => graft.functions.DotProduct(exprs(0), exprs(1)),
      "built-in")
}
