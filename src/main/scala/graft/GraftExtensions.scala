package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's custom Catalyst
  * expressions available as SQL functions in any session built with
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or via --conf spark.sql.extensions=graft.GraftExtensions.
  * (Already-running sessions can use Bridge.registerFunctions instead.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[functions.DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => functions.DotProduct(exprs.head, exprs(1))))
    // whole-operator surface: plans GroupTopKPlan → GroupTopKExec, and
    // prunes columns through the custom node (built-in ColumnPruning
    // stops at operators it doesn't know)
    e.injectPlannerStrategy(_ => org.apache.spark.sql.graft.GroupTopKStrategy)
    e.injectOptimizerRule(_ => org.apache.spark.sql.graft.GroupTopKPruning)
  }
}
