package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{AsOfJoinStrategy, DotProductFloat}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("SELECT vec_dot(a, b)")`
  * works anywhere the extension is loaded
  * (`--conf spark.sql.extensions=graft.GraftExtensions` on a cluster;
  * Sessions.local wires it automatically).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        // loud arity check: children(0)/children(1) alone would drop a
        // third argument silently and crash bare on one argument
        if (children.size != 2) throw new IllegalArgumentException(
          s"vec_dot expects exactly 2 arguments, got ${children.size}")
        DotProductFloat(children(0), children(1))
      }))
    // Whole-operator extension: plans AsOfJoinNode as the native
    // streaming-merge AsOfJoinExec (see AsOfJoinPlan.scala).
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
