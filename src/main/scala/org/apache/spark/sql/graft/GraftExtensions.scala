package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Config-based injection of graft's native expressions:
  *
  * {{{
  *   spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
  * }}}
  *
  * registers the functions at session build, the conventional way a
  * deployed cluster loads an extension library. [[GraftFunctions.register]]
  * is the runtime twin for sessions built without the config (tests,
  * notebooks, the driver's own session) — both resolve the same
  * expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectOptimizerRule(_ => BandedLevenshteinRule)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
