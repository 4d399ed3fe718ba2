package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: lets deployments register the
  * engine's custom expressions at session-build time via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (the standard
  * plugin seam — no code change in the consuming application). Per-session
  * registration is also available via [[GraftFunctions.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.sqlFunctions.foreach { case (name, exprClass, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(exprClass.getName, name),
        builder))
    }
}
