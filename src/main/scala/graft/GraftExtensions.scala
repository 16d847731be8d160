package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-deployable registration: `--conf spark.sql.extensions=
  * graft.GraftExtensions` installs the Presto compatibility surface into
  * every session on the cluster — the production path (the per-session
  * `Engine` constructor covers embedded/test use). Equivalent role to the
  * reference's Plugin.getFunctions (SPI/Plugin.java:53).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.PrestoFunctions.registry.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.PrestoFunctions", name),
        (args: Seq[Expression]) => builder(args)))
    }
    // custom whole-operator plans (SURVEY §2.11 route c)
    ext.injectPlannerStrategy(_ => plans.AsOfJoinStrategy)
  }
}
