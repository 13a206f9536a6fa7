package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: install the graft Catalyst additions at
  * session BUILD time —
  *
  *   - [[OffsetComparisonRewrite]] as an optimizer rule, and
  *   - `graft_dot` ([[graft.functions.FloatDotProduct]]) as a SQL function
  *
  * via `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` on a cluster.
  * This is the packaged-deploy form of what the registry does per-session
  * with `experimental.extraOptimizations` / `createOrReplaceTempFunction`
  * (see `examples.ExtensionsDemo` for a self-contained run). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => OffsetComparisonRewrite)
    ext.injectFunction((
      FunctionIdentifier(graft.functions.FloatDotProduct.FnName),
      new ExpressionInfo(classOf[graft.functions.FloatDotProduct].getName,
        graft.functions.FloatDotProduct.FnName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.FloatDotProduct(exprs(0), exprs(1))))
  }
}
