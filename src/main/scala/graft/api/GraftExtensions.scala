package graft.api

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.HammingDistanceExpr

/** SparkSessionExtensions entry point: registers graft's native
  * expressions into any session at build time —
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *
  * or via config:
  *   spark.sql.extensions=graft.api.GraftExtensions
  *
  * This is the deployment-grade packaging for the custom-expression
  * surface (SURVEY §7.4: no custom Rule/Strategy is *required* for
  * parity — injection points for them live here when one is).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("hamming64"),
      new ExpressionInfo(classOf[HammingDistanceExpr].getName, "hamming64"),
      (exprs: Seq[Expression]) =>
        HammingDistanceExpr(exprs.head, exprs(1))))
    // count-by-packed-long-key physical operator (gx18's aggregation
    // core); PackedCountAgg.countByKey also self-registers on sessions
    // built without extensions
    e.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graft.PackedCountAgg.Strategy)
  }
}
