package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CoOccurGenerator, DotProduct}

/** SparkSessionExtensions entry point: installs the engine's custom
  * Catalyst functions at session build time, so any session created with
  *
  * {{{ SparkSession.builder()
  *       .config("spark.sql.extensions", "graft.GraftExtensions") ... }}}
  *
  * (or `.withExtensions(new GraftExtensions)`) has `co_occur_pairs` and
  * `dot_d` available in SQL without per-query registration. The
  * per-session `register(...)` helpers in graft.functions remain for
  * sessions built without extensions (e.g. the driver's own).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("co_occur_pairs"),
      new ExpressionInfo(classOf[CoOccurGenerator].getName, "co_occur_pairs"),
      (exprs: Seq[Expression]) => CoOccurGenerator(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_d"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    // whole-operator extension: plans graft.plans.CoOccurWindow logical
    // nodes to their custom physical node (sessions built without
    // extensions get the same strategy via CoOccurWindow.install)
    ext.injectPlannerStrategy(_ => graft.plans.CoOccurWindowStrategy)
  }
}
