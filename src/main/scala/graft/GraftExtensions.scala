package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CoOccurGenerator, DotProduct, L2SqDistance}

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
    ext.injectFunction((
      FunctionIdentifier("l2sq_d"),
      new ExpressionInfo(classOf[L2SqDistance].getName, "l2sq_d"),
      (exprs: Seq[Expression]) => L2SqDistance(exprs(0), exprs(1))))
    // optimizer extension: the declarative aggregate(zip_with(...)) dot /
    // squared-L2 folds rewrite to the codegen'd native expressions
    // (sessions built without extensions get the same rule via
    // VectorFunctions.register's experimental.extraOptimizations hook)
    ext.injectOptimizerRule(_ => graft.optimizer.RewriteVectorFolds)
    // whole-operator extension: plans graft.plans.CoOccurWindow logical
    // nodes to their custom physical node (sessions built without
    // extensions get the same strategy via CoOccurWindow.install)
    ext.injectPlannerStrategy(_ => graft.plans.CoOccurWindowStrategy)
  }
}
