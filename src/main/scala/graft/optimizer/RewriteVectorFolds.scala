package graft.optimizer

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  ZipWith, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{DotProduct, L2SqDistance}

/** Optimizer rule: rewrite the declarative higher-order vector folds
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y),             0d, _+_)
  *   aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), 0d, _+_)
  *
  * into the engine's codegen'd [[DotProduct]] / [[L2SqDistance]]
  * expressions — the `injectOptimizerRule` leg of the extension surface
  * (SURVEY.md §7's preference order: compose built-ins, then a custom
  * Expression, then a whole-operator plan node). HigherOrderFunctions are
  * CodegenFallback — every element boxes through an interpreted lambda —
  * so a user (or an engine operator) writing the natural declarative fold
  * pays ~20× in the pairwise hot loop; with this rule installed the
  * natural form and the tuned form compile to the same tight loop.
  *
  * The rewrite is an IDENTITY, not an approximation: the native folds
  * reproduce the HOF's null semantics exactly (length mismatch → the
  * zip_with null-pad makes the sum null → native returns null; any null
  * element → null; null array → null) and the same left-to-right IEEE
  * summation order, so it is safe on ANY array<double> input, not just
  * the engine's fixed-width never-null vectors. Matching is strict:
  * zero must be literal 0.0, the merge lambda a bare `acc + x` (either
  * operand order), the finish lambda the identity — anything else is
  * left alone.
  */
object RewriteVectorFolds extends Rule[LogicalPlan] {

  private def sameVar(v: Expression, bound: NamedLambdaVariable): Boolean =
    v match {
      case n: NamedLambdaVariable => n.exprId == bound.exprId
      case _ => false
    }

  /** finish = identity: LambdaFunction(v, Seq(v)) (functions.aggregate's
    * 3-arg overload). */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(arg: NamedLambdaVariable), _) =>
      sameVar(body, arg)
    case _ => false
  }

  /** merge = acc + elem (or elem + acc). */
  private def isPlainSum(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _),
        Seq(acc: NamedLambdaVariable, elem: NamedLambdaVariable), _) =>
      (sameVar(l, acc) && sameVar(r, elem)) ||
        (sameVar(l, elem) && sameVar(r, acc))
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The zip term, as the native replacement's constructor when it
    * matches: x*y (either order) → DotProduct, (x−y)*(x−y) → L2SqDistance
    * (strictly left-minus-right in both factors — subtraction order flips
    * the sign of nothing here, but (x−y)*(y−x) is a DIFFERENT function).
    */
  private def matchTerm(body: Expression, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Option[(Expression, Expression) => Expression] =
    body match {
      case Multiply(l, r, _) if (sameVar(l, x) && sameVar(r, y)) ||
          (sameVar(l, y) && sameVar(r, x)) =>
        Some(DotProduct(_, _))
      case Multiply(Subtract(l1, r1, _), Subtract(l2, r2, _), _)
          if sameVar(l1, x) && sameVar(r1, y) &&
            sameVar(l2, x) && sameVar(r2, y) =>
        Some(L2SqDistance(_, _))
      case _ => None
    }

  /** Extractor: Some(native replacement) only when the WHOLE fold shape
    * matches — the transform's partial function then never fires on a
    * near-miss, so no equal-but-rebuilt tree can ping a fixed-point batch.
    */
  private object NativeFold {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(zipBody,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType), merge, finish)
          if isDoubleArray(a) && isDoubleArray(b) &&
            isPlainSum(merge) && isIdentityFinish(finish) =>
        matchTerm(zipBody, x, y).map(mk => mk(a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    // tree-pattern pruning (r14, the drift-attribution fix): every
    // matchable fold contains a HigherOrderFunction, and TreePattern
    // bits are cached per node, so plans without one — every non-vector
    // query in the bench — skip the whole expression walk in O(subtree
    // checks) instead of paying a full transform per optimizer pass
    // (measured 21 ms per optimize on a representative join+window
    // plan, BENCH_NOTES r14; ~0 with the pruning)
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees
        .TreePattern.HIGH_ORDER_FUNCTION)) {
      case NativeFold(native) => native
    }
}
