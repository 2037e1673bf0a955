package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** dot_d(a, b): sequential-fold dot product of two array<double> columns.
  *
  * The engine's custom-`Expression` extension point (SURVEY.md §7): the
  * built-in formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)` is a
  * HigherOrderFunction — interpreted per element, no codegen — and was the
  * bench hot spot (~90 s for the 4M-pair brute-force ANN at sf0.1). This
  * expression emits a tight codegen'd loop with the SAME left-to-right
  * IEEE summation order, so results (and the DuckDB oracle) are
  * bit-identical to the fold it replaces.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_d"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.ArrayType
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        // getDouble on non-double array data would silently misread bytes
        TypeCheckResult.TypeCheckFailure(
          s"dot_d requires two array<double> arguments, got ${l.catalogString} and ${r.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object VectorFunctions {
  // weak keys: the guard must not pin sessions for the driver's lifetime
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  /** Idempotently register the engine's custom expressions with the
    * session's FunctionRegistry (usable from SQL and via call_function).
    */
  def register(spark: SparkSession): Unit = registered.synchronized {
    if (registered.add(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "dot_d", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    }
  }

  /** Column API for [[DotProduct]]. Requires register(spark) first. */
  def dotD(a: Column, b: Column): Column = call_function("dot_d", a, b)
}
