package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The built-in HOF route (`aggregate(zip_with(a, b, _*_), ...)`)
  * allocates an intermediate array and evaluates interpreted lambdas
  * per element — measurable at millions of pairs × 64 dims (the
  * similarity-search hot path). This expression generates a tight
  * primitive `double` loop via `doGenCode`, so it stays inside
  * whole-stage codegen with zero allocation: the preferred extension
  * point when built-in functions can't express the op efficiently
  * (custom Expression > UDF).
  *
  * Null array elements are treated as 0 contribution is NOT supported:
  * inputs are expected null-free (embedding vectors); a null element
  * reads as an unspecified primitive, matching the behavior of
  * primitive-array access elsewhere in Spark.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double> — VectorFunctions.dot casts
  // via asDouble; no ExpectsInputTypes (its types are private[sql]).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
