package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** In-order dot product of two `array<double>` columns as a native
  * codegen'd loop.
  *
  * The higher-order-function spelling —
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` — evaluates its
  * lambdas interpreted and allocates the zipped array per row; fine per
  * document, dominant when an LSH verify stage scores ~millions of
  * candidate pairs. This expression is three lines of generated Java
  * inside whole-stage codegen and allocates nothing.
  *
  * Accumulation is strictly left-to-right, so results are bit-identical
  * to the HOF spelling and to DuckDB's
  * `list_sum(list_transform(list_zip(a, b), x -> x[1] * x[2]))` — which
  * is what lets cosine queries hash-match the oracle on doubles.
  * Mismatched lengths dot the common prefix (callers pass fixed-dim
  * embeddings).
  */
case class DotProductF64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

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
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF64 =
    copy(left = newLeft, right = newRight)
}

object DotProductF64 {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(DotProductF64(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
