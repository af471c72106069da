package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer dot product of two int8-quantized vectors (BINARY columns
  * from [[QuantizeI8]]): `sum_i a_i * b_i` over signed bytes, as a
  * codegen'd zero-allocation loop returning LONG — exact (no float
  * accumulation error: |sum| <= 127*127*len), and the only primitive
  * the quantized COSINE needs, since per-vector scales cancel:
  * `cos = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`.
  *
  * Inputs must be equal length (quantized from the same embedding
  * dimensionality); the shorter length is used if they differ, matching
  * `zip_with`'s truncating behavior.
  */
case class DotProductI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductI8.dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProductI8.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI8 =
    copy(left = newLeft, right = newRight)
}

object DotProductI8 {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** shared by interpreted eval and generated code. MUST NOT be named
    * `eval`: a same-name class member (here the inherited
    * `Expression.eval`) suppresses the static forwarder the generated
    * Java calls, silently de-codegen-ing every plan containing this
    * expression (CodegenSpec pins this).
    */
  def dot(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(DotProductI8(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
