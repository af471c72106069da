package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Symmetric int8 quantization of an `array<double>` vector: each
  * component becomes `rint(x / scale)` clamped to [-127, 127], packed
  * into a BINARY column — 8x smaller than the `array<double>` it
  * replaces (plus no per-element container overhead), which at corpus
  * scale is the difference between scanning 100 TB of embeddings and
  * scanning 12.5 TB.
  *
  * `scale` is per-vector (callers pass
  * `greatest(array_max(v), -array_min(v)) / 127` — built-ins, no HOF).
  * COSINE similarity between two quantized vectors needs no scale at
  * all — the per-vector scales cancel in dot/(|a||b|) — so the ANN path
  * ([[DotProductI8]]) runs on pure integers; the scale column is kept
  * only for value reconstruction.
  */
case class QuantizeI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any, scale: Any): Any =
    QuantizeI8.quantize(v.asInstanceOf[ArrayData], scale.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) =>
      s"${ev.value} = graft.functions.QuantizeI8.quantize($a, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizeI8 =
    copy(left = newLeft, right = newRight)
}

object QuantizeI8 {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** shared by interpreted eval and generated code; a zero/absent scale
    * (all-zero vector) quantizes to all zeros rather than dividing by 0.
    *
    * MUST NOT be named `eval`: the companion class inherits
    * `Expression.eval`, and scalac suppresses a companion-object static
    * forwarder whenever the class has ANY member of the same name — the
    * generated Java then fails to compile and the whole plan silently
    * falls back to interpreted execution (CodegenSpec pins this).
    */
  def quantize(v: ArrayData, scale: Double): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    if (scale > 0) {
      var i = 0
      while (i < n) {
        val q = math.rint(v.getDouble(i) / scale)
        out(i) = math.max(-127.0, math.min(127.0, q)).toByte
        i += 1
      }
    }
    out
  }

  def apply(v: Column, scale: Column): Column =
    ColumnBridge.toColumn(QuantizeI8(
      ColumnBridge.toExpression(v), ColumnBridge.toExpression(scale)))
}
