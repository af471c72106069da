package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Asymmetric-distance (ADC) scoring for product-quantized vectors:
  * given a query's per-subspace distance lookup table `lut`
  * (array<double> of length m*kSub, laid out subspace-major) and a
  * vector's PQ code (array<int> of length m), returns
  * `sum_j lut[j*kSub + code[j]]` — the classic PQ approximate distance
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011).
  *
  * This is the hot loop of a PQ scan — one table lookup + add per
  * subspace instead of a 64-float dot product — so like
  * [[DotProductF64]] it is a native codegen'd expression: a HOF
  * spelling would interpret its lambda per candidate row and allocate
  * per row; this generates a flat Java loop inside whole-stage codegen
  * and allocates nothing. `kSub` is a plan-time literal baked into the
  * generated code.
  *
  * INVARIANTS (caller's contract): every `code[j]` is in [0, kSub) and
  * `lut.numElements() == m * kSub` where m = code length. The codegen'd
  * path trusts them — per-element branches are exactly what this
  * expression exists to avoid, and its producer ([[graft.queries
  * .EmbeddingQueries.annPqTopK]]) guarantees both by construction
  * (codes are argmins over kSub centroids; the LUT is built as m*kSub
  * literals). The interpreted path, which public `Column` users hit
  * first (and always under ANSI-off constant folding), validates them
  * and fails loudly instead of reading past the array.
  */
case class PqAdcScore(left: Expression, right: Expression, kSub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[ArrayData]
    val m = code.numElements()
    require(lut.numElements() == m * kSub,
      s"PqAdcScore: lut has ${lut.numElements()} entries, expected m*kSub = ${m * kSub}")
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = code.getInt(j)
      require(c >= 0 && c < kSub, s"PqAdcScore: code[$j] = $c outside [0, $kSub)")
      s += lut.getDouble(j * kSub + c); j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, code) => {
      val j = ctx.freshName("j"); val m = ctx.freshName("m")
      s"""
         |int $m = $code.numElements();
         |${ev.value} = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  ${ev.value} += $lut.getDouble($j * $kSub + $code.getInt($j));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(lut: Column, code: Column, kSub: Int): Column =
    ColumnBridge.toColumn(PqAdcScore(
      ColumnBridge.toExpression(lut), ColumnBridge.toExpression(code), kSub))
}
