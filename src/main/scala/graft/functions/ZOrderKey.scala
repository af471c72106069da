package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) key of two non-negative integer dimensions: bit i
  * of `x` lands at bit 2i, bit i of `y` at bit 2i+1, 21 bits per
  * dimension (42-bit keys). Sorting / range-partitioning data by this
  * key clusters BOTH dimensions at once — a partition covering one
  * z-range is a bounded rectangle in (x, y) space, so min/max file
  * statistics prune scans on filters over EITHER column. This is the
  * data-layout trick behind multi-dimensional clustering in lakehouse
  * table formats, here as a plain codegen'd Catalyst expression feeding
  * `repartitionByRange` (see [[graft.plans.ZOrder]]).
  *
  * Out-of-range inputs (negative or >= 2^21) raise a descriptive error
  * rather than silently aliasing distant keys into the same z-region —
  * callers bucket or rescale dimensions down to 21 bits first (at
  * 100 TB the dimensions fed to a z-key are coarse range-bucket ids,
  * not raw values, precisely so the key stays dense).
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKey.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrderKey.interleave($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  val BitsPerDim = 21
  val MaxDim: Long = 1L << BitsPerDim

  /** spread the low 21 bits of v to even bit positions (0, 2, 4, ...)
    * via the standard 2D-Morton parallel-prefix bit dilation
    */
  private def spread(v: Long): Long = {
    var x = v & 0x1fffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** called from both interpreted eval and generated code (must not be
    * named `eval` — see SignBandBuckets.buckets for why)
    */
  def interleave(x: Long, y: Long): Long = {
    if (x < 0 || x >= MaxDim || y < 0 || y >= MaxDim)
      throw new IllegalArgumentException(
        s"zorder_key dimensions must be in [0, $MaxDim), got ($x, $y); " +
          "range-bucket or rescale wider dimensions first")
    spread(x) | (spread(y) << 1)
  }

  def apply(x: Column, y: Column): Column =
    ColumnBridge.toColumn(ZOrderKey(
      ColumnBridge.toExpression(x), ColumnBridge.toExpression(y)))
}
