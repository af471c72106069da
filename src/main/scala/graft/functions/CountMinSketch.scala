package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Min sketch core: D=4 rows x W=512 counters over pre-hashed
  * 64-bit items. `estimate` = min over rows — never underestimates, and
  * overestimates by at most eps*N w.h.p. (eps ~ e/W ~ 0.5%). The
  * counter matrix is ELEMENTWISE-ADDITIVE, which is what makes the
  * aggregate below partial-merge friendly: executors sketch their
  * partitions independently and the shuffle carries one fixed 16 KiB
  * buffer per group regardless of input size — the sketch property that
  * matters at 100 TB.
  */
object CountMinSketch {
  val D = 4
  val W = 512 // power of two: row index = mixed hash & (W-1)

  def emptyBuffer: Array[Long] = new Array[Long](D * W)

  private def rowIndex(item: Long, r: Int): Int =
    (MinHashSignature.mix64(item ^ (0xc3a5c85c97cb3127L * (r + 1))) & (W - 1)).toInt

  def add(buf: Array[Long], item: Long): Unit = {
    var r = 0
    while (r < D) { buf(r * W + rowIndex(item, r)) += 1; r += 1 }
  }

  def mergeInto(buf: Array[Long], other: Array[Long]): Unit = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
  }

  def estimate(buf: Array[Long], item: Long): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < D) {
      val c = buf(r * W + rowIndex(item, r))
      if (c < min) min = c
      r += 1
    }
    min
  }

  def toBytes(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    requireSketch(bytes)
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  /** cms_estimate is SQL-registered, so an arbitrary/truncated BINARY can
    * reach it — fail with a descriptive error instead of an
    * ArrayIndexOutOfBounds from the fixed D*W indexing.
    */
  def requireSketch(bytes: Array[Byte]): Unit =
    if (bytes.length != D * W * 8)
      throw new IllegalArgumentException(
        s"not a CMS sketch: expected ${D * W * 8} bytes (D=$D rows x W=$W " +
          s"counters x 8), got ${bytes.length}")

  /** Point estimate straight off the serialized sketch — reads only the
    * D counters the item maps to (no 16 KiB long[] materialization per
    * row, which matters when cms_estimate runs in a hot projection).
    */
  def estimateBytes(bytes: Array[Byte], item: Long): Long = {
    requireSketch(bytes)
    var min = Long.MaxValue
    var r = 0
    while (r < D) {
      val off = (r * W + rowIndex(item, r)) * 8
      var c = 0L
      var i = 7
      while (i >= 0) { c = (c << 8) | (bytes(off + i) & 0xffL); i -= 1 }
      if (c < min) min = c
      r += 1
    }
    min
  }
}

/** Count-Min sketch AGGREGATE over a pre-hashed `bigint` item column —
  * the engine's custom-aggregate leg (a TypedImperativeAggregate, the
  * Catalyst extension point for black-box aggregation state): per-group
  * output is the serialized sketch (BINARY), queryable with
  * [[CmsEstimate]]. Partial aggregation applies — map-side sketches
  * merge by counter addition, so the exchange carries sketches, not
  * rows. Null items are ignored (SQL aggregate convention).
  */
case class CmsSketchAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = CountMinSketch.emptyBuffer

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMinSketch.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    CountMinSketch.mergeInto(buf, other)
    buf
  }

  override def eval(buf: Array[Long]): Any = CountMinSketch.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CountMinSketch.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CountMinSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

object CmsSketchAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(item: Column): Column =
    ColumnBridge.toColumn(
      CmsSketchAgg(ColumnBridge.toExpression(item)).toAggregateExpression())
}

/** Point estimate from a serialized Count-Min sketch: min counter over
  * the item's D row cells. Never underestimates the true count.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(sketch: Any, item: Any): Any =
    CountMinSketch.estimateBytes(sketch.asInstanceOf[Array[Byte]],
      item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, i) =>
      s"${ev.value} = graft.functions.CountMinSketch.estimateBytes($s, $i);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(sketch: Column, item: Column): Column =
    ColumnBridge.toColumn(CmsEstimate(
      ColumnBridge.toExpression(sketch), ColumnBridge.toExpression(item)))
}
