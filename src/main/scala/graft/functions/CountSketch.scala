package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Sketch core (Charikar–Chen–Farach-Colton, ICALP 2002): the
  * SIGNED sibling of [[CountMinSketch]]. Each of D rows hashes the item
  * to one of W counters AND to a ±1 sign; the counter accumulates the
  * signed count. Where CMS only overestimates (collisions always add),
  * the random signs make every row's estimate UNBIASED — collisions
  * cancel in expectation — which is the property the AMS join-size
  * estimator needs: the inner product of two sketch rows is an unbiased
  * estimate of Σ_k f_A(k)·f_B(k) = |A ⋈ B| (Alon–Matias–Szegedy, STOC
  * 1996; Dobra et al., SIGMOD 2002 for the join-size form), with
  * variance ~ F2(A)·F2(B)/W per row, tightened by the MEDIAN over the D
  * independent rows (D odd so the median is a computed value).
  *
  * Scale posture: like CMS, the counter matrix is elementwise-additive —
  * executors sketch partitions independently and one fixed 20 KiB
  * buffer per side crosses the exchange regardless of input size. That
  * is the whole point: |A ⋈ B| gets estimated from two single passes
  * with constant state, where the exact answer needs a per-key
  * frequency table of every distinct key on both sides.
  */
object CountSketch {
  val D = 5 // odd: median of an odd count is an observed row estimate
  val W = 512

  def emptyBuffer: Array[Long] = new Array[Long](D * W)

  /** row-r bucket and sign from one mixed hash: low bits index, bit 62
    * (independent of the low 9 after mixing) carries the sign
    */
  private def mixed(item: Long, r: Int): Long =
    MinHashSignature.mix64(item ^ (0x9e3779b97f4a7c15L * (r + 1)))

  def add(buf: Array[Long], item: Long): Unit = {
    var r = 0
    while (r < D) {
      val m = mixed(item, r)
      val idx = (m & (W - 1)).toInt
      val sign = if (((m >>> 62) & 1L) == 1L) 1L else -1L
      buf(r * W + idx) += sign
      r += 1
    }
  }

  def mergeInto(buf: Array[Long], other: Array[Long]): Unit = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
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

  def requireSketch(bytes: Array[Byte]): Unit =
    if (bytes.length != D * W * 8)
      throw new IllegalArgumentException(
        s"not a count-sketch: expected ${D * W * 8} bytes (D=$D x W=$W x 8), " +
          s"got ${bytes.length}")

  /** AMS join-size estimate: median over rows of the row-wise inner
    * product of the two (same-shape) sketches. Clamped at 0 — a join
    * size is never negative, and a heavily-cancelled row can dip below.
    */
  def innerProduct(a: Array[Byte], b: Array[Byte]): Long = {
    val av = fromBytes(a); val bv = fromBytes(b)
    val dots = new Array[Long](D)
    var r = 0
    while (r < D) {
      var s = 0L
      var w = 0
      while (w < W) { s += av(r * W + w) * bv(r * W + w); w += 1 }
      dots(r) = s
      r += 1
    }
    java.util.Arrays.sort(dots)
    math.max(0L, dots(D / 2))
  }
}

/** Count-Sketch AGGREGATE over a pre-hashed `bigint` item column — same
  * TypedImperativeAggregate shape as [[CmsSketchAgg]]: per-group output
  * is the serialized signed-counter matrix (BINARY), map-side partials
  * merge by addition, null items are ignored.
  */
case class CountSketchAgg(child: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = CountSketch.emptyBuffer

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountSketch.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    CountSketch.mergeInto(buf, other)
    buf
  }

  override def eval(buf: Array[Long]): Any = CountSketch.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CountSketch.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CountSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountSketchAgg =
    copy(child = newChild)
}

object CountSketchAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(item: Column): Column =
    ColumnBridge.toColumn(
      CountSketchAgg(ColumnBridge.toExpression(item)).toAggregateExpression())
}

/** AMS inner-product estimate of |A ⋈ B| from two serialized
  * count-sketches (see [[CountSketch.innerProduct]]).
  */
case class CsJoinSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CountSketch.innerProduct(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CountSketch.innerProduct($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CsJoinSize =
    copy(left = newLeft, right = newRight)
}

object CsJoinSize {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(CsJoinSize(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
