package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Bloom filter core over pre-hashed 64-bit items: M = 2^20 bits
  * (128 KiB), K = 7 probes via double hashing (h1 + i*h2, Kirsch &
  * Mitzenmacher's standard construction). `mightContain` never gives a
  * false NEGATIVE; the false-positive rate at n inserted items is
  * (1 - e^(-Kn/M))^K — ~8e-6 at n = 30k (the eval-shingle count this
  * repo's decontamination probe carries at sf0.1), degrading gracefully
  * as n grows. The bit array is OR-additive, which makes the aggregate
  * below partial-merge friendly: executors build partition-local
  * filters and the shuffle carries one fixed 128 KiB buffer per group
  * regardless of input size — same scale argument as
  * [[CountMinSketch]]. At 100 TB the knob is M (size by expected n for
  * the target fpp); the structure is unchanged.
  */
object BloomFilter {
  val NumBits = 1 << 20
  val NumLongs: Int = NumBits / 64
  val NumBytes: Int = NumBits / 8
  val K = 7

  def emptyBuffer: Array[Long] = new Array[Long](NumLongs)

  private def h1(item: Long): Long = MinHashSignature.mix64(item)
  // forced odd so successive probes cycle through distinct bits
  private def h2(item: Long): Long =
    MinHashSignature.mix64(item ^ 0x9e3779b97f4a7c15L) | 1L

  def add(buf: Array[Long], item: Long): Unit = {
    var h = h1(item)
    val step = h2(item)
    var i = 0
    while (i < K) {
      val bit = (h & (NumBits - 1)).toInt
      buf(bit >>> 6) |= 1L << (bit & 63)
      h += step
      i += 1
    }
  }

  def mergeInto(buf: Array[Long], other: Array[Long]): Unit = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
  }

  def toBytes(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    requireFilter(bytes)
    val out = new Array[Long](NumLongs)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  /** bloom_might_contain is SQL-registered, so an arbitrary BINARY can
    * reach it — fail descriptively, not with an index error.
    */
  def requireFilter(bytes: Array[Byte]): Unit =
    if (bytes.length != NumBytes)
      throw new IllegalArgumentException(
        s"not a bloom filter: expected $NumBytes bytes (M=$NumBits bits), " +
          s"got ${bytes.length}")

  /** Membership probe straight off the serialized filter — reads only
    * the K probed bytes, no 128 KiB long[] materialization per row
    * (this runs once per corpus shingle in the decontamination scan).
    */
  def mightContainBytes(bytes: Array[Byte], item: Long): Boolean = {
    requireFilter(bytes)
    probe(bytes, item)
  }

  private def probe(bytes: Array[Byte], item: Long): Boolean = {
    var h = h1(item)
    val step = h2(item)
    var i = 0
    while (i < K) {
      val bit = (h & (NumBits - 1)).toInt
      if ((bytes(bit >>> 3) & (1 << (bit & 7))) == 0) return false
      h += step
      i += 1
    }
    true
  }

  /** shared by BloomCountContained's interpreted eval and generated
    * code: filter validated ONCE per call, then one probe per element —
    * an entire document's shingle set in one invocation.
    */
  def countContained(bytes: Array[Byte],
      items: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    requireFilter(bytes)
    var n = 0L
    var i = 0
    val len = items.numElements()
    while (i < len) {
      if (!items.isNullAt(i) && probe(bytes, items.getLong(i))) n += 1
      i += 1
    }
    n
  }
}

/** Bloom-filter AGGREGATE over a pre-hashed `bigint` item column
  * (TypedImperativeAggregate, like [[CmsSketchAgg]]): per-group output
  * is the serialized 128 KiB filter (BINARY), probed with
  * [[BloomMightContain]]. Partial aggregation applies — map-side
  * filters OR-merge, so the exchange carries filters, not items. Null
  * items are ignored (SQL aggregate convention).
  */
case class BloomFilterAgg(child: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = BloomFilter.emptyBuffer

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilter.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    BloomFilter.mergeInto(buf, other)
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomFilter.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomFilter.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomFilter.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

object BloomFilterAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(item: Column): Column =
    ColumnBridge.toColumn(
      BloomFilterAgg(ColumnBridge.toExpression(item)).toAggregateExpression())
}

/** Membership probe against a serialized bloom filter: false means
  * definitely absent; true means present or a (bounded-rate) false
  * positive.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(filter: Any, item: Any): Any =
    BloomFilter.mightContainBytes(filter.asInstanceOf[Array[Byte]],
      item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, i) =>
      s"${ev.value} = graft.functions.BloomFilter.mightContainBytes($f, $i);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(filter: Column, item: Column): Column =
    ColumnBridge.toColumn(BloomMightContain(
      ColumnBridge.toExpression(filter), ColumnBridge.toExpression(item)))
}

/** Count of array elements the filter might contain — the whole
  * decontamination probe for ONE document in ONE codegen'd call.
  * The explode + per-shingle filter + groupBy(doc_id) spelling this
  * replaces shuffled one row PER SHINGLE (~200× the document count)
  * just to count matches; this keeps the probe a narrow map — the
  * count lands on the same row as the document, and the only shuffle
  * left in the decontamination query is its presentation sort.
  * Null array elements are skipped (consistent with the aggregate's
  * null-item convention).
  */
case class BloomCountContained(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(filter: Any, items: Any): Any =
    BloomFilter.countContained(filter.asInstanceOf[Array[Byte]],
      items.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, a) =>
      s"${ev.value} = graft.functions.BloomFilter.countContained($f, $a);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomCountContained =
    copy(left = newLeft, right = newRight)
}

object BloomCountContained {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(filter: Column, items: Column): Column =
    ColumnBridge.toColumn(BloomCountContained(
      ColumnBridge.toExpression(filter), ColumnBridge.toExpression(items)))
}
