package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Content-defined chunking of a binary payload (FastCDC-style gear
  * rolling hash; Xia et al., USENIX ATC 2016): emit
  * array<struct<offset:int, len:int, digest:long>> where boundaries are
  * cut wherever the rolling hash's low `maskBits` bits are zero (subject
  * to [minLen, maxLen]), and each chunk carries its FNV-1a 64-bit
  * digest.
  *
  * WHY content-defined: byte-shifted copies of media (a re-muxed video,
  * a file with a prepended header) defeat fixed-size chunking — every
  * block boundary moves. The gear hash is a function of (at most) the
  * trailing 64 bytes, so after an insertion the boundaries RE-SYNC at
  * the first content-defined cut past the edit and every later chunk
  * digest matches again — which is what makes cross-corpus chunk dedup
  * find the shared bytes. MultimodalSpec pins exactly that property,
  * plus exact tiling.
  *
  * Determinism: the gear table is splitmix64(0..255) — fixed, seedless,
  * engine-independent. The expression is evaluated via one static-call
  * codegen (a single non-virtual call per row inside whole-stage
  * codegen; the byte loop itself is plain compiled Java, nothing
  * interpreted per byte).
  */
case class CdcChunks(child: Expression, maskBits: Int,
                     minLen: Int, maxLen: Int)
    extends UnaryExpression {

  require(maskBits > 0 && maskBits < 48, "maskBits in (0, 48)")
  require(minLen >= 1 && maxLen >= minLen, "need 1 <= minLen <= maxLen")

  override def dataType: DataType = CdcChunks.schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CdcChunks.chunk(input.asInstanceOf[Array[Byte]],
      (1L << maskBits) - 1L, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.CdcChunks.chunk(" +
        s"$b, ${(1L << maskBits) - 1L}L, $minLen, $maxLen);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("offset", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("digest", LongType, nullable = false))), containsNull = false)

  /** splitmix64 — the standard public-domain mixer (Steele et al.) */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val GEAR: Array[Long] = Array.tabulate(256)(i => splitmix64(i.toLong))

  /** FNV-1a 64-bit over bytes[from, from+len) */
  private def fnv1a(bytes: Array[Byte], from: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = from + len
    while (i < end) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** The chunking loop — static so generated code calls it directly. */
  def chunk(bytes: Array[Byte], mask: Long, minLen: Int, maxLen: Int): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var start = 0
    var h = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      h = (h << 1) + GEAR(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen || i == n - 1) {
        out += InternalRow(start, len, fnv1a(bytes, start, len))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(payload: Column, maskBits: Int = 6,
            minLen: Int = 16, maxLen: Int = 256): Column =
    ColumnBridge.toColumn(CdcChunks(
      ColumnBridge.toExpression(payload), maskBits, minLen, maxLen))
}
