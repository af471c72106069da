package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte size of a string — the raw ingredient of the
  * compression-ratio quality filter (highly compressible text is
  * boilerplate/repetition; nearly incompressible text is noise — both
  * tails get dropped in web-corpus curation, cf. Gopher's and
  * RefinedWeb's compressibility heuristics).
  *
  * Level 6 (zlib default), raw deflate (nowrap — no zlib header, so the
  * size measures content only). Deterministic: fixed level + fixed
  * input bytes give a fixed stream for a given zlib build; the JVM
  * bundles its own zlib, so results are stable across hosts. Not
  * SQL-oracle-checkable (DuckDB exposes no deflate) — pinned instead by
  * CompressionSpec fixtures (known-ratio inputs, monotonicity,
  * idempotence of measurement).
  *
  * One Deflater per EVALUATION would be allocation-heavy (native
  * state); this keeps a thread-local instance and resets it per row —
  * safe under whole-stage codegen's single-threaded per-task loop.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    DeflateSize.deflatedSize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeflateSize.deflatedSize($a);")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  // Deliberately never end()ed: executor task threads are pooled and
  // long-lived, so one native zlib context per thread for the JVM's
  // lifetime is the intended steady state (same trade as Spark's own
  // per-thread codec holders). If this ran on a thread-churning
  // executor, a size-bounded pool or Cleaner-registered holder would
  // be the spelling.
  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true)
  }

  /** shared by interpreted eval and generated code; NOT named `eval`
    * (see QuantizeI8 — the name would suppress the static forwarder the
    * generated Java calls and silently break codegen).
    */
  def deflatedSize(s: UTF8String): Long = {
    val d = local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = new Array[Byte](4096)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def apply(c: Column): Column =
    ColumnBridge.toColumn(DeflateSize(ColumnBridge.toExpression(c)))
}
