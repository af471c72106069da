package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style rolling fingerprint: the minimum md5 hex digest over
  * all 8-char windows of a string, as ONE codegen'd expression —
  * bit-identical to the HOF spelling
  * `array_min(transform(sequence(1, greatest(length(s)-7, 1)),
  *   i -> md5(substr(s, i, 8))))`
  * and to DuckDB's `list_min(list_transform(range(...), i ->
  * md5(substr(s, i, 8))))` (lowercase-hex md5 compares lexicographically
  * exactly like the digest bytes compare unsigned, so the min is
  * tracked on raw 16-byte digests and hex-encoded once at the end).
  *
  * Why an expression: the `transform` lambda never enters whole-stage
  * codegen, and its interpreted evaluation allocates a substring, a
  * digest, and a hex UTF8String per window — ~300 windows/doc made this
  * the single most expensive projection in the suite (and interpreted
  * eval is hypersensitive to shared-JVM JIT state: 4 s standalone, 129 s
  * late in the full-suite bench). One digest per window, two
  * allocation-free comparisons, zero lambda machinery.
  *
  * Windows are CHARACTER-based to match `substr` semantics in both
  * engines (ASCII-equal corpora make char==byte; the non-ASCII path
  * falls back to per-window String slicing).
  */
case class WinnowMinMd5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WinnowMinMd5.winnow(input.asInstanceOf[UTF8String],
      MessageDigest.getInstance("MD5"))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "winnowMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.WinnowMinMd5.winnow($a, $md);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMinMd5 =
    copy(child = newChild)
}

object WinnowMinMd5 {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  val Window = 8

  private val HexDigits = "0123456789abcdef".toCharArray

  /** called from both interpreted eval and generated code. MUST NOT be
    * named `eval`: a same-name class member (the inherited
    * `Expression.eval`) suppresses the static forwarder the generated
    * Java calls, silently de-codegen-ing the plan (CodegenSpec pins this).
    */
  def winnow(s: UTF8String, md: MessageDigest): UTF8String = {
    val nBytes = s.numBytes()
    val min = new Array[Byte](16)
    var have = false
    val digest = new Array[Byte](16)
    if (nBytes == s.numChars()) {
      // ASCII fast path: char windows == byte windows over the raw bytes
      val bytes = s.getBytes
      val nWin = math.max(nBytes - Window + 1, 1)
      var i = 0
      while (i < nWin) {
        md.reset()
        md.update(bytes, i, math.min(Window, nBytes - i))
        digestInto(md, digest)
        if (!have || unsignedLess(digest, min)) {
          System.arraycopy(digest, 0, min, 0, 16); have = true
        }
        i += 1
      }
    } else {
      // non-ASCII path: `substr`/`length` in both engines count CODE
      // POINTS, not UTF-16 units — index windows by code point so
      // supplementary characters (surrogate pairs) window identically
      val str = s.toString
      val nCp = str.codePointCount(0, str.length)
      // UTF-16 offset of each code-point boundary (nCp + 1 entries)
      val off = new Array[Int](nCp + 1)
      var u = 0
      var c = 0
      while (c < nCp) { off(c) = u; u = str.offsetByCodePoints(u, 1); c += 1 }
      off(nCp) = str.length
      val nWin = math.max(nCp - Window + 1, 1)
      var i = 0
      while (i < nWin) {
        md.reset()
        md.update(str.substring(off(i), off(math.min(i + Window, nCp)))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        digestInto(md, digest)
        if (!have || unsignedLess(digest, min)) {
          System.arraycopy(digest, 0, min, 0, 16); have = true
        }
        i += 1
      }
    }
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HexDigits((min(j) >> 4) & 0xf).toByte
      hex(2 * j + 1) = HexDigits(min(j) & 0xf).toByte
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  private def digestInto(md: MessageDigest, out: Array[Byte]): Unit =
    md.digest(out, 0, 16)

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def apply(c: Column): Column =
    ColumnBridge.toColumn(WinnowMinMd5(ColumnBridge.toExpression(c)))
}
