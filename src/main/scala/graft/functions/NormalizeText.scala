package graft.functions

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for corpus preparation, one codegen'd
  * pass per document: Unicode NFC composition (e + combining acute ->
  * precomposed é, so byte-level dedup/fingerprinting sees one spelling
  * per grapheme), Unicode-aware lowercasing (Locale.ROOT — no Turkish-I
  * surprises on a multilingual corpus), and ASCII-whitespace collapse
  * (runs of space/tab/CR/LF/FF -> one space, ends trimmed).
  *
  * Spark has no NFC built-in, and the regexp_replace + lower spelling
  * costs three passes plus two intermediate strings per document; this
  * expression fast-paths the (dominant, at web scale) pure-ASCII
  * already-canonical case to a bytes-level scan that allocates nothing
  * unless a change is actually needed. Like every hot-path expression
  * here it is codegen'd so the curation pipeline stays inside
  * whole-stage codegen (see HashedShingles3 for the interpreted-HOF
  * pitfall that discipline avoids).
  *
  * The whitespace class is exactly `[ \t\n\r\f]` (Java \s minus \x0B,
  * RE2 \s plus nothing) so the semantics are reproducible in both Java
  * and RE2-family engines — the DuckDB oracle uses the same explicit
  * class.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NormalizeText.normalize($a);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  private val Ws = Pattern.compile("[ \t\n\r\f]+")

  /** shared by interpreted eval and generated code. MUST NOT be named
    * `eval` (companion-class member name collision suppresses the static
    * forwarder and silently breaks codegen — CodegenSpec pins this for
    * the whole expression family).
    */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    // Fast path: ASCII bytes that are already lowercase with single
    // interior spaces need no JVM String round-trip at all. One branchy
    // scan; the common web-scale case after a first normalization pass.
    var i = 0
    var clean = true
    var prevSpace = true // leading space is "dirty" (trim semantics)
    while (clean && i < bytes.length) {
      val b = bytes(i)
      if (b < 0 || (b >= 'A' && b <= 'Z') || b == '\t' || b == '\n' ||
          b == '\r' || b == '\f' || (b == ' ' && prevSpace)) clean = false
      else prevSpace = b == ' '
      i += 1
    }
    if (clean && !prevSpace) return s          // also rejects trailing space
    if (clean && bytes.length == 0) return s
    val str = s.toString
    val nfc =
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) str
      else Normalizer.normalize(str, Normalizer.Form.NFC)
    val collapsed = Ws.matcher(nfc.toLowerCase(Locale.ROOT)).replaceAll(" ")
    // space-only trim (String.trim would also strip \x0B and other
    // sub-space controls, which the whitespace class deliberately
    // excludes — the oracle's TRIM(x, ' ') must see identical semantics)
    val from = if (collapsed.startsWith(" ")) 1 else 0
    val until =
      if (collapsed.length > from && collapsed.endsWith(" ")) collapsed.length - 1
      else collapsed.length
    UTF8String.fromString(collapsed.substring(from, until))
  }

  def apply(c: Column): Column =
    ColumnBridge.toColumn(NormalizeText(ColumnBridge.toExpression(c)))
}
