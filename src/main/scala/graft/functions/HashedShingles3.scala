package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Distinct sorted 3-gram word shingles of an `array<string>` words
  * column, hashed to 64-bit longs — one codegen'd pass, bit-identical to
  * the built-in spelling
  * `array_sort(array_distinct(transform(sequence(0, size(ws)-3),
  *   i -> xxhash64(ws[i+1], ws[i+2], ws[i+3]))))`
  * (xxhash64 chains seed 42 through the three words, which
  * [[XXH64.hashUTF8String]] reproduces exactly). Fewer than 3 words ->
  * empty array.
  *
  * Why an expression and not the `transform` spelling: higher-order
  * functions never enter whole-stage codegen, so one HOF downgrades its
  * whole projection — and any FILTER Catalyst later builds over the
  * shingle column inlines the lambda onto the raw `text` and re-splits
  * the document per lambda element on the interpreted path (the
  * documented O(words^2) pitfall, observed again as a single-core 3 s
  * stage on a 1.5 MB corpus). This expression keeps the whole
  * shingle -> minhash -> band pipeline codegen'd, immune to where the
  * optimizer moves it.
  */
case class HashedShingles3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashedShingles3.shingles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.HashedShingles3.shingles($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): HashedShingles3 =
    copy(child = newChild)
}

object HashedShingles3 {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** shared by interpreted eval and generated code (one implementation,
    * no interpreted-vs-codegen divergence risk). Null elements are
    * SKIPPED within their shingle, matching the built-in `xxhash64`
    * spelling, which hashes past null arguments.
    *
    * MUST NOT be named `eval`: a same-name class member (the inherited
    * `Expression.eval`) suppresses the static forwarder the generated
    * Java calls, silently de-codegen-ing the plan (CodegenSpec pins this).
    */
  def shingles(ws: ArrayData): GenericArrayData = {
    val n = ws.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      var h = 42L
      var j = i
      while (j < i + 3) {
        val w = if (ws.isNullAt(j)) null else ws.getUTF8String(j)
        if (w != null) h = XXH64.hashUTF8String(w, h)
        j += 1
      }
      hs(i) = h
      i += 1
    }
    new GenericArrayData(sortedDistinct(hs))
  }

  /** sort ascending + in-place dedupe */
  private def sortedDistinct(hs: Array[Long]): Array[Long] = {
    if (hs.length == 0) return hs
    java.util.Arrays.sort(hs)
    var w = 1
    var i = 1
    while (i < hs.length) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w)
  }

  def apply(ws: Column): Column =
    ColumnBridge.toColumn(HashedShingles3(ColumnBridge.toExpression(ws)))
}
