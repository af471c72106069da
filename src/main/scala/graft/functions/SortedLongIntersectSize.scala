package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** `|A ∩ B|` of two SORTED `array<bigint>` columns as a native codegen'd
  * merge scan.
  *
  * The built-in `array_intersect` allocates a hash set and an output
  * array per row — fine for occasional use, dominant in a pairwise
  * dedup-verify loop that evaluates millions of candidate pairs
  * (set-similarity joins do exactly this). For pre-sorted inputs the
  * intersection SIZE needs two pointers, zero allocation, and no output
  * array, and `doGenCode` keeps it inside whole-stage codegen.
  *
  * Inputs MUST be sorted ascending (e.g. `array_sort` applied once per
  * document, upstream of the pairwise stage) — elements are consumed in
  * merge order. Duplicate elements are counted like sorted-multiset
  * intersection; callers pass distinct sets.
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u < v) i += 1
      else if (u > v) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      s"""
         |int $i = 0, $j = 0, $n = $a.numElements(), $m = $b.numElements();
         |${ev.value} = 0;
         |while ($i < $n && $j < $m) {
         |  long $u = $a.getLong($i);
         |  long $v = $b.getLong($j);
         |  if ($u < $v) { $i++; }
         |  else if ($u > $v) { $j++; }
         |  else { ${ev.value}++; $i++; $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectSize {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(SortedLongIntersectSize(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
