package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** `Σ w_a[i] over A ∩ B` — the weighted sibling of
  * [[SortedLongIntersectSize]]: a native codegen'd merge scan over a
  * SORTED `array<bigint>` of keys with an ALIGNED `array<bigint>` of
  * weights on the left, intersected against a SORTED `array<bigint>`
  * of keys on the right, summing the left weight at every match.
  *
  * Built for neighborhood link scores whose per-common-neighbor weight
  * depends on the NEIGHBOR (Resource Allocation Σ 1/deg(w), Adamic–
  * Adar Σ 1/ln deg(w)): the weight rides the adjacency list once per
  * node, and the per-edge evaluation stays a zero-allocation
  * two-pointer loop inside whole-stage codegen — never a wedge join.
  * Weights are BIGINTs (callers pass exact integer micro-units, e.g.
  * `1e6 div deg`) so the sum is exact and order-independent.
  *
  * Inputs MUST be key-sorted ascending with `weights` aligned to
  * `left` positions (build both from one `sort_array(collect_list(
  * struct(key, w)))` — struct order is key order because keys are
  * unique per adjacency). Duplicate keys behave as sorted-multiset
  * intersection; callers pass distinct neighbor sets.
  */
case class SortedIntersectWeightSum(first: Expression, second: Expression,
                                    third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, w: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val ws = w.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var s = 0L
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u < v) i += 1
      else if (u > v) j += 1
      else { s += ws.getLong(i); i += 1; j += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, w, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      s"""
         |int $i = 0, $j = 0, $n = $a.numElements(), $m = $b.numElements();
         |${ev.value} = 0L;
         |while ($i < $n && $j < $m) {
         |  long $u = $a.getLong($i);
         |  long $v = $b.getLong($j);
         |  if ($u < $v) { $i++; }
         |  else if ($u > $v) { $j++; }
         |  else { ${ev.value} += $w.getLong($i); $i++; $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SortedIntersectWeightSum =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedIntersectWeightSum {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(keys: Column, weights: Column, other: Column): Column =
    ColumnBridge.toColumn(SortedIntersectWeightSum(
      ColumnBridge.toExpression(keys), ColumnBridge.toExpression(weights),
      ColumnBridge.toExpression(other)))
}
