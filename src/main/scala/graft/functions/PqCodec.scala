package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** PQ corpus-side encoding as ONE codegen'd expression: for each of the
  * m = dim/dSub subspaces, the argmax over kSub centroids of
  * `x_j·c − |c|²/2` (the L2 argmin in dot form). `codebook` is the flat
  * subspace-major centroid table (length m·kSub·dSub, laid out
  * [j][c][d]) and `halfNorms` the matching |c|²/2 per centroid — both
  * plan-time literals.
  *
  * Exists because the column-combinator spelling (m·kSub slice+dot
  * expressions feeding array_position(array_max)) generates past
  * janino's 64 KB method limit at m=kSub=16, and Spark's silent
  * fallback INTERPRETS the whole projection — on the corpus side, the
  * one place PQ encoding cost matters. This is three nested flat loops
  * of generated Java inside whole-stage codegen.
  *
  * Arithmetic is bit-compatible with the combinator spelling it
  * replaces: per (j, c) the dot accumulates over d ascending (the
  * [[DotProductF64]] order) and ties keep the LOWEST centroid id
  * (strict `>`), matching array_position's first-max.
  */
case class PqEncode(first: Expression, second: Expression, third: Expression,
                    kSub: Int, dSub: Int)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any, cbA: Any, hnA: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val cb = cbA.asInstanceOf[ArrayData]
    val hn = hnA.asInstanceOf[ArrayData]
    val m = x.numElements() / dSub
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestS = Double.NegativeInfinity
      var c = 0
      while (c < kSub) {
        val base = (j * kSub + c) * dSub
        var s = 0.0
        var d = 0
        while (d < dSub) { s += x.getDouble(j * dSub + d) * cb.getDouble(base + d); d += 1 }
        s -= hn.getDouble(j * kSub + c)
        if (s > bestS) { bestS = s; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, cb, hn) => {
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val m = ctx.freshName("m")
      val out = ctx.freshName("out"); val s = ctx.freshName("s")
      val best = ctx.freshName("best"); val bestS = ctx.freshName("bestS")
      val base = ctx.freshName("base")
      s"""
         |int $m = $x.numElements() / $dSub;
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0; double $bestS = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $kSub; $c++) {
         |    int $base = ($j * $kSub + $c) * $dSub;
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $dSub; $d++) {
         |      $s += $x.getDouble($j * $dSub + $d) * $cb.getDouble($base + $d);
         |    }
         |    $s -= $hn.getDouble($j * $kSub + $c);
         |    if ($s > $bestS) { $bestS = $s; $best = $c; }
         |  }
         |  $out[$j] = $best;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqEncode {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(vec: Column, codebook: Column, halfNorms: Column,
            kSub: Int, dSub: Int): Column =
    ColumnBridge.toColumn(PqEncode(
      ColumnBridge.toExpression(vec), ColumnBridge.toExpression(codebook),
      ColumnBridge.toExpression(halfNorms), kSub, dSub))
}

/** Query-side PQ ADC lookup table as one codegen'd expression:
  * `lut[j·kSub + c] = |q_j|² − 2 q_j·c + |c|²` (the per-subspace
  * squared distance to every centroid; [[PqAdcScore]] then sums m
  * lookups per candidate code). Same flat [j][c][d] codebook literal
  * as [[PqEncode]]; `norms` carries the FULL |c|² (not halved).
  * Replaces the other over-64 KB combinator projection; it only runs
  * on the query side, but the janino failure was noisy and the fused
  * loop is also what a reviewer expects the LUT build to look like.
  * Arithmetic per entry is `(qq − 2.0·qc) + cn2` with ascending-d
  * accumulation — bit-identical to the expression tree it replaces.
  */
case class PqAdcLut(first: Expression, second: Expression, third: Expression,
                    kSub: Int, dSub: Int)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any, cbA: Any, cnA: Any): Any = {
    val q = v.asInstanceOf[ArrayData]
    val cb = cbA.asInstanceOf[ArrayData]
    val cn = cnA.asInstanceOf[ArrayData]
    val m = q.numElements() / dSub
    val out = new Array[Double](m * kSub)
    var j = 0
    while (j < m) {
      var qq = 0.0
      var d = 0
      while (d < dSub) { val x = q.getDouble(j * dSub + d); qq += x * x; d += 1 }
      var c = 0
      while (c < kSub) {
        val base = (j * kSub + c) * dSub
        var qc = 0.0
        d = 0
        while (d < dSub) { qc += q.getDouble(j * dSub + d) * cb.getDouble(base + d); d += 1 }
        out(j * kSub + c) = qq - 2.0 * qc + cn.getDouble(j * kSub + c)
        c += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cb, cn) => {
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val m = ctx.freshName("m")
      val out = ctx.freshName("out"); val qq = ctx.freshName("qq")
      val qc = ctx.freshName("qc"); val base = ctx.freshName("base")
      val xv = ctx.freshName("xv")
      s"""
         |int $m = $q.numElements() / $dSub;
         |double[] $out = new double[$m * $kSub];
         |for (int $j = 0; $j < $m; $j++) {
         |  double $qq = 0.0;
         |  for (int $d = 0; $d < $dSub; $d++) {
         |    double $xv = $q.getDouble($j * $dSub + $d);
         |    $qq += $xv * $xv;
         |  }
         |  for (int $c = 0; $c < $kSub; $c++) {
         |    int $base = ($j * $kSub + $c) * $dSub;
         |    double $qc = 0.0;
         |    for (int $d = 0; $d < $dSub; $d++) {
         |      $qc += $q.getDouble($j * $dSub + $d) * $cb.getDouble($base + $d);
         |    }
         |    $out[$j * $kSub + $c] = $qq - 2.0 * $qc + $cn.getDouble($j * $kSub + $c);
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqAdcLut =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqAdcLut {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(vec: Column, codebook: Column, norms: Column,
            kSub: Int, dSub: Int): Column =
    ColumnBridge.toColumn(PqAdcLut(
      ColumnBridge.toExpression(vec), ColumnBridge.toExpression(codebook),
      ColumnBridge.toExpression(norms), kSub, dSub))
}
