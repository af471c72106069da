package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** 1-based position of the max-cosine centroid for a vector: over a
  * flat row-major centroid table `cents` (k × dim doubles) with the
  * matching per-centroid norms, returns argmax_i of
  * `dot(v, c_i) / (|v| · norms[i])`, first maximum winning on ties —
  * the [[graft.queries.EmbeddingQueries]] coarse-assignment argmax as
  * ONE codegen'd loop.
  *
  * Exists because the column-combinator spelling (k dot expressions +
  * `array_position(array_max(...))`) interpolated each centroid's
  * SCALAR norm into the generated Java source (`Literal(double)`
  * inlines its value; the array literals ride the references table) —
  * so every trained codebook, including EVERY Lloyd iteration inside
  * `trainCodebook`, produced a brand-new codegen class: janino compile
  * + fresh JIT per iteration per query, and the bench's sf0.001 warmup
  * could never pre-compile the sf0.1 classes (measured r17: 6–8 s of
  * in-window JIT on `ann_ivf_topk` / `ann_ivfpq_topk` / the semdedup
  * legs). Here k and dim are read from the array lengths at runtime, so
  * ONE generated class serves every codebook, every iteration, every
  * scale factor.
  *
  * Arithmetic is bit-identical to the combinator chain it replaces:
  * |v| = sqrt of the ascending-order self-dot (the [[DotProductF64]]
  * order), each cosine is `dot/(nrm·cn)` with the same association, and
  * the argmax compares via `Double.compare` — exactly `array_max`'s
  * ordering plus `array_position`'s first-match rule (no NaNs reach it:
  * every caller filters zero-norm vectors, and centroid norms are
  * positive).
  */
case class NearestCentroidPos(first: Expression, second: Expression,
                              third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any, cA: Any, nA: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val cents = cA.asInstanceOf[ArrayData]
    val norms = nA.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val k = norms.numElements()
    var vv = 0.0
    var d = 0
    while (d < dim) { val e = x.getDouble(d); vv += e * e; d += 1 }
    val nrm = math.sqrt(vv)
    var best = Double.NegativeInfinity
    var pos = 0
    var i = 0
    while (i < k) {
      var s = 0.0
      d = 0
      while (d < dim) { s += x.getDouble(d) * cents.getDouble(i * dim + d); d += 1 }
      val c = s / (nrm * norms.getDouble(i))
      if (java.lang.Double.compare(c, best) > 0) { best = c; pos = i + 1 }
      i += 1
    }
    pos
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, cents, norms) => {
      val dim = ctx.freshName("dim"); val k = ctx.freshName("k")
      val vv = ctx.freshName("vv"); val nrm = ctx.freshName("nrm")
      val best = ctx.freshName("best"); val s = ctx.freshName("s")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val e = ctx.freshName("e")
      s"""
         |int $dim = $x.numElements();
         |int $k = $norms.numElements();
         |double $vv = 0.0;
         |for (int $d = 0; $d < $dim; $d++) {
         |  double $e = $x.getDouble($d);
         |  $vv += $e * $e;
         |}
         |double $nrm = java.lang.Math.sqrt($vv);
         |double $best = Double.NEGATIVE_INFINITY;
         |${ev.value} = 0;
         |for (int $i = 0; $i < $k; $i++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    $s += $x.getDouble($d) * $cents.getDouble($i * $dim + $d);
         |  }
         |  double $c = $s / ($nrm * $norms.getDouble($i));
         |  if (java.lang.Double.compare($c, $best) > 0) { $best = $c; ${ev.value} = $i + 1; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): NearestCentroidPos =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NearestCentroidPos {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(vec: Column, cents: Column, norms: Column): Column =
    ColumnBridge.toColumn(NearestCentroidPos(
      ColumnBridge.toExpression(vec), ColumnBridge.toExpression(cents),
      ColumnBridge.toExpression(norms)))
}
