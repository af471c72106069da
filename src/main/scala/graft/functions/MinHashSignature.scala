package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The full P-permutation MinHash signature of a hashed shingle set
  * (`array<bigint>`) in ONE narrow, codegen'd pass — `sig[p] =
  * min over s of mix64(s ^ seed_p)`.
  *
  * Why an expression and not `explode + groupBy(doc).agg(64 x min(...))`:
  * the 64-aggregate HashAggregate generates an update method past the
  * JIT/codegen method limits, so the stage degrades to interpreted
  * per-row eval (observed 100x: 6 s -> 650 s inside the full-suite
  * bench JVM), and it forces a shuffle of exploded shingle rows. This
  * expression keeps the whole signature inside whole-stage codegen,
  * touches each shingle once, and needs NO shuffle at all — the 100 TB
  * plan is a pure map over documents.
  *
  * The permutation family is `mix64(s ^ seed_p)` where `mix64` is the
  * MurmurHash3 finalizer (a bijection on 64-bit ints) and the seeds are
  * a fixed SplitMix64 stream — deterministic across runs, partitions,
  * and cluster sizes, and pairwise-independent enough for MinHash (the
  * standard "one strong hash, P cheap reseedings" construction).
  */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val seedArr: Array[Long] =
    MinHashSignature.seeds(numPerms)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val seeds = seedArr
    var i = 0
    while (i < n) {
      val s = arr.getLong(i)
      var p = 0
      while (p < numPerms) {
        val h = MinHashSignature.mix64(s ^ seeds(p))
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds",
      MinHashSignature.seeds(numPerms), "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val p = ctx.freshName("p"); val s = ctx.freshName("s")
      val h = ctx.freshName("h"); val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$numPerms];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $s = $a.getLong($i);
         |  for (int $p = 0; $p < $numPerms; $p++) {
         |    long $h = $s ^ $seedsRef[$p];
         |    $h = ($h ^ ($h >>> 33)) * 0xff51afd7ed558ccdL;
         |    $h = ($h ^ ($h >>> 33)) * 0xc4ceb9fe1a85ec53L;
         |    $h = $h ^ ($h >>> 33);
         |    if ($h < $mins[$p]) $mins[$p] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** MurmurHash3 64-bit finalizer — a bijective mixer. */
  def mix64(z0: Long): Long = {
    var z = (z0 ^ (z0 >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  /** Fixed SplitMix64 seed stream — one seed per permutation. */
  def seeds(n: Int): Array[Long] = {
    var x = 0x9e3779b97f4a7c15L
    Array.fill(n) { x += 0x9e3779b97f4a7c15L; mix64(x) }
  }

  def apply(a: Column, numPerms: Int): Column =
    ColumnBridge.toColumn(MinHashSignature(ColumnBridge.toExpression(a), numPerms))
}
