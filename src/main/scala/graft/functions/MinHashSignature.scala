package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
  * An EMPTY shingle set has no signature: the result is NULL (mirroring
  * the explode+groupBy formulation, where empty sets produce no row).
  * Returning a constant sentinel signature instead would band-collide
  * every shingle-less document with every other — the unbounded-bucket
  * pathology LSH exists to avoid — so callers must drop null signatures
  * before banding (the MinHashDedup pipeline filters short docs before
  * hashing).
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
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == 0) null
      else new GenericArrayData(MinHashSignature.signature(arr, numPerms))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val tp = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
         |${c.code}
         |boolean ${ev.isNull} = true;
         |$tp ${ev.value} = null;
         |if (!${c.isNull} && ${c.value}.numElements() > 0) {
         |  ${ev.isNull} = false;
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.functions.MinHashSignature.signature(${c.value}, $numPerms));
         |}
       """.stripMargin)
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

  /** Fixed SplitMix64 seed stream — one seed per permutation (memoized
    * per permutation count; shared by every row and both eval paths).
    */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  def seeds(n: Int): Array[Long] =
    seedCache.computeIfAbsent(n, { k =>
      var x = 0x9e3779b97f4a7c15L
      Array.fill(k) { x += 0x9e3779b97f4a7c15L; mix64(x) }
    })

  /** shared by interpreted eval and generated code; requires a NON-EMPTY
    * input array (empty sets have a NULL signature, enforced by the
    * expression).
    *
    * MUST NOT be named `eval`: a same-name class member (the overridden
    * `Expression.eval`) suppresses the static forwarder the generated
    * Java calls, silently de-codegen-ing the plan (CodegenSpec pins this).
    */
  def signature(arr: ArrayData, numPerms: Int): Array[Long] = {
    val n = arr.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val seedArr = seeds(numPerms)
    var i = 0
    while (i < n) {
      val s = arr.getLong(i)
      var p = 0
      while (p < numPerms) {
        val h = mix64(s ^ seedArr(p))
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    mins
  }

  def apply(a: Column, numPerms: Int): Column =
    ColumnBridge.toColumn(MinHashSignature(ColumnBridge.toExpression(a), numPerms))
}
