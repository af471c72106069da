package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sign-random-projection LSH band buckets of an `array<double>` vector
  * in ONE codegen'd pass: project the vector onto `bands * bits`
  * pseudo-random ±1 hyperplanes and pack each band's `bits` projection
  * signs into a bucket id — `bucket[b] = sum_j (proj[b*bits+j] >= 0 ?
  * 1<<j : 0)`.
  *
  * The hyperplane component for (plane p, dim k) is
  * `xxhash64(p, k) % 2 == 0 ? +1 : -1`, reproducing the built-in
  * spelling `pmod(xxhash64(lit(p), k), 2)` bit-for-bit (xxhash64 chains
  * seed 42 through its int arguments, replicated via
  * [[XXH64.hashInt]]), so buckets equal the former
  * posexplode + 32-aggregate-groupBy formulation exactly — but as a
  * shuffle-free narrow map instead of exploding vectors to
  * (vec, dim, x) rows and hash-aggregating them back together (that
  * wide-agg shape is also what falls out of whole-stage codegen and
  * degrades interpreted in a long-lived JVM; see BENCHNOTES.md).
  */
case class SignBandBuckets(child: Expression, bands: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    new GenericArrayData(SignBandBuckets.buckets(v, bands, bits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.SignBandBuckets.buckets($a, $bands, $bits));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBandBuckets =
    copy(child = newChild)
}

object SignBandBuckets {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** ±1 for (plane, dim): xxhash64(plane, dim) even => +1 (matches the
    * built-in `pmod(xxhash64(lit(plane), dim), 2) === 0` spelling).
    */
  private def sign(plane: Int, dim: Int): Double = {
    val h = XXH64.hashInt(dim, XXH64.hashInt(plane, 42L))
    // pmod(h, 2) == 0  <=>  h is even
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  /** memoized ±1 hyperplane matrix [plane * dims + dim] — the signs are
    * pure functions of (plane, dim), so recomputing two xxhash rounds
    * per (plane, dim) PER ROW would dominate the projection's FMA work
    * at scale; one matrix per (nPlanes, dims) shape serves every row.
    */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def signMatrix(nPlanes: Int, dims: Int): Array[Double] =
    signCache.computeIfAbsent((nPlanes, dims), { key =>
      val (np, d) = key
      val m = new Array[Double](np * d)
      var p = 0
      while (p < np) {
        var k = 0
        while (k < d) { m(p * d + k) = sign(p, k); k += 1 }
        p += 1
      }
      m
    })

  /** called from both interpreted eval and generated code. MUST NOT be
    * named `eval`: a same-name class member (the inherited
    * `Expression.eval`) suppresses the static forwarder the generated
    * Java calls, silently de-codegen-ing the plan (CodegenSpec pins this).
    */
  def buckets(v: ArrayData, bands: Int, bits: Int): Array[Long] = {
    val n = v.numElements()
    val nPlanes = bands * bits
    val signs = signMatrix(nPlanes, n)
    val projs = new Array[Double](nPlanes)
    var p = 0
    while (p < nPlanes) {
      var k = 0
      var acc = 0.0
      while (k < n) {
        acc += v.getDouble(k) * signs(p * n + k)
        k += 1
      }
      projs(p) = acc
      p += 1
    }
    val buckets = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        if (projs(b * bits + j) >= 0) bucket |= (1L << j)
        j += 1
      }
      buckets(b) = bucket
      b += 1
    }
    buckets
  }

  def apply(v: Column, bands: Int, bits: Int): Column =
    ColumnBridge.toColumn(SignBandBuckets(ColumnBridge.toExpression(v), bands, bits))
}
